"""Property-based tests (hypothesis): pure-function kernels vs independent
implementations, over arbitrary unicode — incl. the non-ASCII code path the
synthetic corpus never hits."""

from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_gpu_stream_parallelism_spark.config import BASE1, MERSENNE, DedupConfig
from dedup_gpu_stream_parallelism_spark.functions import hashing, lpf
from dedup_gpu_stream_parallelism_spark.operators import chunk, verify
from dedup_gpu_stream_parallelism_spark.plans import oracle

CFG = DedupConfig()

# valid unicode (no surrogates), bounded length; separate tiny-alphabet
# strategy to force repetition-heavy inputs
unicode_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)
abc_text = st.text(alphabet="abé", max_size=120)


@settings(max_examples=60, deadline=None)
@given(unicode_text)
def test_shingle_hashes_numpy_equals_python(text):
    got = hashing.shingle_hashes(text, CFG.shingle_k).tolist()
    want = oracle.shingle_hashes(text, CFG.shingle_k)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(abc_text)
def test_minhash_numpy_equals_python(text):
    flat, starts = hashing.batch_shingle_hashes([text], CFG.shingle_k, BASE1)
    got = hashing.minhash_signatures(flat, starts, CFG)[0].tolist()
    assert got == oracle.minhash(text, CFG)


@settings(max_examples=40, deadline=None)
@given(abc_text)
def test_simhash_numpy_equals_python(text):
    got = int(hashing.simhash_values([text], CFG)[0])
    assert got == oracle.simhash(text, CFG)


@settings(max_examples=60, deadline=None)
@given(unicode_text)
def test_cdc_chunks_reassemble_exactly(text):
    spans = chunk.chunk_spans(text)
    assert "".join(text[s:e] for s, e in spans) == text
    assert all(e > s for s, e in spans)
    # spans tile the text with no gaps
    pos = 0
    for s, e in spans:
        assert s == pos
        pos = e
    assert pos == len(text)


@settings(max_examples=40, deadline=None)
@given(abc_text, abc_text)
def test_lcs_suffix_array_equals_hashset_oracle(a, b):
    assert verify.longest_common_substring(a, b) == oracle.longest_common_substring(
        a, b
    )


@settings(max_examples=40, deadline=None)
@given(abc_text)
def test_lpf_vs_bruteforce_property(text):
    n = len(text)
    got = lpf.lpf_lengths(text).tolist()
    want = []
    for i in range(n):
        best = 0
        for j in range(i):
            k = 0
            while i + k < n and text[j + k] == text[i + k]:
                k += 1
            best = max(best, k)
        want.append(best)
    assert got == want


@settings(max_examples=40, deadline=None)
@given(abc_text, abc_text)
def test_jaccard_counts_match_python_sets(a, b):
    inter, union = verify.jaccard_of(a, b, CFG)
    sa = set(oracle.shingle_hashes(a, CFG.shingle_k))
    sb = set(oracle.shingle_hashes(b, CFG.shingle_k))
    assert inter == len(sa & sb)
    assert union == len(sa | sb)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=50))
def test_hamming62_matches_bitcount(vals):
    import numpy as np

    if not vals:
        return
    a = np.array(vals, dtype=np.int64)
    b = np.roll(a, 1)
    got = hashing.hamming62(a.copy(), b.copy()).tolist()
    want = [bin(x ^ y).count("1") for x, y in zip(vals, np.roll(vals, 1).tolist())]
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="ab", max_size=150), st.integers(min_value=3, max_value=40))
def test_windowed_match_lengths_property(text, window):
    got = lpf.windowed_match_lengths(text, window=window).tolist()
    n = len(text)
    want = []
    for i in range(n):
        best = 0
        for j in range(max(0, i - window), i):
            k = 0
            while k < lpf.MAX_CODED and i + k < n and text[j + k] == text[i + k]:
                k += 1
            best = max(best, k)
        want.append(best if best >= 3 else 0)
    assert got == want


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=300))
def test_bytes_and_ascii_codes_coincide(data):
    """For bytes, codes are raw byte values; for the ASCII subset this must
    equal the str codepoint path (the binary-ingestion invariant)."""
    got = hashing.text_codes(data).tolist()
    assert got == list(data)
    ascii_part = bytes(b for b in data if b < 128)
    assert (
        hashing.text_codes(ascii_part).tolist()
        == hashing.text_codes(ascii_part.decode("ascii")).tolist()
    )


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=400))
def test_cdc_chunks_reassemble_bytes(data):
    spans = chunk.chunk_spans(data)
    assert b"".join(data[s:e] for s, e in spans) == data
