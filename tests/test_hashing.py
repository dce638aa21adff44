"""Numpy hashing engine vs the independent pure-Python oracle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_gpu_stream_parallelism_spark.config import BASE2, MERSENNE, DedupConfig
from dedup_gpu_stream_parallelism_spark.functions import hashing
from dedup_gpu_stream_parallelism_spark.plans import oracle

CFG = DedupConfig()
ascii_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200)


@given(ascii_text)
@settings(max_examples=50, deadline=None)
def test_shingle_hash_matches_oracle(text):
    got = hashing.shingle_hashes(text, CFG.shingle_k).tolist()
    want = oracle.shingle_hashes(text, CFG.shingle_k)
    assert got == want
    assert all(0 <= h < MERSENNE for h in got)


@given(st.lists(ascii_text, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_minhash_matches_oracle(texts):
    flat, starts = hashing.batch_shingle_hashes(texts, CFG.shingle_k)
    sig = hashing.minhash_signatures(flat, starts, CFG)
    assert sig.shape == (len(texts), CFG.num_perm)
    for i, t in enumerate(texts):
        assert sig[i].tolist() == oracle.minhash(t, CFG)


@given(st.lists(ascii_text, min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_simhash_matches_oracle(texts):
    got = hashing.simhash_values(texts, CFG)
    for i, t in enumerate(texts):
        assert int(got[i]) == oracle.simhash(t, CFG)


def test_short_texts_empty_signature():
    for t in ["", "x", "12345678"]:  # all shorter than k=9
        assert hashing.shingle_hashes(t, CFG.shingle_k).shape[0] == 0
        assert oracle.minhash(t, CFG) == [CFG.empty_min] * CFG.num_perm
        assert oracle.simhash(t, CFG) == 0


def test_identical_texts_identical_signatures():
    t = "def foo(): return buffer + chunk\n" * 5
    flat, starts = hashing.batch_shingle_hashes([t, t], CFG.shingle_k)
    sig = hashing.minhash_signatures(flat, starts, CFG)
    assert sig[0].tolist() == sig[1].tolist()


def test_minhash_estimates_jaccard():
    """MinHash agreement rate must approximate true shingle Jaccard."""
    a = "the quick brown fox jumps over the lazy dog " * 20
    b = a.replace("fox", "cat").replace("lazy", "busy")
    flat, starts = hashing.batch_shingle_hashes([a, b], CFG.shingle_k)
    sig = hashing.minhash_signatures(flat, starts, CFG)
    est = float((sig[0] == sig[1]).mean())
    true_j = oracle.jaccard(a, b, CFG)
    assert abs(est - true_j) < 0.15


def test_simhash_hamming_tracks_similarity():
    a = "int main() { return hash(buffer, chunk, table); }\n" * 10
    b = a.replace("table", "index")
    c = "completely different content about streams and queues windows\n" * 10
    ha, hb, hc = (int(v) for v in hashing.simhash_values([a, b, c], CFG))
    d_ab = int(hashing.hamming62(np.array([ha]), np.array([hb]))[0])
    d_ac = int(hashing.hamming62(np.array([ha]), np.array([hc]))[0])
    assert d_ab < d_ac


def test_second_base_stream_differs():
    t = "some content string long enough for shingles"
    h1 = hashing.shingle_hashes(t, CFG.shingle_k)
    h2 = hashing.shingle_hashes(t, CFG.shingle_k, BASE2)
    assert h1.shape == h2.shape and (h1 != h2).any()
