"""Suffix-array verify stage: LCS correctness + pair confirmation semantics."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_gpu_stream_parallelism_spark.operators import verify
from dedup_gpu_stream_parallelism_spark.plans import oracle

small = st.text(alphabet="abc ", max_size=80)


@given(small, small)
@settings(max_examples=60, deadline=None)
def test_lcs_matches_oracle(a, b):
    assert verify.longest_common_substring(a, b) == oracle.longest_common_substring(a, b)


def test_lcs_known_cases():
    assert verify.longest_common_substring("", "") == 0
    assert verify.longest_common_substring("abc", "") == 0
    assert verify.longest_common_substring("abcdef", "zabcq") == 3
    assert verify.longest_common_substring("xyz", "xyz") == 3
    block = "SHARED-BLOCK-" * 30
    a = "aaa" + block + "bbb"
    b = "cc" + block + "dd"
    assert verify.longest_common_substring(a, b) == len(block)


def test_suffix_array_sorted():
    import numpy as np

    rng = random.Random(3)
    for _ in range(10):
        s = "".join(rng.choice("abcd") for _ in range(rng.randint(1, 200)))
        codes = np.frombuffer(s.encode(), dtype=np.uint8).astype(np.int64)
        sa = verify.suffix_array(codes)
        suffixes = [s[i:] for i in sa]
        assert suffixes == sorted(s[i:] for i in range(len(s)))


@given(st.text(alphabet="abcz ", max_size=300))
@settings(max_examples=60, deadline=None)
def test_vectorized_lcp_equals_kasai(s):
    """lcp_from_ranks (binary decomposition over doubling rank tables, no
    per-character loop) must equal the Kasai reference on any input."""
    import numpy as np

    codes = np.array([ord(c) for c in s], dtype=np.int64)
    sa, ranks = verify.suffix_array(codes, return_ranks=True)
    assert np.array_equal(
        verify.lcp_from_ranks(sa, ranks), verify.lcp_array(codes, sa)
    )


def test_confirm_pairs_semantics(spark, cfg):
    base = "def compute(buffer, chunk): return hash(buffer) + len(chunk)\n" * 12
    near = base.replace("hash", "hsh2", 2)
    block = "L" + "icense text block " * 20  # >256 chars
    sub_a = "unrelated alpha " * 40 + block
    sub_b = block + " unrelated beta " * 40
    far = "totally different content about queues and windows " * 10
    docs = spark.createDataFrame(
        [(0, base), (1, near), (2, sub_a), (3, sub_b), (4, far)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (0, 4)], ["a_id", "b_id"]
    )
    out = {(r.a_id, r.b_id): r for r in verify.confirm_pairs(pairs, docs, cfg).collect()}
    assert out[(0, 1)].confirmed == 1 and out[(0, 1)].jaccard >= cfg.jaccard_threshold
    assert out[(2, 3)].confirmed == 1 and out[(2, 3)].lcs_len >= cfg.substring_min_len
    assert out[(0, 4)].confirmed == 0


def test_confirmed_match_oracle(spark, corpus_df, cfg, oracle_results):
    texts = oracle_results["texts"]
    cand = oracle_results["candidates"]
    pairs = spark.createDataFrame(sorted(cand), ["a_id", "b_id"])
    docs = corpus_df.selectExpr("cast(file_id as bigint) doc_id", "content as text")
    got = {
        (r.a_id, r.b_id)
        for r in verify.confirm_pairs(pairs, docs, cfg).collect()
        if r.confirmed == 1
    }
    assert got == oracle_results["confirmed"]
