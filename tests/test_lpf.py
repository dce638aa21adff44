"""LPF / greedy LZSS-estimate vs an independent brute-force matcher
(the role of libs/lzsslib/src/brute.cpp in the reference)."""

import random

import numpy as np
import pytest

from dedup_gpu_stream_parallelism_spark.functions import lpf as L


def brute_lpf(text: str) -> list[int]:
    """O(n^2) reference: longest prefix of text[i:] starting at any j<i."""
    n = len(text)
    out = [0] * n
    for i in range(n):
        best = 0
        for j in range(i):
            k = 0
            while i + k < n and text[j + k] == text[i + k]:
                k += 1
            best = max(best, k)
        out[i] = best
    return out


CASES = [
    "",
    "a",
    "aaaa",
    "abcabcabc",
    "abcdefgh",
    "aabaabaabaab",
    "banana",
    "mississippi",
]


@pytest.mark.parametrize("text", CASES)
def test_lpf_matches_bruteforce(text):
    assert L.lpf_lengths(text).tolist() == brute_lpf(text)


def test_lpf_random_strings():
    rng = random.Random(42)
    for _ in range(25):
        n = rng.randint(2, 120)
        text = "".join(rng.choice("abc") for _ in range(n))
        assert L.lpf_lengths(text).tolist() == brute_lpf(text), text


def test_greedy_emit_skips_matches():
    # 'abcabcabc': positions 3..8 match earlier text with length 6 at pos 3
    lpf = L.lpf_lengths("abcabcabc")
    n_coded, n_uncoded = L.greedy_emit(lpf)
    assert n_uncoded == 3  # a, b, c literals
    assert n_coded == 1    # one long overlapping match covers the rest


def test_estimate_compresses_repetitive_text():
    rep = L.lzss_estimate("abcdefgh" * 50)
    rnd = L.lzss_estimate("the quick brown fox jumps over the lazy dog")
    assert rep["est_ratio"] < 0.3
    assert rep["est_bytes"] < rnd["est_bytes"] * 10
    assert rep["window_exact"] == 1


def test_estimate_token_accounting():
    text = "xyzxyzxyz"
    est = L.lzss_estimate(text)
    bits = est["n_coded"] * L.CODED_BITS + est["n_uncoded"] * L.UNCODED_BITS
    assert est["est_bytes"] == (bits + 7) // 8
    # coverage: coded tokens cover <=MAX_CODED chars each, uncoded 1 each
    assert est["n_coded"] * L.MAX_CODED + est["n_uncoded"] >= len(text)
