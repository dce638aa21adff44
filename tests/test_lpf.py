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


def brute_windowed(text: str, window: int, max_len: int) -> list[int]:
    """O(n·window) reference for the exact windowed matcher: the longest
    l in [3, max_len] with text[i:i+l] occurring at j in [i-window, i)."""
    n = len(text)
    out = [0] * n
    for i in range(n):
        best = 0
        for j in range(max(0, i - window), i):
            k = 0
            while k < max_len and i + k < n and text[j + k] == text[i + k]:
                k += 1
            best = max(best, k)
        out[i] = best if best >= 3 else 0
    return out


@pytest.mark.parametrize("text", CASES)
def test_windowed_matches_brute_small(text):
    got = L.windowed_match_lengths(text, window=4, max_len=L.MAX_CODED)
    assert got.tolist() == brute_windowed(text, 4, L.MAX_CODED)


def test_windowed_random_small_windows():
    rng = random.Random(7)
    for _ in range(20):
        n = rng.randint(4, 200)
        w = rng.choice([3, 8, 17, 64])
        text = "".join(rng.choice("ab") for _ in range(n))
        got = L.windowed_match_lengths(text, window=w).tolist()
        assert got == brute_windowed(text, w, L.MAX_CODED), (text, w)


def test_windowed_respects_4096_window_on_long_docs():
    """A 64-char block at position 0 reappears at 3000 (inside the window →
    match) and again at 9000 with nothing in between (outside → no match)."""
    rng = random.Random(11)
    block = "".join(rng.choice("qrstuv") for _ in range(64))

    def noise(n, alphabet="wxyz"):
        return "".join(rng.choice(alphabet) for _ in range(n))

    doc1 = block + noise(3000 - 64) + block + noise(500)
    got1 = L.windowed_match_lengths(doc1)
    assert got1[3000] == L.MAX_CODED  # second copy starts at 64+(3000-64)=3000

    doc2 = block + noise(9000 - 64) + block + noise(500)
    got2 = L.windowed_match_lengths(doc2)
    assert got2[9000] == 0  # 9000-char offset > 4096: must NOT match

    est = L.lzss_estimate(doc2)
    assert est["window_exact"] == 1
    assert est["n_chars"] == len(doc2)


def test_windowed_equals_unbounded_for_short_docs():
    """For docs <= window, windowed == clamped unbounded LPF."""
    rng = random.Random(13)
    for _ in range(10):
        n = rng.randint(10, 300)
        text = "".join(rng.choice("abcd") for _ in range(n))
        unb = [
            v if min(v, L.MAX_CODED) >= 3 else 0
            for v in np.minimum(L.lpf_lengths(text), L.MAX_CODED).tolist()
        ]
        got = L.windowed_match_lengths(text, window=4096).tolist()
        assert got == unb
