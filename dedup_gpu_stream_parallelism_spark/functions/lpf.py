"""Longest-previous-factor + greedy LZSS token emission — the reference's
batch matcher contract, re-expressed.

The CUDA/sequential matchers compute, for EVERY position i of a batch,
``(offset, length)`` of the longest earlier occurrence
(``FindMatchBatch``, /root/reference/libs/lzsslib/src/matchers/
matcher_sequential.cpp:10-79, CUDA twin matcher_cuda.cu:32-100), then a
sequential greedy pass emits coded/uncoded tokens skipping length-1
positions (``EncodeLZSSGpu``, libs/lzsslib/src/lzss_gpu.cpp:138-172).

Here the per-position scan is a suffix-array LPF computation (SA + rank-
neighbor sweep, O(n log n) for the prefix-doubling SA): LPF[i] = longest
common prefix of suffix i with any EARLIER suffix — exactly the matcher's
answer when the window covers the whole prefix.  The reference clamps
matches to a 4096-byte window and 18-byte max length
(libs/lzsslib/src/lzlocal.h:47-59: OFFSET_BITS=12, LENGTH_BITS=4,
WINDOW_SIZE=4096, MAX_UNCODED=2, MAX_CODED=18); lengths are clamped here
too, and for docs <= 4096 chars the unbounded LPF equals the windowed one
(offsets always fit) — larger docs get an upper-bound estimate, flagged by
``window_exact``.

Output contract matches the batch kernels: per-position ``lengths[]``
array + token counts + encoded-size estimate at 17 bits/coded and 9
bits/uncoded token (1 flag + 12 offset + 4 length / 1 flag + 8 literal).
"""

from __future__ import annotations

import numpy as np

from dedup_gpu_stream_parallelism_spark.functions.hashing import text_codes
from dedup_gpu_stream_parallelism_spark.operators.verify import (
    lcp_from_ranks,
    suffix_array,
)

WINDOW_SIZE = 4096  # lzlocal.h:52
MAX_UNCODED = 2     # lzlocal.h:55 — matches must beat this to be coded
MAX_CODED = 18      # lzlocal.h:57
CODED_BITS = 1 + 12 + 4   # flag + OFFSET_BITS + LENGTH_BITS
UNCODED_BITS = 1 + 8      # flag + literal byte


def lpf_lengths(text: str) -> np.ndarray:
    """LPF[i] = length of the longest prefix of text[i:] occurring at some
    j < i.  Rank-neighbor sweep over the suffix array: positions processed
    in decreasing order; each position's candidates are its nearest
    still-present rank neighbors (all of which are smaller positions)."""
    n = len(text)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    codes = text_codes(text)
    sa, ranks = suffix_array(codes, return_ranks=True)
    lcp = lcp_from_ranks(sa, ranks)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    prev_r = np.arange(-1, n - 1)  # linked list over ranks
    next_r = np.arange(1, n + 1)
    # min-LCP to the current prev/next neighbor, maintained as we delete
    lcp_prev = lcp.copy()          # lcp_prev[r] = LCP(sa[r], current prev of r)
    lcp_next = np.empty(n, dtype=np.int64)
    lcp_next[: n - 1] = lcp[1:]
    lcp_next[n - 1] = 0
    lpf = np.zeros(n, dtype=np.int64)
    for pos in range(n - 1, -1, -1):
        r = rank[pos]
        p, nx = prev_r[r], next_r[r]
        lpf[pos] = max(
            lcp_prev[r] if p >= 0 else 0,
            lcp_next[r] if nx < n else 0,
        )
        # delete rank r from the list; merge LCP ranges
        merged = (
            min(lcp_prev[r], lcp_next[r])
            if (p >= 0 and nx < n)
            else 0
        )
        if p >= 0:
            next_r[p] = nx
            lcp_next[p] = merged
        if nx < n:
            prev_r[nx] = p
            lcp_prev[nx] = merged
    return lpf


def windowed_match_lengths(
    text: str, window: int = WINDOW_SIZE, max_len: int = MAX_CODED
) -> np.ndarray:
    """Exact windowed match length per position: out[i] = the largest
    ``l in [3, max_len]`` such that ``text[i:i+l]`` occurs at some
    ``j in [i-window, i)`` — the reference matcher's true semantics
    (offset <= WINDOW_SIZE, length <= MAX_CODED, lzlocal.h:47-59).
    Positions with no match of length >= 3 report 0 (greedy emits them
    uncoded either way, MAX_UNCODED = 2).

    Exact without hashing: prefix-doubling rank arrays give substring
    equality classes (two positions share a length-l class iff their
    length-l substrings are byte-identical); within a class, the stable
    sort order makes each position's predecessor its *nearest* earlier
    occurrence, so one vectorized distance check settles the window
    constraint.  O(n log max_len) sorts, all numpy.
    """
    return windowed_match_lengths_codes(text_codes(text), window, max_len)


def windowed_match_lengths_codes(
    codes: np.ndarray, window: int = WINDOW_SIZE, max_len: int = MAX_CODED
) -> np.ndarray:
    """``windowed_match_lengths`` over an integer code array (shared by the
    LZSS bit codec's skip filter, which runs it on raw bytes)."""
    n = len(codes)
    out = np.zeros(n, dtype=np.int64)
    if n < 4:  # a length-3 match needs at least 4 chars
        return out
    # rank_p[i] = equality class of text[i:i+p], for p = 1,2,4,8,16
    ranks: dict[int, np.ndarray] = {1: np.unique(codes, return_inverse=True)[1]}
    p = 1
    while p < max_len and 2 * p <= n:
        r = ranks[p]
        m = n - 2 * p + 1
        key = r[:m].astype(np.int64) * (n + 1) + r[p : p + m]
        ranks[2 * p] = np.unique(key, return_inverse=True)[1]
        p *= 2
    for length in range(3, min(max_len, n - 1) + 1):
        m = n - length + 1
        p = 1 << (length.bit_length() - 1)  # largest power of two <= length
        if p not in ranks:
            break
        r = ranks[p]
        if p == length:
            keys = r[:m].astype(np.int64)
        else:
            # text[i:i+length] equal iff the two overlapping length-p
            # halves (at i and i+length-p) are both equal
            keys = r[:m].astype(np.int64) * (n + 1) + r[length - p : length - p + m]
        order = np.argsort(keys, kind="stable")  # stable → pos-ascending runs
        same = keys[order[1:]] == keys[order[:-1]]
        cur = order[1:][same]
        prev = order[:-1][same]
        ok = cur - prev <= window
        out[cur[ok]] = length
    return out


def greedy_emit(lpf: np.ndarray) -> tuple[int, int]:
    """(n_coded, n_uncoded) tokens from the greedy skip pass
    (EncodeLZSSGpu, lzss_gpu.cpp:138-172): accept a match when its clamped
    length beats MAX_UNCODED, then skip length-1 positions."""
    n = lpf.shape[0]
    n_coded = n_uncoded = 0
    i = 0
    while i < n:
        length = min(int(lpf[i]), MAX_CODED, n - i)
        if length > MAX_UNCODED:
            n_coded += 1
            i += length
        else:
            n_uncoded += 1
            i += 1
    return n_coded, n_uncoded


def lzss_estimate(text: str) -> dict:
    """Per-doc self-compressibility: token counts + encoded-size estimate.

    Match lengths come from ``windowed_match_lengths`` — the exact
    WINDOW_SIZE/MAX_CODED semantics at every doc length, so
    ``window_exact`` is always 1 (kept for schema stability)."""
    lpf = windowed_match_lengths(text)
    n_coded, n_uncoded = greedy_emit(lpf)
    bits = n_coded * CODED_BITS + n_uncoded * UNCODED_BITS
    n = len(text)
    return {
        "n_chars": n,
        "n_coded": n_coded,
        "n_uncoded": n_uncoded,
        "est_bytes": (bits + 7) // 8,
        "est_ratio": round(((bits + 7) // 8) / n, 6) if n else 0.0,
        "window_exact": 1,
    }


LZSS_SCHEMA = (
    "doc_id bigint, n_chars bigint, n_coded bigint, n_uncoded bigint, "
    "est_bytes bigint, est_ratio double, window_exact int"
)


def lzss_estimate_docs(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc LZSS-size estimates as a DataFrame stage (Arrow-batched;
    the per-position arrays stay inside the partition like the reference's
    device-resident match arrays, lzss_gpu.cpp:355-712)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import functions as F

    from dedup_gpu_stream_parallelism_spark.partitioning import widen_if_narrow

    # suffix-array LPF is CPU-bound python: spread a narrow scan across the
    # cluster (one 580 KB parquet = ONE task otherwise; no-op when wide)
    src = widen_if_narrow(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                est = lzss_estimate(text or "")
                est["doc_id"] = did
                rows.append(est)
            out = pd.DataFrame(rows)
            yield out[
                ["doc_id", "n_chars", "n_coded", "n_uncoded", "est_bytes",
                 "est_ratio", "window_exact"]
            ]

    return src.mapInPandas(gen, schema=LZSS_SCHEMA)
