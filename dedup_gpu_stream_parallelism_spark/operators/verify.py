"""Candidate-pair verification: shingle Jaccard + suffix-array substring confirm.

This stage plays the role of LZSS longest-match search in the reference: for
every position, find the longest earlier occurrence within a bounded window
(MatcherSequential::FindMatchBatch,
/root/reference/libs/lzsslib/src/matchers/matcher_sequential.cpp:10-79; CUDA
twin matcher_cuda.cu:32-100).  The GPU kernel proves per-position
independence — one thread per position — which is exactly why the pass
parallelizes here as an Arrow-batched ``mapInPandas``: each candidate pair is
verified independently inside a partition, and matches never cross pair
boundaries just as the reference's batch kernels clamp matches at chunk
boundaries via ``breakPositions[]`` (matcher_cuda.cu:319-385).

The suffix array (prefix doubling, numpy) + Kasai LCP replaces the greedy
window scan: the longest common substring of (a, b) is the max LCP between
adjacent suffixes of the concatenation that originate from different docs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.config import BASE1, DedupConfig
from dedup_gpu_stream_parallelism_spark.functions import hashing

SEPARATOR = 0x110000  # > any unicode codepoint; keeps suffixes of a/b apart


def suffix_array(
    codes: np.ndarray, return_ranks: bool = False
) -> np.ndarray | tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array via prefix doubling — O(n log^2 n), fully vectorized.

    With ``return_ranks``, also returns the per-level rank tables
    ``[(length, rank_length), ...]`` for lengths 1, 2, 4, ... — rank
    equality at a level ⟺ the two length-``length`` prefixes are equal —
    which ``lcp_from_ranks`` consumes to compute every adjacent-pair LCP
    without a per-character pass."""
    n = codes.shape[0]
    if n == 0:
        sa = np.empty(0, dtype=np.int64)
        return (sa, []) if return_ranks else sa
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    ranks = [(1, rank)]
    k = 1
    while rank.max() != n - 1:
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(np.int64)
        new_rank_sorted = np.cumsum(changed)
        rank = np.empty(n, dtype=np.int64)
        rank[order] = new_rank_sorted
        ranks.append((2 * k, rank))
        k *= 2
    sa = np.empty(n, dtype=np.int64)
    sa[rank] = np.arange(n)
    return (sa, ranks) if return_ranks else sa


def lcp_from_ranks(
    sa: np.ndarray, ranks: list[tuple[int, np.ndarray]]
) -> np.ndarray:
    """lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0] = 0 — computed
    for ALL adjacent pairs at once by binary decomposition over the
    doubling rank tables (highest level first: if the length-p prefixes
    agree, add p and advance both suffixes by p).  The levels 1..P sum to
    2P-1, and the doubling loop only stops once no two suffixes share a
    length-P prefix, so every LCP is representable.  Replaces the Kasai
    walk — same output, no per-character Python loop."""
    n = sa.shape[0]
    lcp = np.zeros(n, dtype=np.int64)
    if n < 2:
        return lcp
    ii = sa[:-1].copy()
    jj = sa[1:].copy()
    acc = np.zeros(n - 1, dtype=np.int64)
    for length, rank in reversed(ranks):
        alive = (ii < n) & (jj < n)
        if not alive.any():
            break
        eq = alive.copy()
        eq[alive] = rank[ii[alive]] == rank[jj[alive]]
        acc[eq] += length
        ii[eq] += length
        jj[eq] += length
    lcp[1:] = acc
    return lcp


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai: lcp[i] = LCP(suffix sa[i], suffix sa[i-1]); lcp[0] = 0.

    Reference implementation (per-character h-carry) kept as the
    independent cross-check for ``lcp_from_ranks`` — the hot paths use
    the vectorized variant."""
    n = sa.shape[0]
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(n, dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            m = n - max(i, j)
            while h < m and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: str, b: str) -> int:
    """Length of the longest exact common substring of a and b."""
    if not a or not b:
        return 0
    ca = hashing.text_codes(a)
    cb = hashing.text_codes(b)
    codes = np.concatenate([ca, [SEPARATOR], cb, [SEPARATOR + 1]]).astype(np.int64)
    sa, ranks = suffix_array(codes, return_ranks=True)
    lcp = lcp_from_ranks(sa, ranks)
    from_a = sa < ca.shape[0]  # suffix starts inside a
    mixed = from_a[1:] != from_a[:-1]
    if not mixed.any():
        return 0
    return int(lcp[1:][mixed].max())


def common_gram(a: str, b: str, length: int) -> bool | None:
    """Exact shared-L-gram test (⟺ LCS >= L) via rolling hashes + a string
    verify of the first-occurrence positions.

    Returns True (verified common substring), False (no hash in common ⇒
    provably no common L-gram), or None (hashes collided but strings
    differ — caller must fall back to the suffix array).  ~15x cheaper than
    the SA on typical pairs; this is the same size-based kernel routing the
    reference applies (cheap path first, src/encoder_spar.cpp:272-280).
    """
    ca = hashing.text_codes(a)
    cb = hashing.text_codes(b)
    # 256 terms of < 2**52 each sum below 2**60 — int64-safe for L <= 1024
    ha = hashing.shingle_hashes_from_codes(ca, length, BASE1)
    hb = hashing.shingle_hashes_from_codes(cb, length, BASE1)
    ua, ia = np.unique(ha, return_index=True)
    ub, ib = np.unique(hb, return_index=True)
    common, xa, xb = np.intersect1d(ua, ub, assume_unique=True, return_indices=True)
    if common.shape[0] == 0:
        return False
    for k in range(common.shape[0]):
        pa, pb = int(ia[xa[k]]), int(ib[xb[k]])
        if np.array_equal(ca[pa : pa + length], cb[pb : pb + length]):
            return True
    return None  # pure hash collision(s): unresolved


def jaccard_of(a: str, b: str, cfg: DedupConfig) -> tuple[int, int]:
    """(intersection, union) sizes of the distinct k-shingle hash sets."""
    ha = np.unique(hashing.shingle_hashes(a or "", cfg.shingle_k, BASE1))
    hb = np.unique(hashing.shingle_hashes(b or "", cfg.shingle_k, BASE1))
    inter = np.intersect1d(ha, hb, assume_unique=True).shape[0]
    union = ha.shape[0] + hb.shape[0] - inter
    return inter, union


CONFIRM_SCHEMA = (
    "a_id bigint, b_id bigint, inter bigint, uni bigint, jaccard double, "
    "lcs_len bigint, confirmed int"
)


def confirm_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    compute_lcs: bool = True,
) -> DataFrame:
    """Verify candidate pairs: shingle Jaccard and (optionally) the
    suffix-array longest-common-substring.  A pair is confirmed when
    ``jaccard >= cfg.jaccard_threshold`` OR ``lcs_len >=
    cfg.substring_min_len`` — near-dup and shared-substring semantics.

    ``pairs``: (a_id, b_id).  ``docs``: (id_col, text_col).
    Scale notes: two hash joins attach contents (each a shuffle on the id);
    the verify itself is embarrassingly parallel per pair.  The cheap test
    (Jaccard) runs first and the expensive suffix array only when Jaccard
    alone doesn't confirm — the reference's size-threshold kernel routing
    (src/encoder_spar.cpp:272-280).
    """
    cfg = cfg or DedupConfig()
    da = docs.select(
        F.col(id_col).alias("a_id"), F.col(text_col).alias("a_text")
    )
    db = docs.select(
        F.col(id_col).alias("b_id"), F.col(text_col).alias("b_text")
    )
    joined = pairs.join(da, "a_id").join(db, "b_id").select(
        "a_id", "b_id", "a_text", "b_text"
    )
    # The joins leave the data partitioned by id — and a star-strategy hub
    # appears in O(bucket) pairs, so one partition would hold ALL of a hot
    # doc's verifies (measured: one 77 s straggler task while 7 cores
    # idled).  Verification is per-pair independent — break the key skew
    # with a round-robin repartition (the reference's round-robin queue
    # feed, src/encoder.cpp:1152-1156); 4x tasks/core smooths the
    # heavy-tail pair costs.
    spark = pairs.sparkSession
    joined = joined.repartition(4 * spark.sparkContext.defaultParallelism)

    thr = cfg.jaccard_threshold
    min_len = cfg.substring_min_len

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            inters = np.zeros(n, dtype=np.int64)
            unions = np.zeros(n, dtype=np.int64)
            jac = np.zeros(n, dtype=np.float64)
            lcs = np.zeros(n, dtype=np.int64)
            conf = np.zeros(n, dtype=np.int32)
            # per-batch memo: a star-capped hub doc appears in O(bucket)
            # pairs — hash its shingle set once per batch, not once per pair
            # (bounded by the batch's distinct docs; dropped between batches)
            memo: dict[int, np.ndarray] = {}

            def shingles_of(did: int, text: str) -> np.ndarray:
                arr = memo.get(did)
                if arr is None:
                    arr = np.unique(
                        hashing.shingle_hashes(text or "", cfg.shingle_k, BASE1)
                    )
                    memo[did] = arr
                return arr

            for i, (aid, bid, a, b) in enumerate(
                zip(pdf["a_id"], pdf["b_id"], pdf["a_text"], pdf["b_text"])
            ):
                a = a or ""
                b = b or ""
                ha = shingles_of(aid, a)
                hb = shingles_of(bid, b)
                inter = int(
                    np.intersect1d(ha, hb, assume_unique=True).shape[0]
                )
                union = int(ha.shape[0] + hb.shape[0] - inter)
                inters[i], unions[i] = inter, union
                j = inter / union if union else (1.0 if a == b else 0.0)
                jac[i] = j
                if j >= thr:
                    conf[i] = 1
                if compute_lcs:
                    # substring confirm only when Jaccard didn't already
                    # decide and the texts are long enough to qualify.
                    # Cheap exact gram test first; the O(n log^2 n) suffix
                    # array only on unresolved hash collisions.  lcs_len
                    # reports the VERIFIED bound (>= min_len) for gram-
                    # confirmed pairs; exact LCS on demand via
                    # longest_common_substring().
                    if min(len(a), len(b)) >= min_len and (j < thr):
                        hit = common_gram(a, b, min_len)
                        if hit is None:
                            lcs[i] = longest_common_substring(a, b)
                            if lcs[i] >= min_len:
                                conf[i] = 1
                        elif hit:
                            lcs[i] = min_len
                            conf[i] = 1
            yield pd.DataFrame(
                {
                    "a_id": pdf["a_id"].to_numpy(),
                    "b_id": pdf["b_id"].to_numpy(),
                    "inter": inters,
                    "uni": unions,
                    "jaccard": np.round(jac, 6),
                    "lcs_len": lcs,
                    "confirmed": conf,
                }
            )

    return joined.mapInPandas(gen, schema=CONFIRM_SCHEMA)
