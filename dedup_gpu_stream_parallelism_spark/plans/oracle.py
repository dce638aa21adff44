"""Independent single-process oracle (pure Python ints, no numpy, no Spark).

Plays the role the reference's round-trip decoder plays for the encoder: an
independent implementation whose output the pipeline must reproduce
(``dedup -u`` hard-fails on any missing representative,
/root/reference/src/decoder.cpp:268-271).  Same pinned config (config.py),
deliberately different code: plain Python loops and sets.

Used by pytest for golden match/cluster fixtures (SURVEY.md §5) and recall
accounting (north rule: dup-pair recall >= 0.99).
"""

from __future__ import annotations

from dedup_gpu_stream_parallelism_spark.config import (
    BASE1,
    BASE2,
    MERSENNE,
    SIMHASH_HALF_BITS,
    DedupConfig,
)


def shingle_hashes(text: str, k: int, base: int = BASE1) -> list[int]:
    n = len(text)
    if n < k:
        return []
    weights = []
    acc = 1
    for _ in range(k):
        weights.append(acc)
        acc = (acc * base) % MERSENNE
    out = []
    for i in range(n - k + 1):
        h = 0
        for j in range(k):
            h += ord(text[i + j]) * weights[j]
        out.append(h % MERSENNE)
    return out


def minhash(text: str, cfg: DedupConfig) -> list[int]:
    hs = shingle_hashes(text, cfg.shingle_k)
    a, b = cfg.minhash_coeffs()
    if not hs:
        return [cfg.empty_min] * cfg.num_perm
    return [
        min((int(a[t]) * h + int(b[t])) % MERSENNE for h in hs)
        for t in range(cfg.num_perm)
    ]


def simhash(text: str, cfg: DedupConfig) -> int:
    def half(base: int) -> int:
        hs = shingle_hashes(text, cfg.shingle_k, base)
        if not hs:
            return 0
        packed = 0
        for bit in range(SIMHASH_HALF_BITS):
            ones = sum((h >> bit) & 1 for h in hs)
            if 2 * ones >= len(hs):  # ties vote 1
                packed |= 1 << bit
        return packed

    if len(text) < cfg.shingle_k:
        return 0
    return half(BASE2) * (1 << SIMHASH_HALF_BITS) + half(BASE1)


def band_keys(sig: list[int], cfg: DedupConfig) -> list[str]:
    return [
        f"{band}:" + ",".join(str(v) for v in sig[band * cfg.lsh_rows : (band + 1) * cfg.lsh_rows])
        for band in range(cfg.lsh_bands)
    ]


def jaccard(a: str, b: str, cfg: DedupConfig) -> float:
    sa = set(shingle_hashes(a, cfg.shingle_k))
    sb = set(shingle_hashes(b, cfg.shingle_k))
    if not sa and not sb:
        return 1.0 if a == b else 0.0
    return len(sa & sb) / len(sa | sb)


def _has_common_substring(a: str, b: str, length: int) -> bool:
    if length <= 0:
        return True
    if length > min(len(a), len(b)):
        return False
    subs = {a[i : i + length] for i in range(len(a) - length + 1)}
    return any(b[i : i + length] in subs for i in range(len(b) - length + 1))


def longest_common_substring(a: str, b: str) -> int:
    """Binary search over substring length with native-string hash sets —
    independent of the pipeline's suffix-array implementation."""
    lo, hi = 0, min(len(a), len(b))  # invariant: common substring of len lo exists
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if _has_common_substring(a, b, mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def cdc_chunks(text: str, window: int = 32, modulus: int = 256) -> list[str]:
    """Content-defined chunks (independent re-implementation of
    operators/chunk.py spec): boundary after position i when the k=window
    shingle hash ending at i is ≡ 0 mod modulus."""
    n = len(text)
    if n == 0:
        return []
    hashes = shingle_hashes(text, window)
    cuts = [
        i + window - 1
        for i, h in enumerate(hashes)
        if h % modulus == 0 and (i + window - 1) < n - 1
    ]
    starts = [0] + [p + 1 for p in cuts]
    ends = [p + 1 for p in cuts] + [n]
    return [text[s:e] for s, e in zip(starts, ends)]


def chunk_candidate_pairs(
    texts: dict[int, str],
    window: int = 32,
    modulus: int = 256,
    min_chunk_len: int = 64,
) -> set[tuple[int, int]]:
    buckets: dict[str, set[int]] = {}
    for fid, text in texts.items():
        for ch in cdc_chunks(text, window, modulus):
            if len(ch) >= min_chunk_len:
                buckets.setdefault(ch, set()).add(fid)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                pairs.add((ms[i], ms[j]))
    return pairs


def exact_pairs(texts: dict[int, str]) -> set[tuple[int, int]]:
    """(representative=min id, duplicate) for byte-identical texts."""
    by_content: dict[str, list[int]] = {}
    for fid, text in texts.items():
        by_content.setdefault(text, []).append(fid)
    out: set[tuple[int, int]] = set()
    for ids in by_content.values():
        rep = min(ids)
        out |= {(rep, i) for i in ids if i != rep}
    return out


def candidate_pairs(texts: dict[int, str], cfg: DedupConfig) -> set[tuple[int, int]]:
    buckets: dict[str, list[int]] = {}
    for fid, text in texts.items():
        if len(text) < cfg.shingle_k:
            continue  # empty signature — excluded from banding (see lsh.py)
        for key in band_keys(minhash(text, cfg), cfg):
            buckets.setdefault(key, []).append(fid)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                pairs.add((members[i], members[j]))
    return pairs


def confirmed_pairs(
    texts: dict[int, str], cfg: DedupConfig, pairs: set[tuple[int, int]] | None = None
) -> set[tuple[int, int]]:
    pairs = candidate_pairs(texts, cfg) if pairs is None else pairs
    out = set()
    for a, b in pairs:
        if jaccard(texts[a], texts[b], cfg) >= cfg.jaccard_threshold:
            out.add((a, b))
        elif (
            min(len(texts[a]), len(texts[b])) >= cfg.substring_min_len
            and longest_common_substring(texts[a], texts[b]) >= cfg.substring_min_len
        ):
            out.add((a, b))
    return out


def clusters(ids: list[int], pairs: set[tuple[int, int]]) -> dict[int, int]:
    """Union-find → {file_id: min-id-of-component}."""
    parent = {i: i for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}
