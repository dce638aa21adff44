"""Pinned pipeline configuration.

The reference fixes its parameters at compile time (Rabin poly 0x45c2b6a1 /
window 32 / mask 0xfff in /root/reference/src/rabin.cpp:15,64-70 and
rabin.h:7-11; LZSS 12/4 bits in libs/lzsslib/src/lzlocal.h:47-59).  The graft
pins the analogous knobs here so every implementation — the vectorized pandas
UDF engine, the Spark SQL expression path, the DuckDB oracle SQL, and the
pure-Python test oracle — computes bit-identical signatures.

All hashing is integer-only (no floats) so results are reproducible across
numpy / JVM / DuckDB:

* ``MERSENNE = 2**31 - 1`` is the modulus for every hash.
* a k-shingle starting at 0-based position ``i`` of ``text`` hashes to
  ``sum_j code(text[i+j]) * BASE1**j  (mod MERSENNE)`` where ``code`` is the
  unicode codepoint (corpus and testdata are ASCII).
* a second, independent shingle hash uses ``BASE2`` (for SimHash's upper half).
* MinHash permutation ``t`` maps shingle hash ``h`` to ``(a_t*h + b_t) mod
  MERSENNE``; the signature entry is the minimum over the shingle multiset
  (``EMPTY_MIN = MERSENNE`` sentinel for texts shorter than ``k``).
* SimHash packs 31 majority-vote bits from hash-1 (low half) and 31 bits from
  hash-2 (high half) into one 62-bit ``BIGINT``:
  ``simhash = hi * 2**31 + lo`` (ties vote 1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

MERSENNE = 2_147_483_647  # 2**31 - 1
BASE1 = 1_000_003
BASE2 = 1_000_033
SIMHASH_HALF_BITS = 31


@dataclass(frozen=True)
class DedupConfig:
    """Pinned parameters (mirrors FIXTURES.md §4)."""

    shingle_k: int = 9          # chars per shingle
    num_perm: int = 128         # MinHash permutations
    lsh_bands: int = 16         # b
    lsh_rows: int = 8           # r   (b * r == num_perm)
    seed: int = 42
    jaccard_threshold: float = 0.7   # shingle-set Jaccard to confirm a near-dup pair
    substring_min_len: int = 256     # suffix-array confirm threshold (chars)
    max_bucket_size: int = 64        # LSH buckets larger than this are salted/capped
    shuffle_partitions: int = 32

    def __post_init__(self) -> None:
        assert self.lsh_bands * self.lsh_rows == self.num_perm

    @property
    def empty_min(self) -> int:
        return MERSENNE

    def minhash_coeffs(self) -> tuple[np.ndarray, np.ndarray]:
        """Seed-fixed (a, b) int64 arrays of length ``num_perm``.

        Drawn from ``numpy.random.RandomState(seed)`` so every consumer
        (pandas UDF, SQL builders, python oracle) sees identical values.
        """
        rs = np.random.RandomState(self.seed)
        a = rs.randint(1, MERSENNE, size=self.num_perm).astype(np.int64)
        b = rs.randint(0, MERSENNE, size=self.num_perm).astype(np.int64)
        return a, b

    def shingle_weights(self, base: int = BASE1) -> np.ndarray:
        """``[base**j mod MERSENNE for j in range(k)]`` as int64."""
        w = np.empty(self.shingle_k, dtype=np.int64)
        acc = 1
        for j in range(self.shingle_k):
            w[j] = acc
            acc = (acc * base) % MERSENNE
        return w


DEFAULT_CONFIG = DedupConfig()
