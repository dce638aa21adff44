"""LSH banding: MinHash signature → band keys → candidate pairs.

This is the graft's "have we seen this before?" probe — the role of the
reference's global hash-table lookup (src/encoder.cpp:481-524) generalized
from exact to near duplicates.  The shuffle on band keys is the hash
exchange; hot buckets (boilerplate-heavy corpora) are the skew analog of the
reference's round-robin queue feeding (src/encoder.cpp:1156) and its
size-based CPU/GPU routing threshold (src/encoder_spar.cpp:272-280).

Scale design (100 TB / 10^12 files):
* bands explode JVM-side (``transform`` + ``posexplode`` — no Python);
* explicit ``repartition(P, band_key)`` before the self-join so AQE sees one
  well-keyed exchange;
* bucket sizes are bounded: a bucket of n members implies n(n-1)/2 pairs, so
  one viral boilerplate bucket can dominate the job.  ``star`` strategy
  emits only (min_id, other) pairs per bucket — O(n) pairs, preserves
  connectivity for clustering (any two members stay linked through the hub),
  loses only per-pair similarity scores for non-hub pairs.
* ``all_pairs`` keeps exact pair semantics (used at test scale and by the
  DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.config import DedupConfig


def band_keys(signed: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """Explode a signed frame (doc_id, minhash array<bigint>) into
    (doc_id, band, band_key string).  JVM-only expressions."""
    cfg = cfg or DedupConfig()
    r = cfg.lsh_rows
    # Texts shorter than k have the empty signature (every entry == the
    # EMPTY_MIN sentinel).  Banding them would put ALL of them in the same
    # buckets — a quadratic skew bomb at corpus scale — and they can only be
    # exact duplicates anyway, which the sha256 path already clusters.
    signed = signed.where(F.element_at("minhash", 1) != F.lit(cfg.empty_min))
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda band: F.concat_ws(
            ",",
            F.transform(
                F.slice(F.col("minhash"), band * r + F.lit(1), r),
                lambda v: v.cast("string"),
            ),
        ),
    )
    return (
        signed.select("doc_id", F.posexplode(keys).alias("band", "_k"))
        .select(
            "doc_id",
            "band",
            F.concat_ws(":", F.col("band").cast("string"), F.col("_k")).alias(
                "band_key"
            ),
        )
    )


def candidate_pairs(
    banded: DataFrame,
    cfg: DedupConfig | None = None,
    strategy: str = "all_pairs",
) -> DataFrame:
    """Distinct (a_id, b_id) candidate pairs, a_id < b_id.

    ``all_pairs``: exact LSH semantics via self-join on band_key.
    ``star``: skew-capped — every bucket member pairs with the bucket's min
    id only; plus all-pairs for buckets <= cfg.max_bucket_size.
    """
    cfg = cfg or DedupConfig()
    parts = cfg.shuffle_partitions
    banded = banded.repartition(parts, "band_key")

    if strategy == "all_pairs":
        a = banded.alias("a")
        b = banded.alias("b")
        pairs = (
            a.join(b, "band_key")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
            )
        )
        return pairs.distinct()

    if strategy == "star":
        # bucket hub = min doc_id; emit (hub, member) per bucket.
        hubs = banded.groupBy("band_key").agg(
            F.min("doc_id").alias("hub"), F.count("*").alias("bucket_n")
        )
        star = (
            banded.join(hubs, "band_key")
            .where(F.col("doc_id") != F.col("hub"))
            .select(F.col("hub").alias("a_id"), F.col("doc_id").alias("b_id"))
        )
        # small buckets additionally get exact all-pairs (cheap, better scores)
        small = hubs.where(F.col("bucket_n") <= cfg.max_bucket_size).select("band_key")
        small_banded = banded.join(F.broadcast(small), "band_key")
        a = small_banded.alias("a")
        b = small_banded.alias("b")
        dense = (
            a.join(b, "band_key")
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        )
        return star.unionByName(dense).distinct()

    raise ValueError(f"unknown strategy {strategy!r}")


def bucket_stats(banded: DataFrame) -> DataFrame:
    """Skew diagnostics: bucket-size histogram (the analog of the reference's
    chunk-size histogram, src/encoder.h:38-44)."""
    sizes = banded.groupBy("band_key").agg(F.count("*").alias("bucket_n"))
    return sizes.groupBy("bucket_n").agg(F.count("*").alias("n_buckets")).orderBy(
        "bucket_n"
    )
