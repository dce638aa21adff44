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
    # band_key = xxhash64(band_idx, the band's r signature values): an 8-byte
    # shuffle key instead of a ~90-char string (10x less exchange volume; a
    # hash collision merely merges two buckets, adding candidate pairs the
    # confirm stage rejects — recall is unaffected).
    keys = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda band: F.xxhash64(
            band, F.slice(F.col("minhash"), band * r + F.lit(1), r)
        ),
    )
    return signed.select("doc_id", F.posexplode(keys).alias("band", "band_key"))


def all_candidate_keys(signed: DataFrame, cfg: DedupConfig | None = None) -> DataFrame:
    """(doc_id, band, band_key) combining LSH bands (positions 0..b-1) AND
    the fused CDC chunk keys (positions >= b) from a frame signed with
    ``with_chunk_keys=True`` — ONE projection over ONE signature-UDF pass,
    so the downstream ``candidate_pairs`` groupBy is the single exchange
    for BOTH candidate sources.  A cross-space key collision (LSH key ==
    chunk key, ~2^-64) merely merges two buckets; the confirm stage
    rejects any false pair it adds.
    """
    cfg = cfg or DedupConfig()
    r = cfg.lsh_rows
    signed = signed.where(F.element_at("minhash", 1) != F.lit(cfg.empty_min))
    lsh_keys = F.transform(
        F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1)),
        lambda band: F.xxhash64(
            band, F.slice(F.col("minhash"), band * r + F.lit(1), r)
        ),
    )
    combined = F.concat(
        lsh_keys,
        F.coalesce(F.col("chunk_keys"), F.array().cast("array<bigint>")),
    )
    return signed.select("doc_id", F.posexplode(combined).alias("band", "band_key"))


def candidate_pairs(
    banded: DataFrame,
    cfg: DedupConfig | None = None,
    strategy: str = "all_pairs",
    salt_buckets: int = 16,
) -> DataFrame:
    """Distinct (a_id, b_id) candidate pairs, a_id < b_id.

    ``all_pairs``: exact LSH semantics — every in-bucket pair (quadratic in
    bucket size; test/oracle scale).
    ``star``: skew-capped scale path — buckets <= cfg.max_bucket_size emit
    all pairs, larger buckets emit only (min_id, member) star edges: O(n)
    pairs, connectivity preserved through the hub, so clustering is
    unaffected; only non-hub pair scores are lost.

    The groupBy(band_key) hash exchange IS the "repartition by band hash"
    of the north rule; pair expansion happens JVM-side on the grouped id
    arrays (no second join shuffle, no per-row Python).

    ``salt_buckets > 1`` salts hot band keys through a two-phase
    aggregation: phase 1 groups by (band_key, salt(doc_id)) so a viral
    bucket's collect_set spreads over ``salt_buckets`` reducers instead of
    one; phase 2 merges the (already id-deduped, much smaller) partial
    arrays per band_key.  Identical results; the monster-bucket hotspot is
    the reference's per-bucket-lock contention (src/encoder.cpp:498-499)
    re-appearing as a single-reducer task, and salting is the Spark cure.
    """
    cfg = cfg or DedupConfig()

    if salt_buckets > 1:
        salted = banded.withColumn(
            "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
        )
        partial = salted.groupBy("band_key", "_salt").agg(
            F.collect_set("doc_id").alias("_ids")
        )
        grouped = (
            partial.groupBy("band_key")
            .agg(
                F.sort_array(
                    F.array_distinct(F.flatten(F.collect_list("_ids")))
                ).alias("ids")
            )
            .where(F.size("ids") >= 2)
        )
    else:
        grouped = (
            banded.groupBy("band_key")
            .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
            .where(F.size("ids") >= 2)
        )
    ids = F.col("ids")
    # all pairs (i < j) from the sorted id array, built with array exprs
    all_pairs_expr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.size(ids)),
                lambda y: F.struct(x.alias("a_id"), y.alias("b_id")),
            ),
        )
    )
    star_expr = F.transform(
        F.slice(ids, F.lit(2), F.size(ids)),
        lambda y: F.struct(F.element_at(ids, 1).alias("a_id"), y.alias("b_id")),
    )

    if strategy == "all_pairs":
        pairs_expr = all_pairs_expr
    elif strategy == "star":
        pairs_expr = F.when(
            F.size(ids) <= cfg.max_bucket_size, all_pairs_expr
        ).otherwise(star_expr)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    return (
        grouped.select(F.explode(pairs_expr).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )


def bucket_stats(banded: DataFrame) -> DataFrame:
    """Skew diagnostics: bucket-size histogram (the analog of the reference's
    chunk-size histogram, src/encoder.h:38-44)."""
    sizes = banded.groupBy("band_key").agg(F.count("*").alias("bucket_n"))
    return sizes.groupBy("bucket_n").agg(F.count("*").alias("n_buckets")).orderBy(
        "bucket_n"
    )
