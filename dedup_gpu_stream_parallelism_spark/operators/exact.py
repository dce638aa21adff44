"""Exact duplicate detection: the reference's hash-table dedup as a groupBy.

The reference probes one global SHA-1-keyed hash table under per-bucket locks
(``sub_Deduplicate``, /root/reference/src/encoder.cpp:481-524; table
src/hashtable.cpp:69-210).  The first chunk to arrive with a digest becomes
the *representative*; later arrivals become duplicates pointing at it
(src/dedupdef.h:170, set at src/encoder.cpp:516).

Spark-first: the shuffle exchange of a ``groupBy(sha256)`` IS the hash table
— hash partitioning replaces per-bucket locks, and "first writer wins" is a
deterministic ``min(order_key)`` instead of racy arrival order.  One shuffle;
whole-stage codegen end to end; no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input row: (id, sha256, cluster_id, is_duplicate).

    ``cluster_id`` = min id sharing the sha256 (the representative —
    deterministic stand-in for the reference's earliest-in-stream-order
    chunk).  ``is_duplicate`` mirrors the routing flag that lets duplicates
    skip the compress stage (src/encoder.cpp:580-594).
    """
    hashed = df.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("sha256")
    )
    w = Window.partitionBy("sha256")
    return hashed.select(
        "doc_id",
        "sha256",
        F.min("doc_id").over(w).alias("cluster_id"),
    ).withColumn(
        "is_duplicate", (F.col("doc_id") != F.col("cluster_id")).cast("int")
    )


def dedup_manifest(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The ``.ddp`` stream re-expressed as two logical tables in one:

    the reference writes uniques as compressed payload records and duplicates
    as bare 20-byte fingerprints (write_chunk_to_file,
    src/encoder.cpp:236-277).  Here every row carries (doc_id, sha256,
    representative_id, is_duplicate, payload_chars): duplicates carry 0
    payload — only the hash FK — exactly the storage contract of TYPE_FINGERPRINT
    records (src/dedupdef.h:183-185).
    """
    clustered = exact_dup_clusters(df, id_col, text_col)
    sizes = df.select(
        F.col(id_col).alias("doc_id"), F.length(text_col).alias("_len")
    )
    return (
        clustered.join(sizes, "doc_id")
        .select(
            "doc_id",
            "sha256",
            F.col("cluster_id").alias("representative_id"),
            "is_duplicate",
            F.when(F.col("is_duplicate") == 0, F.col("_len"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("payload_chars"),
        )
    )


def dedup_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The ``-v`` statistics block (print_stats, src/encoder.cpp:131-177):
    total rows/chars, distinct content, duplicate count, dedup factor.
    Returned as one row so it doubles as a metrics record."""
    m = dedup_manifest(df, id_col, text_col)
    return m.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("sha256").alias("n_unique"),
        F.sum("is_duplicate").cast("bigint").alias("n_duplicates"),
        F.sum("payload_chars").alias("unique_chars"),
        (F.round(F.count("*") / F.countDistinct("sha256"), 6)).alias("dedup_factor"),
    )
