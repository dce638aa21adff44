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


def encode_store(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(manifest, unique_store) — the two tables the ``.ddp`` stream encodes:
    manifest rows for every input (duplicates carry only the sha FK), and
    payload text stored ONCE per distinct sha (representative's row).
    """
    manifest = dedup_manifest(df, id_col, text_col)
    reps = manifest.where(F.col("is_duplicate") == 0).select(
        F.col("doc_id").alias("_rep_id"), "sha256"
    )
    store = reps.join(
        df.select(F.col(id_col).alias("_rep_id"), F.col(text_col).alias("payload")),
        "_rep_id",
    ).select("sha256", "payload")
    return manifest, store


def decode_roundtrip(
    manifest: DataFrame,
    store: DataFrame,
    strict: bool = True,
) -> DataFrame:
    """The inverse query — the reference's ``dedup -u`` round-trip oracle
    (Decode, /root/reference/src/decoder.cpp:200-291): rebuild every doc's
    text from (manifest ⋈ unique store) and re-verify sha256(payload) ==
    manifest.sha256 row by row.  ``strict`` mirrors the decoder's hard
    error on a duplicate whose representative is missing
    (src/decoder.cpp:268-271).

    Returns (doc_id, sha256, payload, sha_ok int).

    ``strict`` fails *executor-side during the decode job itself*
    (``raise_error`` on a null payload) — per-record, like the reference
    decoder, rather than a driver pre-scan: the whole check costs zero
    extra jobs and the plan stays fully lazy.
    """
    payload = F.col("payload")
    if strict:
        payload = F.when(
            F.col("payload").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "referential integrity violated: no representative "
                        "payload in the unique store for doc "
                    ),
                    F.col("doc_id").cast("string"),
                )
            ),
        ).otherwise(F.col("payload"))
    return manifest.join(store, "sha256", "left").select(
        "doc_id",
        "sha256",
        payload.alias("payload"),
        (F.sha2(F.coalesce(payload, F.lit("")), 256) == F.col("sha256"))
        .cast("int")
        .alias("sha_ok"),
    )


def dedup_increment(
    old_manifest: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dedup a NEW batch against an EXISTING manifest — the append workflow
    (the reference's encoder probing an already-populated hash table,
    src/encoder.cpp:481-524: present → fingerprint record, absent → insert).

    Returns manifest rows for the new docs only: a new doc whose sha exists
    in ``old_manifest`` points at the OLD representative and stores no
    payload; shas novel to this batch dedup among themselves (min new id
    wins).  ``unionByName(old_manifest, result)`` is the updated manifest —
    identical to re-running ``dedup_manifest`` over the full corpus when new
    ids sort after old ones.

    One sha-key shuffle join against the old reps + one window over the new
    batch; the old manifest is never rewritten (append-only, snapshot-
    friendly).
    """
    new_hashed = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
        F.length(text_col).alias("_len"),
    )
    old_reps = (
        old_manifest.where(F.col("is_duplicate") == 0)
        .select("sha256", F.col("doc_id").alias("_old_rep"))
    )
    w = Window.partitionBy("sha256")
    return (
        new_hashed.join(old_reps, "sha256", "left")
        .select(
            "doc_id",
            "sha256",
            "_len",
            F.coalesce(F.col("_old_rep"), F.min("doc_id").over(w)).alias(
                "representative_id"
            ),
        )
        .select(
            "doc_id",
            "sha256",
            "representative_id",
            (F.col("doc_id") != F.col("representative_id")).cast("int").alias(
                "is_duplicate"
            ),
            F.when(F.col("doc_id") == F.col("representative_id"), F.col("_len"))
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
