"""Chunk-level dedup storage — the reference's actual ``.ddp`` contract.

The reference dedups at *chunk* granularity: the encoder writes each unique
chunk's payload exactly once and every later occurrence as a bare 20-byte
fingerprint record (write_chunk_to_file, /root/reference/src/encoder.cpp:236-277);
the decoder reassembles the stream in ``(l1, l2)`` sequence order and fails
hard on a fingerprint whose payload was never seen
(/root/reference/src/decoder.cpp:200-291, hard error :268-271).

Spark-first re-expression as two tables:

* **chunk manifest** — one row per (doc, chunk position):
  ``(doc_id, chunk_idx, chunk_sha, chunk_len)``.  This is the fingerprint
  stream; it carries no payload.
* **chunk store** — one row per distinct ``chunk_sha`` with the payload.
  The ``groupBy(chunk_sha)`` exchange IS the encoder's global hash table
  (hash partitioning replaces per-bucket locks, map-side partial ``first``
  collapses within-partition duplicates before the shuffle).

Decode = manifest ⋈ store on ``chunk_sha`` → per-doc ``array_sort`` by
``chunk_idx`` (the ``(l1,l2)`` reorder) → concat → sha256 re-verified
against the original.  Missing payloads raise *executor-side during the
decode job* (``raise_error``), mirroring the decoder's per-record hard
fail — no driver pre-scan, no extra job.

Scale notes (100 TB): the store shuffle moves at most corpus bytes and at
least unique bytes (partial agg collapses local duplicates); the manifest
shuffle moves only 72-byte coordinate rows.  Decode's reassembly groupBy
shuffles unique-payload bytes × duplication factor — the same volume the
reference's decoder reads from disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.config import DedupConfig
from dedup_gpu_stream_parallelism_spark.operators.chunk import (
    CDC_MODULUS,
    CDC_WINDOW,
    chunk_documents,
)


# Recently-persisted chunk frames (see chunk_encode_store), capped at two
# live frames (incremental queries encode two halves): the oldest is
# released as new ones arrive, so a long session running many encode
# queries holds a BOUNDED executor cache instead of accumulating one
# full-corpus frame per query.
_PERSISTED_CHUNKS: list[DataFrame] = []
_PERSIST_CAP = 2


def release_chunk_cache() -> None:
    """Unpersist every chunk frame cached by
    ``chunk_encode_store(persist=True)`` (no-op if none).  Jobs call this
    once their outputs are materialized."""
    while _PERSISTED_CHUNKS:
        _PERSISTED_CHUNKS.pop().unpersist()


def chunk_encode_store(
    docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CDC_WINDOW,
    modulus: int = CDC_MODULUS,
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(chunk_manifest, chunk_store).

    Manifest: ``(doc_id, chunk_idx, chunk_sha, chunk_len)`` for every chunk
    of every doc.  Store: ``(chunk_sha, chunk_len, payload)`` — exactly one
    row per distinct chunk sha (payloads for equal sha are byte-identical,
    so ``first`` is value-deterministic).

    Both outputs branch off one chunking UDF pass; ``persist=True`` caches
    the chunk frame (MEMORY_AND_DISK) so consuming BOTH outputs runs the
    chunking UDF once, not twice — set it whenever both sides are acted on
    (the encode job does).  The cache is bounded: each persist=True call
    releases the previous call's frame, and ``release_chunk_cache()`` frees
    the last one explicitly.
    """
    chunks = chunk_documents(
        docs, cfg, id_col=id_col, text_col=text_col,
        window=window, modulus=modulus, with_payload=True,
    )
    if persist:
        while len(_PERSISTED_CHUNKS) >= _PERSIST_CAP:
            _PERSISTED_CHUNKS.pop(0).unpersist()
        chunks = chunks.persist()
        _PERSISTED_CHUNKS.append(chunks)
    manifest = chunks.select("doc_id", "chunk_idx", "chunk_sha", "chunk_len")
    store = chunks.groupBy("chunk_sha").agg(
        F.first("chunk_len").alias("chunk_len"),
        F.first("chunk_text").alias("payload"),
    )
    return manifest, store


def chunk_store_increment(
    prev_store: DataFrame,
    new_docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Incremental append at CHUNK granularity: encode ``new_docs`` and keep
    only the chunks whose sha is absent from ``prev_store`` — the encoder
    probing a populated hash table (encoder.cpp:481-524).  Returns
    (new_manifest, novel_store); the cumulative archive is
    ``prev_manifest ∪ new_manifest`` / ``prev_store ∪ novel_store`` and
    stays one-payload-per-sha by the anti-join.  ``prev_store`` must be the
    CUMULATIVE store (every generation so far), not one increment — see
    jobs/encode_store_job.py's lineage chain."""
    manifest, store = chunk_encode_store(
        new_docs, cfg, id_col=id_col, text_col=text_col, persist=persist
    )
    novel = store.join(prev_store.select("chunk_sha"), "chunk_sha", "left_anti")
    return manifest, novel


def chunk_decode(
    manifest: DataFrame, store: DataFrame, strict: bool = True
) -> DataFrame:
    """Rebuild ``(doc_id, text, n_chunks)`` from manifest ⋈ store.

    ``strict`` raises executor-side during the decode job for any manifest
    row whose sha has no store payload (decoder.cpp:268-271 semantics);
    non-strict substitutes an empty payload so the sha check downstream
    fails instead.  Docs with zero chunks (empty text) do not appear — the
    caller left-joins the doc list (see ``chunk_roundtrip_check``).

    Bytes-polymorphic like the encoder side (mbuffer.h consumes arbitrary
    bytes): a store whose ``payload`` is BinaryType reassembles via
    ``aggregate``+``concat`` over binary; StringType uses ``array_join``.
    """
    is_binary = dict(store.dtypes).get("payload") == "binary"
    empty_payload = F.lit(b"") if is_binary else F.lit("")
    payload = F.col("payload")
    if strict:
        payload = F.when(
            F.col("payload").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("referential integrity violated: no payload for chunk "),
                    F.col("chunk_sha"),
                )
            ),
        ).otherwise(F.col("payload"))
    joined = manifest.join(store.select("chunk_sha", "payload"), "chunk_sha", "left")
    # (l1,l2) reorder: sort the (chunk_idx, payload) structs — struct
    # ordering is field-order lexicographic, so chunk_idx drives — then
    # concat in sequence order.
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("chunk_idx", "payload"))),
        lambda s: s["payload"],
    )
    if is_binary:
        text = F.aggregate(
            ordered, empty_payload, lambda acc, p: F.concat(acc, p)
        )
    else:
        text = F.array_join(ordered, "")
    return (
        joined.select("doc_id", "chunk_idx", payload.alias("payload"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), text.alias("text"))
    )


def chunk_roundtrip_check(
    docs: DataFrame,
    cfg: DedupConfig | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode → decode → re-verify: ``(doc_id, sha256, n_chunks, sha_ok)``.

    The dedup ``-u`` round-trip at chunk granularity: every document's text
    is reassembled purely from the unique-chunk store and its sha256 must
    equal the original's (the per-row invariant).  Empty docs (zero chunks)
    round-trip to '' via the left join.
    """
    manifest, store = chunk_encode_store(
        docs, cfg, id_col=id_col, text_col=text_col, persist=True
    )
    decoded = chunk_decode(manifest, store, strict=True)
    empty = F.lit(b"") if dict(docs.dtypes).get(text_col) == "binary" else F.lit("")
    orig = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
    )
    return orig.join(decoded, "doc_id", "left").select(
        "doc_id",
        "sha256",
        F.coalesce("n_chunks", F.lit(0)).cast("bigint").alias("n_chunks"),
        (F.sha2(F.coalesce(F.col("text"), empty), 256) == F.col("sha256"))
        .cast("int")
        .alias("sha_ok"),
    )


def write_bucketed_store(
    manifest: DataFrame,
    store: DataFrame,
    name_prefix: str = "ddp",
    n_buckets: int = 16,
) -> tuple[str, str]:
    """Persist (manifest, store) as tables BUCKETED BY chunk_sha.

    Bucketing co-locates the decode join's two sides: both tables hash-
    partition on chunk_sha at WRITE time, so every future
    ``manifest ⋈ store`` runs with NO exchange on either side — at 100 TB
    the decode (and any chunk-key audit join) becomes a zip of
    co-partitioned buckets instead of a full shuffle of the store.  This is
    the Spark-native analog of the reference's persistent hash-table file
    layout (the ``.ddp`` stream is physically ordered by hash bucket,
    src/hashtable.cpp:69-210).

    Returns the two table names (``<prefix>_manifest``, ``<prefix>_store``).
    """
    mt, st = f"{name_prefix}_manifest", f"{name_prefix}_store"
    (
        manifest.write.mode("overwrite")
        .bucketBy(n_buckets, "chunk_sha")
        .sortBy("chunk_sha")
        .format("parquet")
        .saveAsTable(mt)
    )
    (
        store.write.mode("overwrite")
        .bucketBy(n_buckets, "chunk_sha")
        .sortBy("chunk_sha")
        .format("parquet")
        .saveAsTable(st)
    )
    return mt, st


def decode_from_tables(
    spark, manifest_table: str, store_table: str, strict: bool = True
) -> DataFrame:
    """``chunk_decode`` over bucketed tables — the join side of the plan
    carries no Exchange (see tests/test_store.py plan assertion)."""
    return chunk_decode(
        spark.table(manifest_table), spark.table(store_table), strict=strict
    )


def chunk_store_stats(manifest: DataFrame, store: DataFrame) -> DataFrame:
    """Storage-contract statistics: how much the chunk store actually saves
    (the -v block's dedup factor at chunk granularity, encoder.cpp:131-177).

    (n_chunk_refs, n_unique_chunks, total_chars, stored_chars,
    space_saving_factor) — one row.
    """
    m = manifest.agg(
        F.count("*").alias("n_chunk_refs"),
        F.sum("chunk_len").cast("bigint").alias("total_chars"),
    )
    s = store.agg(
        F.count("*").alias("n_unique_chunks"),
        F.sum(F.length("payload")).cast("bigint").alias("stored_chars"),
    )
    return m.crossJoin(s).select(
        "n_chunk_refs",
        "n_unique_chunks",
        "total_chars",
        "stored_chars",
        F.round(F.col("total_chars") / F.col("stored_chars"), 6).alias(
            "space_saving_factor"
        ),
    )
