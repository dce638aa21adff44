"""Structured-Streaming dedup — the stream-parallel face of the engine.

The reference IS a streaming system: SPar's ``[[spar::ToStream]]`` source
feeds replicated dedup stages and an ordered sink
(/root/reference/src/encoder_spar.cpp:89-315, encoder_spar_new.cpp:548-616).
The Spark-native re-expression:

* micro-batch = the reference's ringbuffer batch (src/dedupdef.h:194-202);
* ``exact_dedup_stream`` — first-writer-wins on sha256 with
  ``applyInPandasWithState``: the keyed state store IS the reference's
  global hash table (src/encoder.cpp:78, 65536-bucket cache), sharded by
  the shuffle on the key exactly as the reference shards bucket locks
  (src/encoder.cpp:498-499);
* ``near_dup_stream`` — ``foreachBatch`` incremental pipeline: each batch
  is signed, LSH-probed against an accumulating parquet signature index,
  then appended to it — the streaming analog of probe-then-insert
  (src/encoder.cpp:481-524).

Both run with ``trigger(availableNow=True)`` in tests (bounded replay) and
unbounded in production; checkpointLocation gives exactly-once sinks and
crash-resume — the Iceberg-snapshot resumability stand-in at stream level.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dedup_gpu_stream_parallelism_spark.config import DedupConfig
from dedup_gpu_stream_parallelism_spark.functions.signatures import sign_documents
from dedup_gpu_stream_parallelism_spark.operators import lsh as lsh_op

DEDUP_STATE_SCHEMA = "first_doc_id bigint, n_seen bigint"
DEDUP_OUT_SCHEMA = (
    "sha256 string, doc_id bigint, representative_id bigint, is_duplicate int"
)


def _dedup_by_sha(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """First-writer-wins per sha256 across micro-batches.

    State = (first_doc_id, n_seen).  Within a batch the smallest doc_id is
    the representative (deterministic); across batches the FIRST seen
    representative wins — stream order, like the reference's insert-once
    hash table (src/encoder.cpp:481-524)."""
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("doc_id")
    if state.exists:
        first_id, n_seen = state.get
    else:
        first_id, n_seen = int(rows["doc_id"].iloc[0]), 0
    state.update((first_id, n_seen + len(rows)))
    yield pd.DataFrame(
        {
            "sha256": rows["sha256"],
            "doc_id": rows["doc_id"],
            "representative_id": first_id,
            "is_duplicate": (rows["doc_id"] != first_id).astype("int32"),
        }
    )


def exact_dedup_stream(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """sha256-keyed stateful dedup over an unbounded stream.

    Input: streaming DataFrame with (id_col, text_col).  Output stream:
    (sha256, doc_id, representative_id, is_duplicate)."""
    hashed = stream.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.sha2(F.col(text_col), 256).alias("sha256"),
    )
    return hashed.groupBy("sha256").applyInPandasWithState(
        _dedup_by_sha,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class NearDupStream:
    """foreachBatch incremental near-dup matcher.

    Maintains a parquet signature index at ``index_dir``.  For each
    micro-batch: sign → LSH band keys → join against the index's band keys
    → emit (new_doc_id, matched_doc_id) candidates → append batch
    signatures to the index.  Confirmation (Jaccard / suffix array) runs
    downstream on the emitted candidates exactly as in the batch pipeline,
    or inside the micro-batch with ``confirm=True``: every cross-batch
    candidate is verified with the batch verify kernel (Jaccard +
    suffix-array, operators/verify.py) against a text side-index — the
    full probe→verify→insert cycle per batch.
    """

    def __init__(
        self,
        index_dir: str,
        out_dir: str,
        cfg: DedupConfig | None = None,
        confirm: bool = False,
    ):
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.cfg = cfg or DedupConfig()
        self.confirm = confirm

    def _index_path(self) -> str:
        return os.path.join(self.index_dir, "bands")

    def _texts_path(self) -> str:
        return os.path.join(self.index_dir, "texts")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cfg = self.cfg
        signed = sign_documents(
            batch_df.select(
                F.col("doc_id").cast("bigint").alias("doc_id"),
                F.col("text"),
            ),
            text_col="text",
            cfg=cfg,
        )
        batch_txt = batch_df.select(
            F.col("doc_id").cast("bigint").alias("doc_id"), F.col("text")
        ).localCheckpoint()
        banded = lsh_op.band_keys(signed, cfg).localCheckpoint()
        path = self._index_path()
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            index = spark.read.parquet(path)
            matches = (
                banded.alias("n")
                .join(index.alias("o"), "band_key")
                .where(F.col("n.doc_id") != F.col("o.doc_id"))
                .select(
                    F.col("n.doc_id").alias("doc_id"),
                    F.col("o.doc_id").alias("matched_id"),
                )
                .distinct()
            )
        else:
            matches = banded.limit(0).select(
                F.col("doc_id"), F.col("doc_id").alias("matched_id")
            )

        if self.confirm:
            from dedup_gpu_stream_parallelism_spark.operators import verify as verify_op

            texts_path = self._texts_path()
            if os.path.exists(os.path.join(texts_path, "_SUCCESS")):
                all_txt = batch_txt.unionByName(spark.read.parquet(texts_path))
            else:
                all_txt = batch_txt
            pairs = matches.select(
                F.col("matched_id").alias("a_id"), F.col("doc_id").alias("b_id")
            )
            out = verify_op.confirm_pairs(pairs, all_txt, cfg).select(
                F.col("b_id").alias("doc_id"),
                F.col("a_id").alias("matched_id"),
                "inter",
                "uni",
                "lcs_len",
                "confirmed",
            )
        else:
            out = matches
        out.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            self.out_dir
        )
        banded.select("doc_id", "band", "band_key").write.mode("append").parquet(path)
        if self.confirm:
            batch_txt.write.mode("append").parquet(self._texts_path())

    def attach(self, stream: DataFrame, checkpoint_dir: str, **trigger: Any):
        if not trigger:
            trigger = {"availableNow": True}
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(**trigger)
        )


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream —
    late data beyond the watermark is dropped, state is bounded (the
    streaming analog of the reference's bounded reorder window,
    src/encoder.cpp:1214-1359)."""
    # watermarks need TIMESTAMP (not NTZ — parquet default)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )
