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
unbounded in production.  checkpointLocation gives crash-resume with
at-least-once foreachBatch invocation — the Iceberg-snapshot resumability
stand-in at stream level; NearDupStream makes its own writes idempotent
per batch_id (dynamic partition overwrite) so replays repair rather than
duplicate.
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

def _has_partitions(path: str) -> bool:
    """True iff ``path`` holds at least one actual parquet data file.

    Checking for batch_id= directories alone is NOT enough: a partitioned
    write of an EMPTY DataFrame creates the batch directory with only
    _SUCCESS inside, and ``spark.read.parquet`` on a dir with zero footers
    throws unable-to-infer-schema."""
    if not os.path.isdir(path):
        return False
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


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

    State is bounded and replay-safe:

    * **Idempotence** — ``foreachBatch`` is at-least-once, so every write
      (matches, band index, text index) is partitioned by ``batch_id`` and
      uses dynamic partition overwrite: a replayed batch overwrites its own
      partitions instead of duplicating them.  The sink is therefore
      effectively-once per batch (NOT a blanket exactly-once guarantee —
      outputs of a batch that never re-runs after a partial write are
      repaired on the replay that the checkpoint forces).
    * **Probe pruning** — band rows carry ``bucket = pmod(band_key,
      n_buckets)`` as a partition column; each probe reads only the
      buckets the batch's own band keys hash to, so per-batch probe I/O
      tracks the batch, not the history.
    * **Bounded text index** — with ``confirm=True`` only *novel* docs
      (no confirmed match) enter the text side-index: duplicate text is
      represented once, like the reference's unique-payload store.
    * **Compaction** — ``compact()`` (auto every ``compact_every``
      batches) rewrites the band index's many per-batch partitions into
      one consolidated generation to keep file counts flat.
    """

    def __init__(
        self,
        index_dir: str,
        out_dir: str,
        cfg: DedupConfig | None = None,
        confirm: bool = False,
        n_buckets: int = 32,
        compact_every: int | None = None,
    ):
        self.index_dir = index_dir
        self.out_dir = out_dir
        self.cfg = cfg or DedupConfig()
        self.confirm = confirm
        self.n_buckets = n_buckets
        self.compact_every = compact_every

    def _index_path(self) -> str:
        return os.path.join(self.index_dir, "bands")

    def _recover(self) -> None:
        """Repair the index after a compact() that crashed between its two
        renames: the whole pre-compaction index lives under ``bands.trash``
        and — if the crash hit after the new-batch moves — the newest
        (batch_id >= exclude_from) partitions live ONLY under
        ``bands.compacting``.  Restore trash first, then pull any real
        batch partitions stranded in the tmp dir back in (the half-written
        ``batch_id=-1`` consolidated generation is NOT restored — its rows
        still exist as the per-batch partitions just recovered from trash).
        """
        path = self._index_path()
        tmp = path + ".compacting"
        trash = path + ".trash"
        if os.path.exists(trash) and not os.path.exists(path):
            os.rename(trash, path)
        # The tmp-pull is UNCONDITIONAL (re-entrant): a crash inside a
        # previous _recover after the trash rename but before the pull
        # leaves trash gone, path present, and the newest batches still
        # stranded under tmp — they must be rescued before any cleanup
        # rmtree's the tmp dir.  In the only state where tmp coexists
        # with an intact index mid-crash, tmp holds the redundant
        # batch_id=-1 generation (skipped) plus possibly-moved real
        # batches absent from path (pulled).
        if os.path.isdir(tmp) and os.path.isdir(path):
            for e in os.listdir(tmp):
                dst = os.path.join(path, e)
                if (
                    e.startswith("batch_id=")
                    and e != "batch_id=-1"
                    and not os.path.exists(dst)
                ):
                    os.rename(os.path.join(tmp, e), dst)

    def _texts_path(self) -> str:
        return os.path.join(self.index_dir, "texts")

    @staticmethod
    def _write_partitioned(
        df: DataFrame, path: str, batch_id: int, extra_parts: tuple[str, ...] = ()
    ) -> None:
        """Idempotent per-batch write: each batch targets its own
        ``batch_id=<n>`` partition directory with overwrite, so a replayed
        batch replaces exactly its own output (partition discovery exposes
        ``batch_id`` as a column on read; an empty batch still writes a
        schema-bearing empty file, keeping the directory readable).
        ``extra_parts`` adds partition levels below batch_id (the band
        index uses ``bucket`` so probes partition-prune)."""
        writer = df.write.mode("overwrite")
        if extra_parts:
            writer = writer.partitionBy(*extra_parts)
        writer.parquet(os.path.join(path, f"batch_id={batch_id}"))

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
        # batch texts are only consumed on the confirm path — don't pay an
        # eager checkpoint job per trigger for the probe-only stream
        batch_txt = (
            batch_df.select(
                F.col("doc_id").cast("bigint").alias("doc_id"), F.col("text")
            ).localCheckpoint()
            if self.confirm
            else None
        )
        banded = (
            lsh_op.band_keys(signed, cfg)
            .withColumn(
                "bucket", F.pmod(F.col("band_key"), F.lit(self.n_buckets)).cast("int")
            )
            .localCheckpoint()
        )
        path = self._index_path()
        # recover from a compact() that crashed between its two renames
        # (index then lives under the trash dir, newest batches possibly
        # stranded in the compacting tmp dir)
        self._recover()
        if _has_partitions(path):
            # partition-prune the historical index to the batch's buckets:
            # probe cost tracks the batch size, not the history size
            probe_buckets = [
                r["bucket"] for r in banded.select("bucket").distinct().collect()
            ]
            # batch_id < current: a replayed batch must not probe its own
            # (or a later, partially-committed) batch's index rows —
            # both filters partition-prune
            index = spark.read.parquet(path).where(
                F.col("bucket").isin(probe_buckets)
                & (F.col("batch_id") < F.lit(batch_id))
            )
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
            if _has_partitions(texts_path):
                # prune the history read to the id-hash buckets of THIS
                # batch's matched ids (the band index's bucket partition
                # trick applied to the text side-index): per-trigger text
                # I/O tracks the match set, not the stream's lifetime —
                # previously every trigger scanned the WHOLE novel-texts
                # history even when matches was tiny
                match_buckets = [
                    r["tb"]
                    for r in matches.select(
                        F.pmod(
                            F.xxhash64("matched_id"), F.lit(self.n_buckets)
                        )
                        .cast("int")
                        .alias("tb")
                    )
                    .distinct()
                    .collect()
                ]
                all_txt = batch_txt.unionByName(
                    spark.read.parquet(texts_path)
                    .where(
                        F.col("tbucket").isin(match_buckets)
                        & (F.col("batch_id") < F.lit(batch_id))
                    )
                    .select("doc_id", "text")
                )
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
            ).localCheckpoint()
        else:
            out = matches
        self._write_partitioned(out, self.out_dir, batch_id)
        self._write_partitioned(
            # one task per bucket → one index file per bucket per batch
            # (instead of tasks×buckets tiny files; same rows, same layout
            # the compactor produces)
            banded.select("doc_id", "band", "band_key", "bucket").repartition(
                self.n_buckets, "bucket"
            ),
            path,
            batch_id,
            extra_parts=("bucket",),
        )
        if self.confirm:
            # representative texts only: a doc with a confirmed match never
            # needs to serve as a verify target (its representative does).
            # Partitioned by id-hash bucket so future probes prune the read.
            dup_ids = out.where(F.col("confirmed") == 1).select("doc_id").distinct()
            novel = batch_txt.join(dup_ids, "doc_id", "left_anti").withColumn(
                "tbucket",
                F.pmod(F.xxhash64("doc_id"), F.lit(self.n_buckets)).cast("int"),
            )
            self._write_partitioned(
                novel.repartition(self.n_buckets, "tbucket"),
                self._texts_path(),
                batch_id,
                extra_parts=("tbucket",),
            )
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            self.compact(exclude_from=batch_id)

    def compact(self, exclude_from: int | None = None) -> None:
        """Fold the band index's per-batch partitions into one consolidated
        ``batch_id=-1`` generation (file count flat as batches accumulate).

        ``exclude_from`` keeps partitions with batch_id >= that value
        un-folded — the in-stream auto-compaction passes the current batch
        id so a replay of a not-yet-committed batch still sees only
        strictly-earlier rows.  Two renames with a trash dir; a crash
        between them leaves the index only under ``bands.trash`` — the
        next compact() (or process_batch probe via this method) restores
        it automatically before doing anything destructive.  Run it from
        the stream's own foreachBatch thread (as ``compact_every`` does)
        so it never races a probe."""
        import shutil

        path = self._index_path()
        tmp = path + ".compacting"
        trash = path + ".trash"
        # crash recovery FIRST: if a previous compact died between the two
        # renames, the only copy of the index lives in the trash dir (and
        # possibly partly in the tmp dir) — restore before any cleanup
        # could delete it
        self._recover()
        if not _has_partitions(path):
            return
        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        for d in (tmp, trash):
            if os.path.exists(d):
                shutil.rmtree(d)
        src = spark.read.parquet(path)
        if exclude_from is not None:
            src = src.where(F.col("batch_id") < F.lit(exclude_from))
        (
            src.drop("batch_id")
            .repartition(self.n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(tmp, "batch_id=-1"))
        )
        os.rename(path, trash)
        if exclude_from is not None:
            for e in os.listdir(trash):
                if e.startswith("batch_id=") and int(e.split("=", 1)[1]) >= exclude_from:
                    os.rename(os.path.join(trash, e), os.path.join(tmp, e))
        os.rename(tmp, path)
        shutil.rmtree(trash)

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
    exact_ints: bool = False,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over the events stream —
    late data beyond the watermark is dropped, state is bounded (the
    streaming analog of the reference's bounded reorder window,
    src/encoder.cpp:1214-1359).

    ``exact_ints=True`` emits the oracle-comparable shape (epoch start,
    integer fixed-point sum, no approximate distinct): the columns whose
    values are independent of partial-aggregation order, used by the
    deterministic replay query (streaming/replay.py)."""
    # watermarks need TIMESTAMP (not NTZ — parquet default)
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    grouped = events.withWatermark("ts", watermark).groupBy(
        F.window("ts", window).alias("w"), F.col("event_type")
    )
    if exact_ints:
        return grouped.agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000000.0).cast("long")).alias(
                "sum_value_micro"
            ),
        ).select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value_micro",
        )
    return grouped.agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
        "approx_users",
    )
