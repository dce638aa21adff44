#!/usr/bin/env python
"""spark-submit entrypoint: chunk-level dedup storage encode (the ``.ddp``
write path) with optional incremental append against an existing store.

    python scripts/build_pkg.py                       # -> dist/pkg.zip
    spark-submit --master <cluster> --py-files dist/pkg.zip \
        jobs/encode_store_job.py \
        --input  s3://corpus/files.parquet \
        --output s3://store/run1 \
        --id-col file_id --text-col content

Outputs under --output: chunk_manifest/ (doc_id, chunk_idx, chunk_sha,
chunk_len), chunk_store/ (one payload per distinct chunk_sha),
doc_manifest/ (doc-level dedup manifest), stats.json.  With
``--append-to <prev output>`` the doc manifest is computed incrementally
against the previous run's doc_manifest (exact.dedup_increment) and only
NEW unique chunks are written (anti-join on the previous chunk_store keys)
— the encoder-probing-a-populated-hash-table workflow
(/root/reference/src/encoder.cpp:481-524)."""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="file_id")
    p.add_argument("--text-col", default="content")
    p.add_argument("--append-to", default=None,
                   help="previous run's --output: incremental append")
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    builder = SparkSession.builder.appName("dedup-encode-store")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    # imported AFTER SparkSession so --py-files distribution is in place
    from dedup_gpu_stream_parallelism_spark.config import DedupConfig
    from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op
    from dedup_gpu_stream_parallelism_spark.operators import store as store_op

    cfg = DedupConfig()
    docs = spark.read.parquet(args.input)
    manifest, store = store_op.chunk_encode_store(
        docs, cfg, id_col=args.id_col, text_col=args.text_col, persist=True
    )

    if args.append_to:
        prev_doc_manifest = spark.read.parquet(
            os.path.join(args.append_to, "doc_manifest")
        )
        doc_manifest = exact_op.dedup_increment(
            prev_doc_manifest, docs, args.id_col, args.text_col
        )
        prev_keys = spark.read.parquet(
            os.path.join(args.append_to, "chunk_store")
        ).select("chunk_sha")
        # store only chunks this batch introduces; the union of the two
        # stores remains one-payload-per-sha
        store = store.join(prev_keys, "chunk_sha", "left_anti")
    else:
        doc_manifest = exact_op.dedup_manifest(
            docs, args.id_col, args.text_col
        )

    manifest.write.mode("overwrite").parquet(
        os.path.join(args.output, "chunk_manifest")
    )
    store.write.mode("overwrite").parquet(
        os.path.join(args.output, "chunk_store")
    )
    doc_manifest.write.mode("overwrite").parquet(
        os.path.join(args.output, "doc_manifest")
    )

    # stats describe the CUMULATIVE archive: in append mode the manifest
    # and store are the union of the previous run's and this run's (the
    # novel-only store alone would report a meaningless saving factor)
    stats_manifest = spark.read.parquet(os.path.join(args.output, "chunk_manifest"))
    stats_store = spark.read.parquet(os.path.join(args.output, "chunk_store"))
    if args.append_to:
        stats_manifest = stats_manifest.unionByName(
            spark.read.parquet(os.path.join(args.append_to, "chunk_manifest"))
        )
        stats_store = stats_store.unionByName(
            spark.read.parquet(os.path.join(args.append_to, "chunk_store"))
        )
    stats = store_op.chunk_store_stats(stats_manifest, stats_store).first().asDict()
    with open(os.path.join(args.output, "stats.json"), "w") as f:
        json.dump(stats, f)
    print("STATS " + json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
