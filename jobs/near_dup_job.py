#!/usr/bin/env python
"""spark-submit entrypoint: full near-dup detection + clustering job.

Ships with the package zip (north rule: ``spark-submit --py-files pkg.zip
jobs/near_dup_job.py``):

    python scripts/build_pkg.py                       # -> dist/pkg.zip
    spark-submit --master <cluster> --py-files dist/pkg.zip \
        jobs/near_dup_job.py \
        --input  s3://corpus/files.parquet \
        --output s3://results/run1 \
        --id-col file_id --text-col content \
        --strategy star --workdir s3://results/run1/checkpoints

Outputs under --output: clusters/ (doc_id, cluster_id), confirmed_pairs/,
exact_clusters/, metrics.json (per-stage rows/sec).  --workdir enables
stage-snapshot resume after a crash (pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--id-col", default="file_id")
    p.add_argument("--text-col", default="content")
    p.add_argument("--strategy", default="star", choices=["star", "all_pairs"])
    p.add_argument("--workdir", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    args = p.parse_args()

    builder = SparkSession.builder.appName("near-dup-clustering")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = builder.config("spark.sql.adaptive.enabled", "true").getOrCreate()

    # imported AFTER SparkSession so --py-files distribution is in place
    from dedup_gpu_stream_parallelism_spark.config import DedupConfig
    from dedup_gpu_stream_parallelism_spark.plans.pipeline import run_pipeline

    docs = spark.read.parquet(args.input)
    res = run_pipeline(
        docs,
        DedupConfig(),
        id_col=args.id_col,
        text_col=args.text_col,
        workdir=args.workdir,
        pair_strategy=args.strategy,
    )
    res.clusters.write.mode("overwrite").parquet(
        os.path.join(args.output, "clusters")
    )
    res.confirmed.write.mode("overwrite").parquet(
        os.path.join(args.output, "confirmed_pairs")
    )
    res.exact_clusters.write.mode("overwrite").parquet(
        os.path.join(args.output, "exact_clusters")
    )
    metrics_path = os.path.join(args.output, "metrics.json")
    with open(metrics_path, "w") as f:  # local/posix path in this sandbox
        f.write(res.metrics_json())
    print("METRICS " + json.dumps(json.loads(res.metrics_json())))
    spark.stop()


if __name__ == "__main__":
    main()
