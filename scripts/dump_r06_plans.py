#!/usr/bin/env python
"""Capture .explain("formatted") snapshots for the round-6 optimization
evidence (plans/r06/<query>_<tag>.txt).  Usage:
    python scripts/dump_r06_plans.py before|after [query ...]
Default query set = the round-6 touch list."""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dedup_gpu_stream_parallelism_spark.session import build_session  # noqa: E402

import __spark_entry__ as e  # noqa: E402

DEFAULT = [
    "minhash_signatures",
    "simhash_values",
    "minhash_jaccard_estimate",
    "simhash_near_dup",
    "lsh_candidates",
    "bucket_stats",
    "confirmed_pairs",
    "lzss_estimate",
    "cdc_chunks",
    "cdc_chunk_stats",
    "near_dup_clusters",
    "dedup_keep_list",
    "ddp_lzss_roundtrip_check",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    spark = build_session("plans-r06")
    sf = "/root/testdata/sf0.1"
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    for name in names:
        df = e.queries()[name](spark, sf)
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        out = os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(s)
        print(f"wrote {out} ({len(s.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
