#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default mode: run every query in ``__spark_entry__.queries()`` on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) at
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Scaling mode (``--scaling``): run the flagship near-dup pipeline at two
parallelism levels (local[N] and local[4N], subprocess-isolated JVMs) on the
SAME input and report throughput at both plus scaling efficiency — the
in-sandbox evidence for the north rule's two-cluster-size criterion (the
analog of the reference's 1..20-thread sweep, benchmark/benchmark.py:26).
Results are appended to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_queries(sf_dir: str, cpus: int) -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry_mod
    from dedup_gpu_stream_parallelism_spark.session import build_session

    spark = build_session("bench", cpus=cpus)
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # warm the JVM once so per-query numbers are steady-state
    spark.range(1000).selectExpr("sum(id)").collect()
    # ...and the python/Arrow worker pool: a JVM-only warmup leaves the
    # FIRST UDF-bearing query paying the whole worker spawn (measured
    # ~8-14 s at 16-32 slots) — one trivial mapInPandas over one task per
    # slot spawns them all up front
    spark.range(10_000).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    total0 = time.monotonic()
    for name, fn in qs.items():
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        # noop sink materializes EVERY output column — count() would let
        # Catalyst prune projections/sorts and time little more than the scan
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    total = round(time.monotonic() - total0, 3)
    flagship = timings.get("near_dup_clusters", total)
    result = {
        "metric": "near_dup_pipeline_wall",
        "value": flagship,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "total_sec": total,
        "n_docs": n_docs,
        "files_per_sec": round(n_docs / flagship, 1) if flagship else None,
        "cpus": cpus,
    }
    spark.stop()
    return result


def run_flagship_once(
    sf_dir: str,
    cpus: int,
    input_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "all_pairs",
) -> dict:
    """Time ONLY the flagship pipeline end-to-end at a given core count."""
    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from dedup_gpu_stream_parallelism_spark.config import DedupConfig
    from dedup_gpu_stream_parallelism_spark.plans.pipeline import run_pipeline
    from dedup_gpu_stream_parallelism_spark.session import build_session

    # max(cpus, 8) shuffle partitions — the configuration every recorded
    # scaling artifact used.  (A 4*cpus experiment measurably improved the
    # candidate-pair shuffle stage, 44->30 s at 8 cores, but the gain was
    # smaller than this host's run-to-run noise in the UDF stages, so the
    # recorded config is kept; on a real cluster size shuffle partitions
    # to ~2-4 waves per total core as the pipeline docs describe.)
    spark = build_session(f"scaling-{cpus}", cpus=cpus, shuffle_partitions=max(cpus, 8))
    path = input_path or f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    # warm up JVM codegen AND the python-worker pool (mapInPandas fork cost
    # scales with cores; exclude it so both levels measure steady state)
    spark.range(4 * cpus).repartition(cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    t0 = time.monotonic()
    res = run_pipeline(
        docs, DedupConfig(), id_col=id_col, text_col=text_col,
        pair_strategy=strategy,
    )
    n_out = res.clusters.count()
    dt = time.monotonic() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "sec": round(dt, 3),
        "n_docs": n_docs,
        "n_out": n_out,
        "files_per_sec": round(n_docs / dt, 1),
        "stages": {m.stage: m.seconds for m in res.metrics},
    }


def run_scaling(
    sf_dir: str,
    n: int,
    repeats: int = 1,
    input_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "all_pairs",
) -> dict:
    """local[N] vs local[4N] on identical input via subprocess-isolated JVMs."""
    levels = {}
    for cpus in (n, 4 * n):
        best = None
        for _ in range(repeats):
            cmd = [
                sys.executable, __file__, "--single-run", str(cpus),
                "--sf-dir", sf_dir, "--id-col", id_col,
                "--text-col", text_col, "--strategy", strategy,
            ]
            if input_path:
                cmd += ["--input", input_path]
            out = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                cwd=REPO,
                check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            if best is None or r["sec"] < best["sec"]:
                best = r
        levels[cpus] = best
    lo, hi = levels[n], levels[4 * n]
    eff = (hi["files_per_sec"] / lo["files_per_sec"]) / 4.0
    return {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": n,
        "levels": levels,
        "speedup": round(hi["files_per_sec"] / lo["files_per_sec"], 2),
        "sf": _sf_of(sf_dir),
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    # fallback 8: this host delivers ~18 effective cores and local[8] beats
    # local[32] end-to-end (BENCH.md core sweep); an explicit
    # SPARK_GRAFT_CPUS always wins
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    p.add_argument("--scaling", action="store_true", help="N vs 4N scaling run")
    p.add_argument("--scaling-n", type=int, default=8)
    p.add_argument("--repeats", type=int, default=1)
    p.add_argument("--single-run", type=int, metavar="CPUS", default=None,
                   help="internal: time the flagship once at CPUS cores")
    p.add_argument("--input", default=None, help="parquet path overriding sf-dir docs")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--strategy", default="all_pairs", choices=["all_pairs", "star"])
    args = p.parse_args()

    if args.single_run is not None:
        print(json.dumps(run_flagship_once(
            args.sf_dir, args.single_run, input_path=args.input,
            id_col=args.id_col, text_col=args.text_col, strategy=args.strategy,
        )))
        return
    if args.scaling:
        print(json.dumps(run_scaling(
            args.sf_dir, args.scaling_n, args.repeats, input_path=args.input,
            id_col=args.id_col, text_col=args.text_col, strategy=args.strategy,
        )))
        return
    print(json.dumps(run_queries(args.sf_dir, args.cpus)))


if __name__ == "__main__":
    main()
