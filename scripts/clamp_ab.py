#!/usr/bin/env python
"""A/B the shuffle-width clamp for the three round-4 driver-bench
regressions (VERDICT_r4 #3): ``incremental_dedup_manifest`` (+41%),
``minhash_jaccard_estimate`` (+30%), ``simhash_near_dup`` (+21%).

Hypothesis under test: SPARK_GRAFT_EFFECTIVE_CORES=16 (round 4's new
clamp, session.py:32-33) reshaped these queries' exchanges — they are the
shuffle/join-bearing ones — while everything else got faster.  Two stable
queries ride along as host-noise controls.

Runs interleaved A/B/A/B (subprocess-isolated JVMs at the driver contract
local[$SPARK_GRAFT_CPUS or 32]) so slow host drift hits both arms; takes
best-of-N per arm and appends a table to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TARGETS = [
    "incremental_dedup_manifest",
    "minhash_jaccard_estimate",
    "simhash_near_dup",
]
CONTROLS = ["exact_dup_clusters", "text_stats"]


def run_worker(sf_dir: str, cpus: int, names: list[str]) -> None:
    import __spark_entry__ as entry_mod
    from dedup_gpu_stream_parallelism_spark.session import build_session

    spark = build_session("clamp-ab", cpus=cpus)
    qs = entry_mod.queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10_000).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    timings = {}
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    print(json.dumps(timings))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    p.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--settle", type=int, default=30)
    p.add_argument("--worker", action="store_true")
    args = p.parse_args()
    names = TARGETS + CONTROLS

    if args.worker:
        run_worker(args.sf_dir, args.cpus, names)
        return

    arms = {"clamp16": "16", "unclamped": str(args.cpus)}
    best: dict[str, dict[str, float]] = {a: {} for a in arms}
    for rep in range(args.repeats):
        for arm, eff in arms.items():
            time.sleep(args.settle)
            env = dict(os.environ, SPARK_GRAFT_EFFECTIVE_CORES=eff)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--sf-dir", args.sf_dir, "--cpus", str(args.cpus)],
                capture_output=True, text=True, cwd=REPO, check=True, env=env,
            )
            t = json.loads(out.stdout.strip().splitlines()[-1])
            print(json.dumps({"rep": rep, "arm": arm, **t}), flush=True)
            for k, v in t.items():
                if k not in best[arm] or v < best[arm][k]:
                    best[arm][k] = v
    rows = "\n".join(
        f"| {q} | {best['clamp16'][q]} | {best['unclamped'][q]} | "
        f"{'target' if q in TARGETS else 'control'} |"
        for q in names
    )
    md = f"""
## Clamp A/B: SPARK_GRAFT_EFFECTIVE_CORES 16 vs {args.cpus} (local[{args.cpus}], sf0.1)

Round-4 regression diagnosis (VERDICT_r4 #3); best-of-{args.repeats},
interleaved arms, driver-contract queries via the noop sink.

| query | clamp=16 (s) | unclamped (s) | role |
|---|---|---|---|
{rows}
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
