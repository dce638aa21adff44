#!/usr/bin/env python
"""Dup-pair recall at corpus scale (north rule: recall >= 0.99).

Runs the flagship pipeline over the cached N-file synthetic corpus and
measures the fraction of PLANTED duplicate pairs (exact, near-0.95/0.85,
shared-substring, boilerplate — every kind above the pinned similarity
config; the sub-threshold near-0.5 band is by design not a duplicate) that
land in the same cluster.  The same check runs at 150 docs in
tests/test_pipeline.py against the independent python oracle; this script
is the at-scale version for BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-files", type=int, default=100_000)
    p.add_argument("--cpus", type=int, default=8)
    p.add_argument("--strategy", default="star")
    args = p.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "sb", os.path.join(REPO, "scripts", "scaling_bench.py")
    )
    sb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sb)
    corpus_path = sb.ensure_corpus(args.n_files)

    from dedup_gpu_stream_parallelism_spark.config import DedupConfig
    from dedup_gpu_stream_parallelism_spark.plans.pipeline import run_pipeline
    from dedup_gpu_stream_parallelism_spark.session import build_session
    from dedup_gpu_stream_parallelism_spark.sources.corpus import generate_corpus

    _, truth = generate_corpus(args.n_files, seed=42)  # same seed as the parquet
    hard = [(a, b) for a, b, kind in truth.pairs if kind != "near0.15"]

    spark = build_session("recall", cpus=args.cpus)
    docs = spark.read.parquet(corpus_path)
    res = run_pipeline(
        docs, DedupConfig(), id_col="file_id", text_col="content",
        pair_strategy=args.strategy,
    )
    clus = {r.doc_id: r.cluster_id for r in res.clusters.collect()}
    spark.stop()

    hit = sum(clus[a] == clus[b] for a, b in hard)
    by_kind: dict[str, list[int]] = {}
    for a, b, kind in truth.pairs:
        if kind == "near0.15":
            continue
        by_kind.setdefault(kind.split("0.")[0], []).append(int(clus[a] == clus[b]))
    out = {
        "metric": "planted_dup_pair_recall",
        "value": round(hit / len(hard), 6),
        "n_files": args.n_files,
        "n_hard_pairs": len(hard),
        "strategy": args.strategy,
        "by_kind": {k: round(sum(v) / len(v), 6) for k, v in by_kind.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
