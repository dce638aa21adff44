#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule).

No real cluster exists in this sandbox, so the rule's N-vs-4N-executor
criterion is evidenced by running the IDENTICAL flagship job at two
parallelism levels — ``local[8]`` and ``local[32]`` — on the SAME input
(the reference's analog: its 1..20-thread sweep, benchmark/benchmark.py:26).

Input: a deterministic synthetic source-code corpus (sources/corpus.py,
seed-fixed, Iceberg-shaped columns) generated ONCE into ``.bench/`` and
re-read by both levels, so generation cost never pollutes the timing.
Pair strategy ``star`` — the skew-capped scale path the 100 TB design uses.

Writes a markdown report section to BENCH.md and prints the JSON result.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Idle-host guard (round-3 lesson: two 1M-file runs measured 0.78 under
# residual host load vs 0.918 after true idle — SCALING_r03.json
# "variance_note").  Baseline: single-thread sha256 of 512 MiB ≈ 0.37 s
# (~1370 MiB/s) measured on this guest while idle, loadavg < 0.3.
PROBE_BASELINE_SEC = 0.38
PROBE_SLOWDOWN_MAX = 1.25   # probe slower than this ratio => host busy
LOADAVG_1M_MAX = 1.5
# 8-thread aggregate floor: healthy windows measure 8000-10300 MiB/s;
# neighbor events crater it to 2300-2900 while the single-thread probe
# stays green (round-5 evidence in BENCH.md).  Below this, multi-core
# timings are untrustworthy; wait_for_idle keeps polling (and marks the
# run TAINTED if its patience expires).
MT_AGGREGATE_MIN = 7000.0


def cpu_probe() -> float:
    """Single-thread sha256 over 512 MiB; wall seconds (idle ≈ 0.37 s)."""
    import hashlib

    buf = b"\xab" * (1 << 20)
    t0 = time.perf_counter()
    h = hashlib.sha256()
    for _ in range(512):
        h.update(buf)
    return time.perf_counter() - t0


def mt_probe() -> float:
    """8-thread aggregate sha256 MiB/s (hashlib releases the GIL).  The
    single-thread probe misses hypervisor-neighbor contention: round 4
    measured identical single-core speed but ~25% lower multi-core
    aggregate hours apart on a loadavg-0 guest.  Promoted to a GATE in
    round 5: a neighbor event measured mt 2839 while the single-thread
    probe read 1.04 — and inflated the 45-query bench 1.7x with
    pure-compute queries flat (BENCH.md round-5 snapshots).  Healthy
    band observed across rounds: 8000-10300 MiB/s."""
    import hashlib
    from concurrent.futures import ThreadPoolExecutor

    buf = b"\xab" * (1 << 20)

    def one(_):
        h = hashlib.sha256()
        for _ in range(64):
            h.update(buf)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(8) as ex:
        list(ex.map(one, range(8)))
    return 8 * 64 / (time.perf_counter() - t0)


def host_probe() -> dict:
    load1 = float(open("/proc/loadavg").read().split()[0])
    probe = cpu_probe()
    ratio = probe / PROBE_BASELINE_SEC
    mt = round(mt_probe(), 0)
    return {
        "loadavg_1m": load1,
        "probe_sec": round(probe, 3),
        "probe_slowdown": round(ratio, 3),
        "mt_aggregate_mibs": mt,
        "idle": (
            load1 <= LOADAVG_1M_MAX
            and ratio <= PROBE_SLOWDOWN_MAX
            and mt >= MT_AGGREGATE_MIN
        ),
    }


def wait_for_idle(max_wait_sec: int = 1800, poll_sec: int = 120) -> dict:
    """Block until host_probe says idle (or max_wait expires); returns the
    final probe dict with the attempt history attached.  Refusing outright
    would waste an unattended 40-min run slot; waiting is strictly better."""
    attempts = []
    deadline = time.time() + max_wait_sec
    while True:
        p = host_probe()
        attempts.append(p)
        print(json.dumps({"host_probe": p}), flush=True)
        if p["idle"] or time.time() >= deadline:
            p = dict(p)
            p["attempts"] = attempts
            if not p["idle"]:
                p["verdict"] = "TAINTED: started despite busy probe (max_wait expired)"
            else:
                p["verdict"] = "idle"
            return p
        time.sleep(poll_sec)


def snapshot_repo() -> tuple[str, str, bool]:
    """Export HEAD into a throwaway snapshot dir and return
    ``(snapshot_dir, commit, dirty)``.

    The timed subprocesses re-import repo code LIVE at launch time: round
    5's run 3 died because a hot-path module was being edited the moment
    the local[8] level started.  Measuring from a ``git archive HEAD``
    snapshot makes runs immune to concurrent edits AND pins the artifact
    to a commit (measured code == committed code; a dirty tree is
    recorded so the artifact can't silently claim untracked changes)."""
    import shutil
    import subprocess

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd=REPO, check=True,
    ).stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True, text=True,
        cwd=REPO, check=True,
    ).stdout.strip())
    snap = os.path.join("/tmp", f"scaling_snapshot_{commit[:12]}")
    if not os.path.exists(os.path.join(snap, "bench.py")):
        # extract into a per-process temp dir and rename: an interrupted tar
        # must never leave a partial snapshot that later runs mistake for a
        # complete one, and two concurrent invocations for the same commit
        # must not share (or race on) the staging dir
        shutil.rmtree(snap, ignore_errors=True)
        tmp = f"{snap}.partial.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp)
        tar = subprocess.run(
            ["git", "archive", "HEAD"], capture_output=True, cwd=REPO,
            check=True,
        ).stdout
        subprocess.run(["tar", "-x", "-C", tmp], input=tar, check=True)
        try:
            os.replace(tmp, snap)
        except OSError:
            # a concurrent invocation completed the snapshot between our
            # rmtree and rename — accept theirs iff it is complete
            if not os.path.exists(os.path.join(snap, "bench.py")):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return snap, commit, dirty


def run_bench_level(snap: str, cpus: int, corpus: str, strategy: str) -> dict:
    """One subprocess-isolated bench level from the code snapshot; on
    failure, surfaces the child's stderr tail (run 3 swallowed it)."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable, os.path.join(snap, "bench.py"),
            "--single-run", str(cpus),
            "--sf-dir", os.path.dirname(corpus),
            "--input", corpus,
            "--id-col", "file_id", "--text-col", "content",
            "--strategy", strategy,
        ],
        capture_output=True, text=True, cwd=snap,
    )
    if out.returncode != 0:
        tail = "\n".join(out.stderr.strip().splitlines()[-25:])
        print(f"bench.py --single-run {cpus} FAILED (rc={out.returncode}); "
              f"stderr tail:\n{tail}", file=sys.stderr, flush=True)
        raise RuntimeError(f"bench level cpus={cpus} failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def round_artifact_path() -> str:
    """Per-round scaling artifact next to the driver's BENCH_r{N}.json:
    the CURRENT round is one past the last recorded bench round (the driver
    writes BENCH_rN at round end), so evidence produced during round N+1
    lands in SCALING_r{N+1}.json."""
    import re

    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := re.match(r"BENCH_r(\d+)\.json$", f))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(REPO, f"SCALING_r{n:02d}.json")


def write_round_artifact(payload: dict) -> str:
    """Write (or MERGE into) the round artifact.

    Hand-curated keys from earlier runs this round (``runs`` ledger,
    ``context`` analysis) survive a re-run: the new payload replaces the
    top-level measurement keys but appends to ``runs`` instead of
    clobbering it (the round-5 lesson: the overwrite destroyed the
    two-run variance ledger until restored from a manual backup)."""
    path = round_artifact_path()
    if payload.get("kind") != "n_vs_4n":
        # secondary runs (e.g. --sweep's core_sweep) nest under their kind —
        # they must never clobber (or, when they run FIRST, squat on) the
        # top level, which is reserved for the n_vs_4n ledger.  Repeat runs
        # of the same kind accumulate as a list instead of replacing.
        kind = payload.get("kind") or "extra"
        old = {}
        if os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
        prev = old.get(kind)
        if prev is None:
            old[kind] = payload
        elif isinstance(prev, list):
            old[kind] = prev + [payload]
        else:
            old[kind] = [prev, payload]
        payload = old
    elif os.path.exists(path) and payload.get("kind") == "n_vs_4n":
        with open(path) as f:
            old = json.load(f)
        runs = dict(old.get("runs", {}))
        n = len(runs) + 1
        runs[f"full_run_{n}"] = {
            "value": payload["value"],
            "speedup": payload["speedup"],
            "local2_sec": payload["levels"][min(payload["levels"])]["sec"],
            "local8_sec": payload["levels"][max(payload["levels"])]["sec"],
            "commit": payload.get("commit"),
            "note": "see host_probes of the latest top-level payload",
        }
        merged = dict(old)
        merged.update(payload)
        merged["runs"] = runs
        if "context" in old:
            merged["context"] = old["context"]
        payload = merged
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    return path


def ensure_corpus(n_files: int, seed: int = 42) -> str:
    path = os.path.join(REPO, ".bench", f"corpus_{n_files}_{seed}.parquet")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from dedup_gpu_stream_parallelism_spark.session import build_session
    from dedup_gpu_stream_parallelism_spark.sources.corpus import corpus_df

    spark = build_session("corpus-gen", cpus=8, shuffle_partitions=8)
    corpus_df(spark, n_files=n_files, seed=seed, partitions=64).write.mode(
        "overwrite"
    ).parquet(path)
    spark.stop()
    return path


def run_sweep(
    corpus: str,
    cores: list[int],
    strategy: str,
    repeats: int = 2,
    settle: int = 45,
) -> list[dict]:
    """Core-count sweep of the flagship (the reference's 1..20-thread sweep,
    benchmark/benchmark.py:26) — subprocess-isolated JVM per level.

    ``settle`` seconds of idle before every run: this host shows up to 2x
    slowdown for minutes after a previous Spark JVM exits (BENCH.md), so
    back-to-back levels contaminate each other.  Best-of-``repeats``."""
    import time

    snap, _, _ = snapshot_repo()
    results = []
    for cpus in cores:
        best = None
        for _ in range(repeats):
            time.sleep(settle)
            r = run_bench_level(snap, cpus, corpus, strategy)
            print(json.dumps(r), flush=True)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results.append(best)
    return results


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-files", type=int, default=100_000)
    # N=2 (vs 4N=8): the widest 4x span where this guest's vCPUs are real
    # silicon — see BENCH.md "Why N=2"
    p.add_argument("--n-cores", type=int, default=2)
    p.add_argument("--repeats", type=int, default=1)
    p.add_argument("--strategy", default="star")
    p.add_argument(
        "--max-wait", type=int, default=1800,
        help="seconds wait_for_idle polls before starting a level TAINTED "
             "(neighbor events observed today lasted ~1 h; raise for "
             "unattended overnight runs)",
    )
    p.add_argument(
        "--sweep", default=None,
        help="comma-separated core counts (e.g. 1,2,4,8,16,24,32): run the "
             "flagship at each and append the knee table to BENCH.md",
    )
    args = p.parse_args()

    if args.sweep:
        corpus = ensure_corpus(args.n_files)
        cores = [int(c) for c in args.sweep.split(",")]
        rows = run_sweep(corpus, cores, args.strategy, repeats=max(args.repeats, 2))
        base = rows[0]
        md_rows = "\n".join(
            f"| {r['cpus']} | {r['sec']} | {r['files_per_sec']} | "
            f"{round(r['files_per_sec'] / base['files_per_sec'], 2)}x |"
            for r in rows
        )
        md = f"""
## Core-count sweep ({args.n_files:,} files, strategy `{args.strategy}`)

The reference's 1..20-thread sweep analog (benchmark/benchmark.py:26); one
subprocess-isolated JVM per level, python workers pre-warmed.

| cores | wall (s) | files/sec | speedup vs {base['cpus']} |
|---|---|---|---|
{md_rows}
"""
        with open(os.path.join(REPO, "BENCH.md"), "a") as f:
            f.write(md)
        art = write_round_artifact(
            {"kind": "core_sweep", "n_files": args.n_files,
             "strategy": args.strategy, "sweep": rows}
        )
        print(json.dumps({"sweep": rows, "artifact": art}))
        return

    corpus = ensure_corpus(args.n_files)
    # Probe-gated twin of bench.run_scaling: identical subprocess-isolated
    # single-run invocations from a HEAD snapshot, plus a host_probe before
    # every timed run so the artifact records whether each level ran on an
    # idle host (VERDICT_r3 #8).
    snap, commit, dirty = snapshot_repo()
    print(json.dumps({"snapshot": snap, "commit": commit, "dirty": dirty}),
          flush=True)

    levels, probes = {}, {}
    for cpus in (args.n_cores, 4 * args.n_cores):
        best, lvl_probes = None, []
        for _ in range(max(args.repeats, 1)):
            lvl_probes.append(wait_for_idle(max_wait_sec=args.max_wait))
            r = run_bench_level(snap, cpus, corpus, args.strategy)
            print(json.dumps(r), flush=True)
            if best is None or r["sec"] < best["sec"]:
                best = r
        levels[cpus] = best
        probes[str(cpus)] = lvl_probes
    lo_r, hi_r = levels[args.n_cores], levels[4 * args.n_cores]
    eff = (hi_r["files_per_sec"] / lo_r["files_per_sec"]) / 4.0
    result = {
        "metric": "scaling_efficiency_Nx4N",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_cores": args.n_cores,
        "levels": levels,
        "speedup": round(hi_r["files_per_sec"] / lo_r["files_per_sec"], 2),
        "host_probes": probes,
        "n_files": args.n_files,
        "strategy": args.strategy,
    }

    lo = result["levels"][args.n_cores]
    hi = result["levels"][4 * args.n_cores]
    md = f"""
## Scaling run: local[{args.n_cores}] vs local[{4 * args.n_cores}] (same input)

Synthetic source-code corpus, {args.n_files:,} files (seed 42, planted dups),
pair strategy `{args.strategy}`, subprocess-isolated JVMs, python-worker pool
pre-warmed at both levels.

| cores | wall (s) | files/sec |
|---|---|---|
| {args.n_cores} | {lo['sec']} | {lo['files_per_sec']} |
| {4 * args.n_cores} | {hi['sec']} | {hi['files_per_sec']} |

**Speedup {result['speedup']}x over 4x cores → scaling efficiency
{result['value']}** (north-rule target >= 0.8).  Machine-readable copy:
`{os.path.basename(round_artifact_path())}`.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)
    art = write_round_artifact(
        {
            "kind": "n_vs_4n",
            "metric": "scaling_efficiency",
            "value": result["value"],
            "speedup": result["speedup"],
            "n_cores": args.n_cores,
            "levels": result["levels"],
            "n_files": args.n_files,
            "strategy": args.strategy,
            "host_probes": probes,
            "commit": commit,
            "dirty_tree_at_launch": dirty,
            "host_note": "guest delivers ~18 effective cores (BENCH.md "
                         "ceiling probe); N=2 vs 4N=8 is the widest honest "
                         "4x span on real silicon",
        }
    )
    result["artifact"] = art
    print(json.dumps(result))


if __name__ == "__main__":
    main()
