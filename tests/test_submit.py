"""The shipping contract: spark-submit --py-files pkg.zip runs the job end
to end from OUTSIDE the repo (package resolved from the zip only)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_job(tmp_path, spark):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_pkg

    pkg = build_pkg.build(str(tmp_path / "pkg.zip"))

    # small corpus parquet as job input
    from dedup_gpu_stream_parallelism_spark.sources.corpus import corpus_df

    inp = str(tmp_path / "corpus.parquet")
    corpus_df(spark, n_files=120, seed=11, partitions=4).write.mode(
        "overwrite"
    ).parquet(inp)

    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", pkg,
            os.path.join(REPO, "jobs", "near_dup_job.py"),
            "--input", inp,
            "--output", out,
            "--strategy", "star",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo — proves the zip carries the pkg
        env=env,
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]

    clusters = spark.read.parquet(os.path.join(out, "clusters"))
    assert clusters.count() == 120
    assert set(clusters.columns) == {"doc_id", "cluster_id"}
    # the planted exact duplicates must cluster together
    assert clusters.where("cluster_id <> doc_id").count() > 0
    metrics = json.load(open(os.path.join(out, "metrics.json")))
    assert [m["stage"] for m in metrics][:2] == ["01_sign_and_band", "02_exact_clusters"]


@pytest.mark.slow
def test_spark_submit_encode_store_incremental_chain(tmp_path, spark):
    """encode_store_job: initial encode, then TWO chained appends (the
    generation-3 case that used to re-store generation-1 chunks) — the
    3-way union of stores stays one-payload-per-sha and decodes every
    doc."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_pkg

    pkg = build_pkg.build(str(tmp_path / "pkg.zip"))
    from dedup_gpu_stream_parallelism_spark.sources.corpus import corpus_df

    full = corpus_df(spark, n_files=100, seed=23, partitions=4).cache()
    splits = [(0, 40), (40, 70), (70, 100)]
    inps = []
    for i, (lo, hi) in enumerate(splits):
        inp = str(tmp_path / f"batch{i}.parquet")
        full.where(f"file_id >= {lo} AND file_id < {hi}").write.mode(
            "overwrite"
        ).parquet(inp)
        inps.append(inp)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)

    def submit(inp, out, extra=()):
        res = subprocess.run(
            [
                spark_submit, "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--py-files", pkg,
                os.path.join(REPO, "jobs", "encode_store_job.py"),
                "--input", inp, "--output", out, *extra,
            ],
            capture_output=True, text=True, cwd=str(tmp_path), env=env,
            timeout=420,
        )
        assert res.returncode == 0, res.stderr[-3000:]

    outs = [str(tmp_path / f"run{i}") for i in range(3)]
    submit(inps[0], outs[0])
    submit(inps[1], outs[1], extra=("--append-to", outs[0]))
    submit(inps[2], outs[2], extra=("--append-to", outs[1]))  # chained

    def _union(sub):
        dfs = [spark.read.parquet(os.path.join(o, sub)) for o in outs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    union_store = _union("chunk_store")
    # cumulative union stays unique per sha even across a CHAINED append
    # (generation 3 must not re-store generation-1 chunks)
    assert union_store.count() == union_store.select("chunk_sha").distinct().count()

    # decode every doc from the 3-way manifests ⋈ union store
    from dedup_gpu_stream_parallelism_spark.operators import store as store_op
    from pyspark.sql import functions as F

    decoded = store_op.chunk_decode(_union("chunk_manifest"), union_store)
    orig = full.select(
        F.col("file_id").alias("doc_id"), F.col("content").alias("text")
    )
    bad = (
        decoded.alias("d")
        .join(orig.alias("o"), "doc_id")
        .where(F.col("d.text") != F.col("o.text"))
        .count()
    )
    assert bad == 0
    assert decoded.count() == full.where("length(content) > 0").count()

    # doc-level incremental manifests union to the one-shot manifest
    from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op

    one_shot = exact_op.dedup_manifest(orig, "doc_id", "text")
    assert sorted(map(tuple, one_shot.collect())) == sorted(
        map(tuple, _union("doc_manifest").collect())
    )
    # cumulative stats.json reflects ALL generations, not just the parent
    stats = json.load(open(os.path.join(outs[2], "stats.json")))
    assert stats["n_chunk_refs"] == _union("chunk_manifest").count()
    assert stats["n_unique_chunks"] == union_store.count()
