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
def test_spark_submit_encode_store_incremental(tmp_path, spark):
    """encode_store_job: initial encode, then incremental append — the
    union of stores stays one-payload-per-sha and decodes every doc."""
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_pkg

    pkg = build_pkg.build(str(tmp_path / "pkg.zip"))
    from dedup_gpu_stream_parallelism_spark.sources.corpus import corpus_df

    full = corpus_df(spark, n_files=100, seed=23, partitions=4).cache()
    inp1 = str(tmp_path / "batch1.parquet")
    inp2 = str(tmp_path / "batch2.parquet")
    full.where("file_id < 50").write.mode("overwrite").parquet(inp1)
    full.where("file_id >= 50").write.mode("overwrite").parquet(inp2)

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

    out1 = str(tmp_path / "run1")
    out2 = str(tmp_path / "run2")
    submit(inp1, out1)
    submit(inp2, out2, extra=("--append-to", out1))

    store1 = spark.read.parquet(os.path.join(out1, "chunk_store"))
    store2 = spark.read.parquet(os.path.join(out2, "chunk_store"))
    union_store = store1.unionByName(store2)
    # union stays unique per sha (append wrote only NOVEL chunks)
    assert union_store.count() == union_store.select("chunk_sha").distinct().count()

    # decode every doc from (manifest1 ∪ manifest2) ⋈ union store
    from dedup_gpu_stream_parallelism_spark.operators import store as store_op
    from pyspark.sql import functions as F

    manifests = spark.read.parquet(
        os.path.join(out1, "chunk_manifest")
    ).unionByName(spark.read.parquet(os.path.join(out2, "chunk_manifest")))
    decoded = store_op.chunk_decode(manifests, union_store)
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

    # doc-level incremental manifest equals the one-shot manifest
    from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op

    one_shot = exact_op.dedup_manifest(orig, "doc_id", "text")
    inc_union = spark.read.parquet(
        os.path.join(out1, "doc_manifest")
    ).unionByName(spark.read.parquet(os.path.join(out2, "doc_manifest")))
    assert sorted(map(tuple, one_shot.collect())) == sorted(
        map(tuple, inc_union.collect())
    )
