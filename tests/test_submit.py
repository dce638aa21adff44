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
