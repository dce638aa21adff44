"""End-to-end pipeline: oracle equality, recall, invariants, resumability."""

import hashlib

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def result(corpus_df, cfg):
    return run_pipeline(corpus_df, cfg, id_col="file_id", text_col="content")


def test_candidates_equal_oracle(result, oracle_results):
    got = {(r.a_id, r.b_id) for r in result.candidates.collect()}
    assert got == oracle_results["candidates"]


def test_confirmed_equal_oracle(result, oracle_results):
    got = {(r.a_id, r.b_id) for r in result.confirmed.where("confirmed=1").collect()}
    assert got == oracle_results["confirmed"]


def test_clusters_equal_oracle(result, oracle_results):
    got = {r.doc_id: r.cluster_id for r in result.clusters.collect()}
    assert got == oracle_results["clusters"]


def test_dup_pair_recall_at_least_099(result, oracle_results):
    """North rule: pipeline pairs must recall >= 0.99 of oracle pairs."""
    got = {(r.a_id, r.b_id) for r in result.confirmed.where("confirmed=1").collect()}
    want = oracle_results["confirmed"]
    recall = len(got & want) / len(want)
    assert recall >= 0.99


def test_planted_truth_recall(result, corpus):
    """Planted duplicates above the similarity threshold end in one cluster."""
    _, truth = corpus
    clus = {r.doc_id: r.cluster_id for r in result.clusters.collect()}
    hard = [(a, b) for a, b, kind in truth.pairs if kind != "near0.15"]
    hit = sum(clus[a] == clus[b] for a, b in hard)
    assert hit / len(hard) >= 0.99


def test_sha256_invariant_through_pipeline(result, corpus):
    rows, _ = corpus
    want = {r["file_id"]: hashlib.sha256(r["content"].encode()).hexdigest() for r in rows}
    got = {r.doc_id: r.sha256 for r in result.signed.collect()}
    assert got == want
    got2 = {r.doc_id: r.sha256 for r in result.exact_clusters.collect()}
    assert got2 == want


def test_every_doc_in_exactly_one_cluster(result, corpus):
    rows, _ = corpus
    clus = result.clusters.collect()
    assert len(clus) == len(rows)
    assert {r.doc_id for r in clus} == {r["file_id"] for r in rows}
    assert all(r.cluster_id is not None for r in clus)


def test_metrics_emitted_per_stage(result):
    names = [m.stage for m in result.metrics]
    assert names == [
        "01_sign_and_band",
        "02_exact_clusters",
        "03_candidate_pairs",
        "04_confirmed_pairs",
        "05_clusters",
    ]
    assert all(m.rows_out > 0 for m in result.metrics)


def test_lineage_partition_column(result):
    assert "partition_id" in result.signed.columns


def test_resume_from_checkpoints(spark, corpus_df, cfg, tmp_path, oracle_results):
    """Snapshot resumability: second run reuses all five stage checkpoints."""
    wd = str(tmp_path / "ckpt")
    r1 = run_pipeline(corpus_df, cfg, id_col="file_id", text_col="content", workdir=wd)
    r2 = run_pipeline(corpus_df, cfg, id_col="file_id", text_col="content", workdir=wd)
    assert all(m.stage.endswith("(resumed)") for m in r2.metrics)
    got = {r.doc_id: r.cluster_id for r in r2.clusters.collect()}
    assert got == oracle_results["clusters"]


def test_plan_version_purge_spares_foreign_dirs(spark, tmp_path):
    """The stale-workdir purge deletes ONLY NN_stage snapshot dirs: a
    workdir shared with (or mistakenly pointed at) unrelated artifacts
    keeps everything it didn't recognize."""
    from dedup_gpu_stream_parallelism_spark.plans.pipeline import _Stager

    wd = tmp_path / "wd"
    (wd / "01_sign_and_band").mkdir(parents=True)
    (wd / "my_data").mkdir()
    (wd / "my_data" / "keep.txt").write_text("precious")
    (wd / "notes.md").write_text("also precious")
    # no _PLAN_VERSION marker → stale → purge runs
    _Stager(spark, str(wd))
    assert not (wd / "01_sign_and_band").exists()
    assert (wd / "my_data" / "keep.txt").read_text() == "precious"
    assert (wd / "notes.md").exists()
    assert (wd / "_PLAN_VERSION").exists()


def test_stage_lineage_from_footers(spark, corpus_df, cfg, tmp_path):
    from dedup_gpu_stream_parallelism_spark.plans.pipeline import (
        run_pipeline,
        stage_lineage,
    )

    wd = str(tmp_path / "wd")
    res = run_pipeline(corpus_df, cfg, id_col="file_id", text_col="content",
                       workdir=wd)
    lin = stage_lineage(wd)
    assert set(lin) == {
        "01_sign_and_band", "02_exact_clusters", "03_candidate_pairs",
        "04_confirmed_pairs", "05_clusters",
    }
    # per-partition rows must sum to the stage's metric row count
    by_stage = {m.stage: m.rows_out for m in res.metrics}
    for stage, parts in lin.items():
        assert sum(p["rows"] for p in parts) == by_stage[stage]
        assert all(p["bytes"] > 0 for p in parts)
