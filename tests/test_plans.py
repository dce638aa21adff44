"""Plan-regression guards: lock in the physical-plan properties the scale
design depends on (pushdown, pruning, no self-join pair expansion, no
driver collect in the blocked kernels).  A refactor that silently
reintroduces a scale-killer fails here, not at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.config import DedupConfig
from dedup_gpu_stream_parallelism_spark.functions.signatures import sign_documents
from dedup_gpu_stream_parallelism_spark.operators import lsh as lsh_op
from dedup_gpu_stream_parallelism_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_candidate_pair_expansion_is_not_a_self_join(spark, corpus_df, cfg):
    """Pair expansion must stay JVM array expressions after the band-key
    aggregation — never a bucket self-join (quadratic shuffle)."""
    docs = corpus_df.select(
        F.col("file_id").alias("doc_id"), F.col("content")
    )
    signed = sign_documents(docs, "content", cfg, with_chunk_keys=True)
    keys = lsh_op.all_candidate_keys(signed, cfg)
    plan = _plan(lsh_op.candidate_pairs(keys, cfg, strategy="star"))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "Generate explode" in plan  # array-expression pair expansion


def test_salted_aggregation_matches_unsalted(spark, corpus_df, cfg):
    """Hot-key salting (two-phase collect_set) must be result-identical."""
    signed = sign_documents(
        corpus_df.select(F.col("file_id").alias("doc_id"), "content"),
        "content",
        cfg,
    )
    banded = lsh_op.band_keys(signed, cfg)
    salted = {
        (r.a_id, r.b_id)
        for r in lsh_op.candidate_pairs(banded, cfg, salt_buckets=16).collect()
    }
    unsalted = {
        (r.a_id, r.b_id)
        for r in lsh_op.candidate_pairs(banded, cfg, salt_buckets=1).collect()
    }
    assert salted == unsalted and len(salted) > 0


def test_tpch_filter_and_projection_reach_the_scan(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["tpch_pricing_summary"](spark, SF))
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    # projection pruned: the scan must not read unused lineitem columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read and "l_shipdate" not in read


def test_text_stats_scan_prunes_columns(spark):
    import __spark_entry__ as e

    plan = _plan(e.queries()["text_stats"](spark, SF))
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "doc_id" in read and "text" in read
    assert "lang" not in read and "source" not in read


def test_blocked_embedding_kernels_are_cogrouped(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pairs_plan = _plan(sim.cosine_near_dup_pairs(emb, 0.4, strategy="blocked"))
    assert "FlatMapCoGroupsInPandas" in pairs_plan
    topk_plan = _plan(sim.cosine_topk(emb, k=3, strategy="blocked"))
    assert "FlatMapCoGroupsInPandas" in topk_plan


def test_driver_cosine_topk_runs_the_blocked_kernel(spark):
    """The shipping cosine_topk query must execute the cogrouped block-
    matrix GEMM — not the driver-collect broadcast path (whose plan is a
    bare MapInPandas over the scan with no cogroup)."""
    import __spark_entry__ as e

    plan = _plan(e.queries()["cosine_topk"](spark, SF))
    assert "FlatMapCoGroupsInPandas" in plan


def test_cosine_topk_auto_switches_on_index_size(spark, monkeypatch):
    """strategy='auto' picks broadcast under the cap, blocked above it."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    monkeypatch.setattr(sim, "BROADCAST_MAX_ROWS", 10)
    plan_big = _plan(sim.cosine_topk(emb, k=3, strategy="auto"))
    assert "FlatMapCoGroupsInPandas" in plan_big
    monkeypatch.setattr(sim, "BROADCAST_MAX_ROWS", 10_000_000)
    plan_small = _plan(sim.cosine_topk(emb, k=3, strategy="auto"))
    assert "FlatMapCoGroupsInPandas" not in plan_small


def test_signature_fanout_queries_evaluate_the_udf_once(spark):
    """minhash_jaccard_estimate / simhash_near_dup fan three join branches
    off the signed frame; the pre-fan-out checkpoint must keep the
    signature UDF out of the final plan entirely (round-5 verdict #1: the
    un-checkpointed plan executed the MapInPandas once per branch)."""
    import __spark_entry__ as e

    for name in ("minhash_jaccard_estimate", "simhash_near_dup"):
        plan = _plan(e.queries()[name](spark, SF))
        assert "MapInPandas" not in plan, name
