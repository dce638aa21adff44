"""Chunk-level storage contract: encode → decode round-trip, store
uniqueness, strict referential integrity, and plan laziness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op
from dedup_gpu_stream_parallelism_spark.operators import store as store_op


@pytest.fixture(scope="module")
def encoded(spark, corpus_df, cfg):
    manifest, store = store_op.chunk_encode_store(
        corpus_df, cfg, id_col="file_id", text_col="content"
    )
    return manifest.cache(), store.cache()


def test_store_is_unique_per_sha(encoded):
    manifest, store = encoded
    n_store = store.count()
    assert n_store == store.select("chunk_sha").distinct().count()
    assert n_store == manifest.select("chunk_sha").distinct().count()
    # payload length must equal the manifest's recorded chunk_len
    bad = store.where(F.length("payload") != F.col("chunk_len")).count()
    assert bad == 0


def test_decode_rebuilds_exact_text(spark, corpus_df, encoded, corpus):
    manifest, store = encoded
    rows, _ = corpus
    decoded = {
        r["doc_id"]: r["text"]
        for r in store_op.chunk_decode(manifest, store).collect()
    }
    for r in rows:
        if r["content"]:
            assert decoded[r["file_id"]] == r["content"]
        else:
            assert r["file_id"] not in decoded  # zero chunks; left-join adds it


def test_roundtrip_check_all_ok(spark, corpus_df, cfg, corpus):
    rows, _ = corpus
    out = store_op.chunk_roundtrip_check(
        corpus_df, cfg, id_col="file_id", text_col="content"
    )
    got = out.collect()
    assert len(got) == len(rows)
    assert all(r["sha_ok"] == 1 for r in got)
    # empty doc must be present with zero chunks
    empties = {r["file_id"] for r in rows if r["content"] == ""}
    for g in got:
        if g["doc_id"] in empties:
            assert g["n_chunks"] == 0


def test_strict_decode_raises_on_missing_payload(spark, encoded):
    manifest, store = encoded
    # drop the most-referenced sha from the store → decode must hard-fail
    hot = (
        manifest.groupBy("chunk_sha").count().orderBy(F.desc("count")).first()
    )["chunk_sha"]
    broken = store.where(F.col("chunk_sha") != hot)
    with pytest.raises(Exception, match="referential integrity"):
        store_op.chunk_decode(manifest, broken, strict=True).collect()
    # non-strict substitutes '' and survives
    n = store_op.chunk_decode(manifest, broken, strict=False).count()
    assert n > 0


def test_doc_decode_roundtrip_is_lazy(spark, corpus_df):
    """strict=True must not run any job at construction time (the old
    implementation pre-scanned with count())."""
    sc = spark.sparkContext
    manifest, store = exact_op.encode_store(corpus_df, "file_id", "content")
    sc.setJobGroup("lazy-check", "decode_roundtrip construction")
    try:
        df = exact_op.decode_roundtrip(manifest, store, strict=True)
        assert sc.statusTracker().getJobIdsForGroup("lazy-check") == []
    finally:
        sc.setJobGroup("", "")
    assert df.where(F.col("sha_ok") == 1).count() == corpus_df.count()


def test_doc_decode_strict_raises(spark, corpus_df):
    manifest, store = exact_op.encode_store(corpus_df, "file_id", "content")
    some_sha = store.first()["sha256"]
    broken = store.where(F.col("sha256") != some_sha)
    with pytest.raises(Exception, match="referential integrity"):
        exact_op.decode_roundtrip(manifest, broken, strict=True).collect()


def test_chunk_store_stats_consistent(encoded):
    manifest, store = encoded
    row = store_op.chunk_store_stats(manifest, store).first()
    assert row["n_chunk_refs"] >= row["n_unique_chunks"] > 0
    assert row["total_chars"] >= row["stored_chars"] > 0
    assert row["space_saving_factor"] >= 1.0


def test_bucketed_store_join_has_no_exchange(spark, encoded, corpus_df):
    """Bucketed-by-chunk_sha tables must join with NO shuffle on either
    side (the co-located decode path), and decode output must match the
    unbucketed path exactly."""
    manifest, store = encoded
    mt, st = store_op.write_bucketed_store(manifest, store, name_prefix="t_ddp",
                                           n_buckets=4)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at test size the planner would rightly broadcast the store —
        # disable broadcast to expose the big-table plan the bucketing is
        # for: SortMergeJoin over two bucketed scans with NO Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(mt).join(
            spark.table(st).select("chunk_sha", "payload"), "chunk_sha"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)

        decoded_b = {
            r["doc_id"]: r["text"]
            for r in store_op.decode_from_tables(spark, mt, st).collect()
        }
        decoded_u = {
            r["doc_id"]: r["text"]
            for r in store_op.chunk_decode(manifest, store).collect()
        }
        assert decoded_b == decoded_u
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql(f"DROP TABLE IF EXISTS {mt}")
        spark.sql(f"DROP TABLE IF EXISTS {st}")
