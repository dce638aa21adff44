"""Exact dedup (sha256 groupBy) vs brute-force truth."""

import hashlib
from collections import defaultdict

from dedup_gpu_stream_parallelism_spark.operators import exact


def _brute_clusters(rows):
    by_content = defaultdict(list)
    for r in rows:
        by_content[r["content"]].append(r["file_id"])
    out = {}
    for ids in by_content.values():
        rep = min(ids)
        for i in ids:
            out[i] = rep
    return out


def test_exact_clusters_match_bruteforce(spark, corpus_df, corpus):
    rows, _ = corpus
    got = {
        r.doc_id: r.cluster_id
        for r in exact.exact_dup_clusters(corpus_df, "file_id", "content").collect()
    }
    assert got == _brute_clusters(rows)


def test_sha256_invariant(spark, corpus_df, corpus):
    """Per-row invariant (BASELINE.json): pipeline sha256 == hashlib sha256."""
    rows, _ = corpus
    truth = {r["file_id"]: hashlib.sha256(r["content"].encode()).hexdigest() for r in rows}
    got = {
        r.doc_id: r.sha256
        for r in exact.exact_dup_clusters(corpus_df, "file_id", "content").collect()
    }
    assert got == truth


def test_manifest_duplicates_carry_no_payload(spark, corpus_df):
    m = exact.dedup_manifest(corpus_df, "file_id", "content").collect()
    for r in m:
        if r.is_duplicate:
            assert r.payload_chars == 0
            assert r.representative_id < r.doc_id
        else:
            assert r.representative_id == r.doc_id


def test_dedup_stats(spark, corpus_df, corpus):
    rows, _ = corpus
    s = exact.dedup_stats(corpus_df, "file_id", "content").collect()[0]
    assert s.n_rows == len(rows)
    assert s.n_unique == len({r["content"] for r in rows})
    assert s.n_duplicates == s.n_rows - s.n_unique


def test_encode_decode_roundtrip(spark, corpus_df):
    """Encode to (manifest, unique store), decode, verify every payload —
    the reference's dedup -u oracle (decoder.cpp:200-291)."""
    from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op
    from pyspark.sql import functions as F

    docs = corpus_df.select(
        F.col("file_id").alias("doc_id"), F.col("content").alias("text")
    )
    manifest, store = exact_op.encode_store(docs)
    # store holds each payload exactly once
    assert store.count() == store.select("sha256").distinct().count()
    rebuilt = exact_op.decode_roundtrip(manifest, store)
    assert rebuilt.count() == docs.count()
    assert rebuilt.where("sha_ok <> 1").count() == 0
    # rebuilt text equals the original text for every doc
    joined = rebuilt.join(docs, "doc_id")
    assert joined.where(F.col("payload") != F.col("text")).count() == 0


def test_decode_strict_fails_on_missing_representative(spark, corpus_df):
    import pytest
    from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op
    from pyspark.sql import functions as F

    docs = corpus_df.select(
        F.col("file_id").alias("doc_id"), F.col("content").alias("text")
    )
    manifest, store = exact_op.encode_store(docs)
    broken = store.limit(0)  # empty store: every row missing
    # strict mode is lazy: construction runs no job; the per-record
    # raise_error fires executor-side during the decode action
    df = exact_op.decode_roundtrip(manifest, broken)
    with pytest.raises(Exception, match="referential integrity"):
        df.collect()
