"""BinaryType ingestion: the signature/chunk kernels over bytes columns.

For ASCII content, byte values == codepoints, so signatures over
encode(text) must be bit-identical to signatures over text; arbitrary
non-UTF-8 bytes must flow through without decoding."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.functions.signatures import sign_documents
from dedup_gpu_stream_parallelism_spark.operators import chunk as chunk_op
from dedup_gpu_stream_parallelism_spark.operators import exact as exact_op


@pytest.fixture(scope="module")
def bin_docs(spark, corpus_df):
    return corpus_df.select(
        F.col("file_id").alias("doc_id"),
        F.col("content").alias("text"),
        F.encode("content", "utf-8").alias("data"),
    ).cache()


def test_binary_signatures_match_text_signatures(spark, bin_docs, cfg):
    as_text = (
        sign_documents(bin_docs.select("doc_id", "text"), "text", cfg)
        .select("doc_id", "sha256", "minhash", "simhash")
        .orderBy("doc_id")
        .collect()
    )
    as_bytes = (
        sign_documents(bin_docs.select("doc_id", "data"), "data", cfg)
        .select("doc_id", "sha256", "minhash", "simhash")
        .orderBy("doc_id")
        .collect()
    )
    assert len(as_text) == len(as_bytes)
    for t, b in zip(as_text, as_bytes):
        assert (t.doc_id, t.sha256, t.simhash) == (b.doc_id, b.sha256, b.simhash)
        assert t.minhash == b.minhash


def test_binary_chunks_match_text_chunks(spark, bin_docs, cfg):
    t_rows = (
        chunk_op.chunk_documents(bin_docs, cfg, "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    b_rows = (
        chunk_op.chunk_documents(bin_docs, cfg, "doc_id", "data")
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    assert [tuple(r) for r in t_rows] == [tuple(r) for r in b_rows]


def test_non_utf8_bytes_flow_through(spark, cfg):
    """Arbitrary byte payloads (invalid UTF-8 included) must hash, chunk
    and dedup without decoding."""
    rng = random.Random(99)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 600)))
             for _ in range(40)]
    blobs += blobs[:10]  # plant exact duplicates
    rows = [(i, b) for i, b in enumerate(blobs)]
    df = spark.createDataFrame(rows, "doc_id bigint, data binary")

    signed = sign_documents(df, "data", cfg).collect()
    assert len(signed) == len(blobs)
    import hashlib

    want = {i: hashlib.sha256(b).hexdigest() for i, b in enumerate(blobs)}
    for r in signed:
        assert r.sha256 == want[r.doc_id]

    stats = exact_op.dedup_stats(df, "doc_id", "data").first()
    assert stats.n_rows == 50
    assert stats.n_duplicates >= 10

    chunks = chunk_op.chunk_documents(df, cfg, "doc_id", "data",
                                      with_payload=True).collect()
    rebuilt: dict[int, list] = {}
    for c in chunks:
        rebuilt.setdefault(c.doc_id, []).append((c.chunk_idx, bytes(c.chunk_text)))
    for i, b in enumerate(blobs):
        if b:
            got = b"".join(p for _, p in sorted(rebuilt[i]))
            assert got == b


def test_binary_chunk_store_roundtrip(spark, cfg):
    """The full chunk-store round-trip over BinaryType payloads: encode to a
    binary chunk store, decode via the binary aggregate+concat branch, and
    re-verify sha256 per doc in-engine (no Python-side reassembly)."""
    from dedup_gpu_stream_parallelism_spark.operators import store as store_op

    rng = random.Random(7)
    blobs = [bytes(rng.randrange(256) for _ in range(rng.randint(0, 800)))
             for _ in range(30)]
    blobs += blobs[:8]  # duplicates share store payloads
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(blobs)], "doc_id bigint, data binary"
    )
    out = store_op.chunk_roundtrip_check(df, cfg, "doc_id", "data").collect()
    assert len(out) == len(blobs)
    assert all(r.sha_ok == 1 for r in out)
    store_op.release_chunk_cache()
