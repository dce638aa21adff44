"""Content-defined chunking: engine (numpy/Spark) vs oracle, invariants."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dedup_gpu_stream_parallelism_spark.operators import chunk as chunk_op
from dedup_gpu_stream_parallelism_spark.plans import oracle

ascii_text = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=2000)


@given(ascii_text)
@settings(max_examples=40, deadline=None)
def test_spans_cover_text_exactly(text):
    spans = chunk_op.chunk_spans(text)
    rebuilt = "".join(text[s:e] for s, e in spans)
    assert rebuilt == text
    assert all(e > s for s, e in spans)


@given(ascii_text)
@settings(max_examples=40, deadline=None)
def test_chunks_match_oracle(text):
    eng = [text[s:e] for s, e in chunk_op.chunk_spans(text)]
    assert eng == oracle.cdc_chunks(text)


def test_chunking_is_content_defined():
    """A prefix edit must not change chunk boundaries far downstream —
    the defining property of Rabin segmentation (rabinseg,
    /root/reference/src/rabin.cpp:72-100)."""
    import random

    rng = random.Random(7)
    body = "".join(rng.choice("abcdefgh \n") for _ in range(4000))
    a = "PREFIX-ONE " + body
    b = "completely different and longer prefix " + body
    chunks_a = set(oracle.cdc_chunks(a)[1:])  # drop the edited first chunk
    chunks_b = set(oracle.cdc_chunks(b)[1:])
    assert len(chunks_a & chunks_b) >= max(1, len(chunks_a) - 2)


def test_chunk_documents_spark(spark, corpus_df, cfg):
    chunks = chunk_op.chunk_documents(corpus_df, cfg, id_col="file_id", text_col="content")
    pdf = chunks.toPandas()
    rows = {r["file_id"]: r["content"] for r in corpus_df.collect()}
    # per-doc reconstruction for a sample
    for fid in list(rows)[:20]:
        sub = pdf[pdf.doc_id == fid].sort_values("chunk_idx")
        text = rows[fid]
        assert sub.chunk_len.sum() == len(text)
        want = oracle.cdc_chunks(text)
        assert len(sub) == len(want)


def test_chunk_candidates_find_shared_substring(spark, corpus_df, cfg, corpus, oracle_results):
    chunks = chunk_op.chunk_documents(corpus_df, cfg, id_col="file_id", text_col="content")
    pairs = chunk_op.chunk_candidate_pairs(chunks, cfg)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    rows, _ = corpus
    texts = oracle_results["texts"]
    want = oracle.chunk_candidate_pairs(texts)
    assert got == want


def test_chunk_stats(spark, corpus_df, cfg):
    chunks = chunk_op.chunk_documents(corpus_df, cfg, id_col="file_id", text_col="content")
    row = chunk_op.chunk_dedup_stats(chunks).collect()[0]
    assert row.n_chunks >= row.n_unique_chunks > 0
    assert row.chunk_dedup_factor >= 1.0
