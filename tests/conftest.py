"""Shared fixtures: one SparkSession, one deterministic corpus, cached oracle."""

from __future__ import annotations

import pytest

from dedup_gpu_stream_parallelism_spark.config import DedupConfig
from dedup_gpu_stream_parallelism_spark.plans import oracle
from dedup_gpu_stream_parallelism_spark.session import build_session
from dedup_gpu_stream_parallelism_spark.sources.corpus import generate_corpus

CORPUS_N = 150


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="dedup-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    return DedupConfig()


@pytest.fixture(scope="session")
def corpus():
    rows, truth = generate_corpus(CORPUS_N, seed=42)
    return rows, truth


@pytest.fixture(scope="session")
def corpus_df(spark, corpus):
    rows, _ = corpus
    return spark.createDataFrame(rows).repartition(8).cache()


@pytest.fixture(scope="session")
def oracle_results(corpus, cfg):
    """Pure-python oracle outputs at the pinned config (computed once)."""
    rows, _ = corpus
    texts = {r["file_id"]: r["content"] for r in rows}
    cand = oracle.candidate_pairs(texts, cfg) | oracle.chunk_candidate_pairs(texts)
    conf = oracle.confirmed_pairs(texts, cfg, cand)
    clus = oracle.clusters(list(texts), conf | oracle.exact_pairs(texts))
    return {"texts": texts, "candidates": cand, "confirmed": conf, "clusters": clus}
