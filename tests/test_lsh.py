"""LSH banding + candidate generation vs oracle; skew strategies."""

from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.functions.signatures import sign_documents
from dedup_gpu_stream_parallelism_spark.operators import lsh
from dedup_gpu_stream_parallelism_spark.plans import oracle


def _signed(corpus_df, cfg):
    docs = corpus_df.select(
        F.col("file_id").alias("doc_id").cast("bigint"),
        F.col("content").alias("text"),
    )
    return sign_documents(docs, text_col="text", cfg=cfg)


def test_band_buckets_match_oracle(spark, corpus_df, cfg, oracle_results):
    """Band keys are xxhash64 of the band's signature rows, so literal key
    values differ from the oracle's string keys — but the induced BUCKET
    PARTITION per band (which docs collide) must be identical."""
    texts = oracle_results["texts"]
    banded = lsh.band_keys(_signed(corpus_df, cfg), cfg)
    got_buckets = {}
    for r in banded.collect():
        got_buckets.setdefault((r.band, r.band_key), set()).add(r.doc_id)
    want_buckets = {}
    for fid, text in texts.items():
        if len(text) < cfg.shingle_k:
            continue
        for band, key in enumerate(oracle.band_keys(oracle.minhash(text, cfg), cfg)):
            want_buckets.setdefault((band, key), set()).add(fid)
    got = sorted(tuple(sorted(v)) for v in got_buckets.values())
    want = sorted(tuple(sorted(v)) for v in want_buckets.values())
    assert got == want


def test_candidates_match_oracle(spark, corpus_df, cfg, oracle_results):
    banded = lsh.band_keys(_signed(corpus_df, cfg), cfg)
    got = {(r.a_id, r.b_id) for r in lsh.candidate_pairs(banded, cfg).collect()}
    texts = oracle_results["texts"]
    want = oracle.candidate_pairs(texts, cfg)
    assert got == want
    assert all(a < b for a, b in got)


def test_star_strategy_preserves_connectivity(spark, corpus_df, cfg, oracle_results):
    """Star capping must keep every all-pairs bucket member connected
    through the hub (clusters unchanged even when pair lists shrink)."""
    from dedup_gpu_stream_parallelism_spark.plans.oracle import clusters

    banded = lsh.band_keys(_signed(corpus_df, cfg), cfg)
    all_pairs = {(r.a_id, r.b_id) for r in lsh.candidate_pairs(banded, cfg, "all_pairs").collect()}
    star = {(r.a_id, r.b_id) for r in lsh.candidate_pairs(banded, cfg, "star").collect()}
    ids = list(oracle_results["texts"])
    assert clusters(ids, star) == clusters(ids, all_pairs)


def test_bucket_stats_histogram(spark, corpus_df, cfg):
    banded = lsh.band_keys(_signed(corpus_df, cfg), cfg)
    hist = lsh.bucket_stats(banded).collect()
    total_buckets = sum(r.n_buckets for r in hist)
    assert total_buckets > 0
    assert all(r.bucket_n >= 1 for r in hist)


def test_star_caps_hot_bucket_pair_count(spark, cfg):
    """Pathological skew: many docs sharing one boilerplate block must not
    produce quadratic candidates under the star strategy (the 100 TB
    survival property)."""
    from pyspark.sql import functions as F

    import random

    n_hot = 400
    rng = random.Random(3)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    # high-entropy shared block (repetitive text collapses to ~6 distinct
    # shingles and the docs would not actually be similar)
    base = " ".join(rng.choice(words) for _ in range(80))
    rows = [(i, base + f" tail {i}") for i in range(n_hot)]
    rows += [(1000 + i, f"totally different text {i} " * 10) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    banded = lsh.band_keys(_signed_docs(docs, cfg), cfg)
    star_n = lsh.candidate_pairs(banded, cfg, "star").count()
    # quadratic would be ~ 16 bands x C(400,2) ≈ 1.3M before distinct and
    # C(400,2)=79,800 after; star must stay linear-ish:
    # <= bands x (cap^2/2 + n) is the loose bound
    assert star_n <= cfg.lsh_bands * (cfg.max_bucket_size**2 // 2 + n_hot)
    assert star_n < 79_800 // 2
    # connectivity retained: all hot docs in one component
    from dedup_gpu_stream_parallelism_spark.plans.oracle import clusters

    pairs = {(r.a_id, r.b_id) for r in lsh.candidate_pairs(banded, cfg, "star").collect()}
    labels = clusters([r[0] for r in rows], pairs)
    assert len({labels[i] for i in range(n_hot)}) == 1


def _signed_docs(docs, cfg):
    from dedup_gpu_stream_parallelism_spark.functions.signatures import sign_documents

    return sign_documents(docs, text_col="text", cfg=cfg)
