"""Multimodal plumbing: binary columns, Arrow-batched feature extraction,
payload dedup, frame sampling.  The decode kernel is the deterministic
fake; strict mode must refuse to run without a real codec."""

import pytest
from pyspark.sql import functions as F

from dedup_gpu_stream_parallelism_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, n=60, seed=42)
    # plant exact duplicates: same payload under new ids
    dups = df.where("media_id < 6").select(
        (F.col("media_id") + 1000).alias("media_id"),
        "media_type", "payload", "width", "height", "sample_rate", "n_frames",
    )
    return df.unionByName(dups).cache()


def test_strict_mode_refuses_without_codec(spark, media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, strict=True)


def test_features_shape_and_determinism(spark, media):
    f1 = mm.extract_features(media).orderBy("media_id").collect()
    f2 = mm.extract_features(media).orderBy("media_id").collect()
    assert len(f1) == media.count()
    for a, b in zip(f1, f2):
        assert a.payload_sha == b.payload_sha
        assert a.feature == b.feature  # deterministic decode
        assert len(a.feature) == mm.FEATURE_DIM
        assert a.payload_len > 0


def test_identical_payloads_identical_features(spark, media):
    rows = mm.extract_features(media).collect()
    by_sha = {}
    for r in rows:
        by_sha.setdefault(r.payload_sha, []).append(tuple(r.feature))
    planted = [v for v in by_sha.values() if len(v) > 1]
    assert len(planted) >= 6  # the planted duplicates
    for feats in planted:
        assert len(set(feats)) == 1


def test_media_dedup_first_wins(spark, media):
    dd = mm.media_dedup(mm.extract_features(media))
    dups = dd.where("is_duplicate = 1").collect()
    assert {r.media_id for r in dups} == {1000 + i for i in range(6)}
    for r in dups:
        assert r.representative_id == r.media_id - 1000


def test_frame_sample_plan(spark, media):
    plan = mm.frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r.frame_idx % 10 == 0 for r in rows)
    vids = media.where("media_type = 'video'").select("media_id", "n_frames").collect()
    want = {v.media_id: (v.n_frames + 9) // 10 for v in vids}
    got = {}
    for r in rows:
        got[r.media_id] = got.get(r.media_id, 0) + 1
    assert got == want
