"""Snapshot catalog: immutable snapshots, manifest-level append, time
travel, rollback, crash-safe latest pointer."""

import os

import pytest

from dedup_gpu_stream_parallelism_spark.sources.catalog import SnapshotCatalog


@pytest.fixture()
def cat(tmp_path):
    return SnapshotCatalog(str(tmp_path / "warehouse"))


def test_write_read_roundtrip(spark, cat):
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    s0 = cat.write("t", df)
    assert s0 == 0
    got = cat.read(spark, "t")
    assert got.count() == 10
    assert sorted(got.columns) == ["id", "v"]


def test_append_references_parent_files(spark, cat):
    cat.write("t", spark.range(5).selectExpr("id", "id AS v"))
    s1 = cat.write("t", spark.range(5, 8).selectExpr("id", "id AS v"), mode="append")
    assert cat.read(spark, "t").count() == 8
    m = cat.manifest("t", s1)
    assert len(m["data_paths"]) == 2  # parent's files referenced, not rewritten
    assert m["n_rows"] == 8
    assert m["parent"] == 0


def test_time_travel_and_rollback(spark, cat):
    cat.write("t", spark.range(3).selectExpr("id", "id AS v"))
    cat.write("t", spark.range(100).selectExpr("id", "id AS v"))
    assert cat.read(spark, "t").count() == 100
    assert cat.read(spark, "t", snapshot=0).count() == 3  # time travel
    cat.rollback("t", 0)
    assert cat.read(spark, "t").count() == 3
    assert cat.snapshots("t") == [0, 1]  # history intact


def test_half_written_snapshot_invisible(spark, cat):
    cat.write("t", spark.range(4).selectExpr("id", "id AS v"))
    # simulate a crash mid-write: data dir exists, manifest never committed
    snap_dir = cat._snap_dir("t", 1)
    os.makedirs(os.path.join(snap_dir, "data-dead"), exist_ok=True)
    assert cat.latest("t") == 0
    assert cat.snapshots("t") == [0]
    assert cat.read(spark, "t").count() == 4
    # next write skips over the debris via the _LATEST pointer
    s = cat.write("t", spark.range(2).selectExpr("id", "id AS v"))
    assert s == 1 or s == 2  # id derived from latest committed parent


def test_unknown_table_and_snapshot(spark, cat):
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "missing")
    cat.write("t", spark.range(1).selectExpr("id", "id AS v"))
    with pytest.raises(ValueError):
        cat.rollback("t", 99)
