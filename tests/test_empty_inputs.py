"""Every driver query must run (possibly to 0 rows) on EMPTY input tables —
0-row sources are routine at 100 TB (empty partitions, fresh datasets) and
must not crash the engine."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, f"{t}.parquet")
        )
    return base


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_survives_empty_tables(spark, empty_sf_dir, name):
    df = entry_mod.queries()[name](spark, empty_sf_dir)
    assert df.count() >= 0
