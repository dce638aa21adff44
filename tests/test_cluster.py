"""Connected components: shape cases + union-find parity."""

import random

from dedup_gpu_stream_parallelism_spark.operators.cluster import connected_components
from dedup_gpu_stream_parallelism_spark.plans.oracle import clusters as uf_clusters


def _run(spark, n, edges):
    vertices = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    e = spark.createDataFrame(edges or [(0, 0)], ["a_id", "b_id"])
    if not edges:
        e = e.limit(0)
    got = {r.doc_id: r.cluster_id for r in connected_components(vertices, e).collect()}
    want = uf_clusters(list(range(n)), set(edges))
    assert got == want, (got, want)
    return got


def test_no_edges_all_singletons(spark):
    got = _run(spark, 8, [])
    assert all(got[i] == i for i in range(8))


def test_path_graph_single_cluster(spark):
    """Adversarial chain (SURVEY §7.3): long path must converge via
    pointer jumping well inside the iteration bound."""
    n = 40
    got = _run(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert set(got.values()) == {0}


def test_star_and_disjoint_components(spark):
    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12)] + [(20, 21)]
    got = _run(spark, 25, edges)
    assert {got[i] for i in range(6)} == {0}
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == got[21] == 20
    assert got[15] == 15


def test_random_graphs_match_union_find(spark):
    rng = random.Random(11)
    for trial in range(3):
        n = 30
        edges = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(25)
                )
                if a != b
            }
        )
        _run(spark, n, edges)


def test_cc_single_action_per_round(spark, monkeypatch):
    """The convergence check must ride in the round's single materializing
    aggregation (lazy checkpoint + agg), NOT a second count pass per
    iteration (VERDICT r2 #8).  Asserted at the action level: zero
    DataFrame.count calls inside the loop, and at most one first() per
    round (a chain of 16 converges in <= 6 pointer-jumping rounds)."""
    from pyspark.sql import DataFrame

    calls = {"first": 0, "count": 0}
    orig_first, orig_count = DataFrame.first, DataFrame.count
    monkeypatch.setattr(
        DataFrame, "first",
        lambda self: (calls.__setitem__("first", calls["first"] + 1),
                      orig_first(self))[1],
    )
    monkeypatch.setattr(
        DataFrame, "count",
        lambda self: (calls.__setitem__("count", calls["count"] + 1),
                      orig_count(self))[1],
    )
    vertices = spark.createDataFrame([(i,) for i in range(16)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], ["a_id", "b_id"]
    )
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(vertices, edges).collect()
    }
    assert set(got.values()) == {0}
    assert calls["count"] == 0, calls  # no separate changed-count pass
    assert calls["first"] <= 7, calls  # one action per round


def test_distributed_path_equals_driver_path(spark):
    """clusters_from_pairs must give identical clusters whichever CC
    strategy the edge-count threshold selects."""
    from dedup_gpu_stream_parallelism_spark.operators.cluster import clusters_from_pairs

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 5), (5, 9), (9, 13), (20, 21), (21, 22), (30, 31)],
        "a_id long, b_id long",
    )
    fast = {
        (r.doc_id, r.cluster_id)
        for r in clusters_from_pairs(docs, edges, driver_max_edges=10**6).collect()
    }
    dist = {
        (r.doc_id, r.cluster_id)
        for r in clusters_from_pairs(docs, edges, driver_max_edges=0).collect()
    }
    assert fast == dist
    assert (13, 0) in fast and (22, 20) in fast and (31, 30) in fast
