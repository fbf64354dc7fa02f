"""Connected-components / dedup-cluster operator tests."""

from __future__ import annotations

import pytest

from databricks_delta_lake_project_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    # pair {10,11}, isolated node 20
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "node long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_dedup_clusters_canonical_survivor(spark):
    pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(3,), (5,), (9,), (7,)], "doc_id long"
    )
    rows = dedup_clusters(pairs, docs).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert all(by_id[i]["cluster_id"] == 3 for i in (3, 5, 9))
    assert by_id[7]["cluster_id"] == 7
    canon = sorted(r["doc_id"] for r in rows if r["is_canonical"])
    assert canon == [3, 7]  # exactly one survivor per cluster


def test_dedup_clusters_single_left_join_plan(spark):
    """dedup_clusters labels isolated docs via coalesce in ONE left
    join against the (broadcast-hinted, bounded) local label frame —
    no anti-join, no union, one docs-side scan (guide §2.4). Pinned on
    the physical plan."""
    pairs = spark.createDataFrame([(5, 3), (3, 9)], "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    out = dedup_clusters(pairs, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan and "Union" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 1, plan
    assert "SortMergeJoin" not in plan, plan


def test_dedup_clusters_drops_null_doc_ids(spark):
    """A NULL doc_id never matched the pre-r14 inner join; the left
    join must not resurrect it as a NULL-labeled row."""
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(1,), (2,), (None,)], "doc_id long"
    )
    rows = dedup_clusters(pairs, docs).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]


@pytest.mark.slow
def test_star_matches_label_on_random_graph(spark):
    """large-star/small-star and label propagation must agree exactly
    on an arbitrary mixed graph (chains, a clique, pairs, isolates)."""
    import random

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 40)]               # chain
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a)]  # clique
    edges += [(rng.randrange(200, 260), rng.randrange(200, 260)) for _ in range(80)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame(
        [(i,) for i in range(0, 300)], "node long"
    )
    lab = {
        r["node"]: r["component"]
        for r in connected_components(
            e, nodes=nodes, max_iter=60, local_edge_threshold=0
        ).collect()
    }
    star = {
        r["node"]: r["component"]
        for r in connected_components(
            e, nodes=nodes, algorithm="star", max_iter=60,
            local_edge_threshold=0,
        ).collect()
    }
    assert star == lab


@pytest.mark.slow
def test_star_converges_logarithmically_on_long_chain(spark):
    """A 10k-node chain (diameter 10k) must close in ~log2(n) rounds —
    the whole point of the star variant; label propagation would need
    10k rounds."""
    import math

    n = 10_000
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    ).repartition(8)
    stats: dict = {}
    comp = connected_components(
        e, algorithm="star", max_iter=40, stats=stats,
        local_edge_threshold=0,
    )
    assert stats["rounds"] <= math.ceil(math.log2(n)) + 5, stats
    rows = comp.collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_convergence_surfaced_in_stats(spark):
    """Both variants report convergence; max_iter exhaustion is visible
    as converged=False instead of silently returning partial labels."""
    from databricks_delta_lake_project_spark.operators.graph import (
        connected_components,
    )

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(49)], "src long, dst long"
    )
    ok: dict = {}
    connected_components(
        e, algorithm="star", max_iter=40, stats=ok, local_edge_threshold=0
    ).collect()
    assert ok["converged"] is True
    short: dict = {}
    connected_components(
        e, max_iter=2, stats=short, local_edge_threshold=0
    ).collect()
    assert short["converged"] is False


def test_stats_cut_falls_back_when_internal_api_gone(spark, monkeypatch):
    """The stats-cut rides a PRIVATE Spark API: when it disappears
    (simulated), iterative operators stay CORRECT on the plain
    checkpoint and warn loudly ONCE naming the degradation — an
    upgrade must be diagnosable, never a silent slowdown."""
    import warnings as _w

    from databricks_delta_lake_project_spark.operators import graph

    monkeypatch.setattr(
        graph,
        "_rewrap_without_stats",
        lambda *_: (_ for _ in ()).throw(
            AttributeError("internalCreateDataFrame gone")
        ),
    )
    monkeypatch.setattr(graph, "_STATS_CUT_LOST", False)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "src long, dst long"
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        out = connected_components(edges, local_edge_threshold=0).collect()
    got = {(r["node"], r["component"]) for r in out}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
    hits = [
        w for w in caught if "internalCreateDataFrame" in str(w.message)
    ]
    assert len(hits) == 1  # loud, and exactly once per process


def test_local_short_circuit_matches_distributed(spark):
    """The small-graph driver-side union-find (r14) must produce the
    exact labeling of the distributed loop on a mixed random graph —
    chains, a clique, random noise, isolates — and report itself in
    stats without consuming a round."""
    import random

    rng = random.Random(13)
    edges = [(i, i + 1) for i in range(30)]                     # chain
    edges += [(500 + a, 500 + b) for a in range(5) for b in range(a)]
    edges += [
        (rng.randrange(600, 680), rng.randrange(600, 680)) for _ in range(60)
    ]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(0, 700)], "node long")
    st_local: dict = {}
    local = {
        r["node"]: r["component"]
        for r in connected_components(e, nodes=nodes, stats=st_local).collect()
    }
    assert st_local == {"rounds": 0, "converged": True, "local": True}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(
            e, nodes=nodes, max_iter=60, local_edge_threshold=0
        ).collect()
    }
    assert local == dist


def test_local_gate_falls_back_above_threshold(spark):
    """An edge set larger than the threshold must take the distributed
    loop (the probe is a completeness check, never a truncation)."""
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    st: dict = {}
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            e, stats=st, local_edge_threshold=3
        ).collect()
    }
    assert st.get("local") is None and st["rounds"] >= 1
    assert got == {i: 0 for i in range(11)}
