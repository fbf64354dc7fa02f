"""Connected-components / dedup-cluster operator tests."""

from __future__ import annotations

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
