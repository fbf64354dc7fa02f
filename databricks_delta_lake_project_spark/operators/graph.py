"""Connected components over a pair/edge list — the step that turns
near-duplicate PAIRS (MinHash/SimHash/Jaccard/cosine, q30-q32/q41)
into duplicate CLUSTERS with one canonical representative per cluster
(beyond-reference training-data surface: dedup at 100 TB keeps one
doc per component, not one per pair).

Algorithm: min-label propagation to fixpoint. Each node starts
labeled with itself; every iteration each node takes the minimum
label among itself and its neighbors; convergence when no label
changes. Iterations ~ graph diameter — near-dup graphs are
overwhelmingly tiny stars/cliques, so 3-5 rounds close them.

Scale design:

* Everything is DataFrame joins + groupBy-min — shuffles partition on
  the node id, no driver-side graph materialization.
* ``localCheckpoint`` every iteration truncates the lineage: without
  it the plan doubles per round and Catalyst analysis time explodes
  by iteration ~10 (the classic iterative-Spark failure mode).
* The convergence check is one tiny count per round on the changed
  set (an aggregate over the already-shuffled join output).
* For adversarial long-chain graphs, swap in the large-star/small-star
  variant (same join primitives, O(log n) rounds) — not needed for
  dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it
    (deterministic component id). ``nodes`` optionally supplies
    isolated vertices (they keep their own id as the label).

    Returns (node, component).
    """
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    und = und.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()

    # iterate over edge-touched nodes ONLY: isolated vertices can never
    # change label, so they skip the propagation loop entirely and
    # rejoin at the end. In a dedup graph the edge set is a tiny
    # fraction of the corpus — every per-round join/groupBy scales
    # with duplicate-cluster membership, not corpus size.
    labels = und.select(F.col("a").alias("node")).distinct()
    labels = labels.select("node", F.col("node").alias("component"))
    labels = labels.localCheckpoint()

    # intermediate checkpoint blocks pin executor storage memory; track
    # and release them so a long-lived session doesn't pay for this
    # operator on every later query (measured: leaving them cached
    # slowed the whole downstream bench by ~30%)
    retired = [und]
    checkpointed = labels
    for _ in range(max_iter):
        # neighbor labels: for edge (a,b), b's current label reaches a
        msgs = und.join(
            labels.select(
                F.col("node").alias("b"), F.col("component").alias("nbr_label")
            ),
            "b",
        ).select(F.col("a").alias("node"), "nbr_label")
        new_labels = (
            labels.join(msgs, "node", "left")
            .groupBy("node")
            .agg(
                F.least(
                    F.first("component"), F.min("nbr_label")
                ).alias("component"),
                F.first("component").alias("_old"),
            )
        ).localCheckpoint()
        changed = new_labels.filter(F.col("component") < F.col("_old")).count()
        retired.append(checkpointed)
        checkpointed = new_labels
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    # isolated vertices (never in an edge) label themselves
    if nodes is not None:
        edge_nodes = labels.select("node")
        isolated = (
            nodes.select(F.col(node_col).alias("node"))
            .join(edge_nodes, "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        labels = labels.union(isolated)
    # materialize the final labeling, then free every precursor block
    final = labels.localCheckpoint()
    retired.append(checkpointed)
    for df in retired:
        df.unpersist()
    return final


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Assign every document a duplicate-cluster id (the minimum doc_id
    of its component; singletons cluster with themselves) and flag the
    canonical representative. The downstream dedup is then a single
    ``filter(is_canonical)`` — exactly-one-survivor semantics.
    """
    comp = connected_components(
        pairs,
        src=id_a,
        dst=id_b,
        nodes=docs.select(F.col(doc_id).alias("node")),
    )
    return docs.join(
        comp.select(
            F.col("node").alias(doc_id), F.col("component").alias("cluster_id")
        ),
        doc_id,
    ).withColumn("is_canonical", F.col(doc_id) == F.col("cluster_id"))
