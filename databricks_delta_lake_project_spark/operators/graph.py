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
* For adversarial long-chain graphs, ``algorithm="star"`` runs the
  alternating large-star/small-star variant (Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14): the same
  join + groupBy-min primitives, but each round contracts path length
  multiplicatively, so a diameter-d graph closes in O(log d) rounds
  instead of d — a 10k-node chain converges in ~⌈log2 n⌉ rounds where
  label propagation would need 10k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cut(df: DataFrame, eager: bool = False) -> tuple[DataFrame, DataFrame]:
    """Materialize ``df`` and CUT both lineage and cost statistics.

    ``localCheckpoint()`` alone is not enough for iterative algorithms:
    the resulting ``LogicalRDD`` carries the origin plan's Catalyst
    statistics across the checkpoint, so each round's join/aggregate
    *multiplies* the inherited ``sizeInBytes`` — the estimate's
    BigInteger doubles in digit count per round (measured: 134 digits
    at round 2 → 2,419 at round 6 → ~10^6 by round 20), and the
    optimizer ends up spending minutes in BigInteger.multiply. Round
    time degrades from ~0.4 s to >100 s by round ~20 on a long-chain
    graph.

    The cut rewraps the checkpointed RDD in a fresh ``LogicalRDD``
    with no origin stats (falling back to the constant
    ``spark.sql.defaultSizeInBytes``), which keeps every round's
    estimate O(1)-sized. Returns ``(fresh_df, checkpoint_handle)`` —
    the handle owns the cached blocks; ``unpersist()`` it once the
    NEXT round's checkpoint has materialized, not before (the fresh
    frame reads those blocks).

    The checkpoint is LAZY by default (``eager=False``): every loop
    ``_cut`` is followed in the same round by a small driver-collected
    action on the fresh frame (the convergence count / checksum),
    which materializes the blocks then — one Spark job per round
    instead of two (checkpoint job + count job). Later consumers read
    the cached blocks exactly as with an eager checkpoint. Pass
    ``eager=True`` for a frame whose FIRST action may run only after
    some parent checkpoint has been unpersisted (the star variant's
    ``all_nodes``): a lazy cut there would need the parent's blocks at
    materialization time, after lineage truncation already discarded
    the way to rebuild them.
    """
    ck = df.localCheckpoint(eager=eager)
    spark = df.sparkSession
    try:
        return _rewrap_without_stats(spark, ck), ck
    except Exception as e:  # noqa: BLE001
        # the rewrap rides a PRIVATE Spark API (stable across 3.x-4.x
        # but unversioned): if an upgrade removes or reshapes it, stay
        # CORRECT on the plain checkpoint — the stats cut is purely a
        # performance device — and say loudly, once, what was lost and
        # where to fix it, so the degradation is upgrade-diagnosable
        # instead of a silent slowdown.
        global _STATS_CUT_LOST
        if not _STATS_CUT_LOST:
            _STATS_CUT_LOST = True
            import warnings

            warnings.warn(
                "graph._cut: internalCreateDataFrame is unavailable "
                f"in this Spark build ({e!r}); iterative operators "
                "fall back to plain localCheckpoint() — correct, but "
                "Catalyst statistics survive the checkpoint and long "
                "iterations slow down (see _cut's docstring). Update "
                "_rewrap_without_stats for this Spark version.",
                stacklevel=2,
            )
        return ck, ck


# process-wide once-flag for the loud stats-cut degradation warning
_STATS_CUT_LOST = False


def _rewrap_without_stats(spark, ck: DataFrame) -> DataFrame:
    """Rewrap a checkpointed frame's RDD in a fresh ``LogicalRDD``
    with no origin statistics. Isolated so ``_cut`` can capability-
    check it (and tests can simulate its absence): it calls the
    private ``SparkSession.internalCreateDataFrame`` JVM method, the
    one Spark-internal API this engine touches."""
    jdf = ck._jdf
    fresh = spark._jsparkSession.internalCreateDataFrame(
        jdf.queryExecution().toRdd(), jdf.schema(), False
    )
    return ck.__class__(fresh, spark)


def _local_components(edge_rows) -> dict:
    """Min-union-find over an in-driver edge list: every union hangs
    the larger root under the smaller, so each tree's root is the
    component MINIMUM — the exact labeling the distributed loop
    converges to. Path compression keeps it near-linear."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    seen = set()
    for a, b in edge_rows:
        seen.add(a)
        seen.add(b)
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
    return {n: find(n) for n in seen}


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 25,
    algorithm: str = "label",
    stats: dict | None = None,
    local_edge_threshold: int | None = None,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it
    (deterministic component id). ``nodes`` optionally supplies
    isolated vertices (they keep their own id as the label).

    ``algorithm``: ``"label"`` (min-label propagation, rounds ~
    diameter, best for star/clique dedup graphs) or ``"star"``
    (large-star/small-star, rounds ~ log diameter, best for long
    chains). ``stats``, if given, receives ``{"rounds": n}``.

    Small graphs short-circuit the iterative loop entirely: a near-dup
    edge set after thresholding is usually a tiny fraction of the
    corpus (the sf0.1 Jaccard graph is FOUR edges), yet every
    distributed round costs a fixed join+groupBy+count of Spark jobs —
    ~20 jobs to close a 4-edge graph. A bounded
    ``limit(threshold+1).collect()`` probe (a few MB at the default
    100k edges — less than a routine broadcast, so no driver-memory
    concern) detects this: when the DISTINCT edge set fits, components
    come from an in-driver min-union-find (identical labels by
    construction) and the loop never runs; when the probe hits the
    limit, the distributed algorithms run unchanged — the 100 TB path
    is untouched. Threshold: ``local_edge_threshold`` arg, else
    ``$SPARK_GRAFT_CC_LOCAL_EDGES`` (default 100000); 0 disables the
    short-circuit.

    Returns (node, component).
    """
    import os

    if local_edge_threshold is None:
        local_edge_threshold = int(
            os.environ.get("SPARK_GRAFT_CC_LOCAL_EDGES", "100000")
        )
    if local_edge_threshold > 0:
        canon = (
            edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
            .filter(F.col(src) != F.col(dst))
            .select(
                F.greatest("x", "y").alias("hi"),
                F.least("x", "y").alias("lo"),
            )
            .distinct()
        )
        probe = canon.limit(local_edge_threshold + 1).collect()
        if len(probe) <= local_edge_threshold:
            comp = _local_components((r["hi"], r["lo"]) for r in probe)
            if stats is not None:
                stats["rounds"] = 0
                stats["converged"] = True
                stats["local"] = True
            spark = edges.sparkSession
            from pyspark.sql.types import StructField, StructType

            id_type = canon.schema["hi"].dataType
            schema = StructType(
                [
                    StructField("node", id_type),
                    StructField("component", id_type),
                ]
            )
            labels = spark.createDataFrame(
                sorted(comp.items()), schema
            )
            # parallelized local rows carry no size estimate, so a
            # caller joining this frame would get a sort-merge join;
            # the label set is bounded by 2x the edge threshold (a few
            # MB of longs at the default), so the broadcast hint is
            # provably safe and keeps the caller's big side
            # shuffle-free (guide §3.1: estimates are often wrong —
            # hint when you know). GATED on the MEASURED edge count
            # (len(probe), already in hand), not the configured
            # threshold: a huge env override must not force-broadcast
            # an unboundedly large label frame, but it must also not
            # drop the hint for the tiny graphs the short-circuit
            # exists for. Past ~1M actual edges (2M label rows, tens
            # of MB built) the frame is returned unhinted and the
            # planner decides.
            _BROADCAST_HINT_MAX_EDGES = 1_000_000
            hint = (
                F.broadcast
                if len(probe) <= _BROADCAST_HINT_MAX_EDGES
                else (lambda df: df)
            )
            if nodes is None:
                return hint(labels)
            isolated = (
                nodes.select(F.col(node_col).alias("node"))
                .join(
                    hint(labels.select("node")),
                    "node",
                    "left_anti",
                )
                .select("node", F.col("node").alias("component"))
            )
            return labels.union(isolated)
    if algorithm == "star":
        return _connected_components_star(
            edges, src, dst, nodes, node_col, max_iter, stats
        )
    if algorithm != "label":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    und, und_ck = _cut(und.filter(F.col("a") != F.col("b")).distinct())

    # iterate over edge-touched nodes ONLY: isolated vertices can never
    # change label, so they skip the propagation loop entirely and
    # rejoin at the end. In a dedup graph the edge set is a tiny
    # fraction of the corpus — every per-round join/groupBy scales
    # with duplicate-cluster membership, not corpus size.
    labels = und.select(F.col("a").alias("node")).distinct()
    labels, checkpointed = _cut(
        labels.select("node", F.col("node").alias("component"))
    )

    # a superseded round's checkpoint blocks are dead the moment the
    # next round's checkpoint has materialized — release them EAGERLY
    # so executor storage memory stays O(1) across rounds (leaving
    # blocks cached after return also slowed the downstream bench
    # ~30%).
    rounds = 0
    changed = 0
    for _ in range(max_iter):
        rounds += 1
        # neighbor labels: for edge (a,b), b's current label reaches a
        msgs = und.join(
            labels.select(
                F.col("node").alias("b"), F.col("component").alias("nbr_label")
            ),
            "b",
        ).select(F.col("a").alias("node"), "nbr_label")
        new_labels, new_ck = _cut(
            labels.join(msgs, "node", "left")
            .groupBy("node")
            .agg(
                F.least(
                    F.first("component"), F.min("nbr_label")
                ).alias("component"),
                F.first("component").alias("_old"),
            )
        )
        changed = new_labels.filter(F.col("component") < F.col("_old")).count()
        checkpointed.unpersist()
        checkpointed = new_ck
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
        # max_iter exhaustion returns the best labels so far — callers
        # that care (and tests) can detect it here instead of silently
        # accepting unconverged components.
        stats["converged"] = changed == 0
    # isolated vertices (never in an edge) label themselves
    if nodes is not None:
        edge_nodes = labels.select("node")
        isolated = (
            nodes.select(F.col(node_col).alias("node"))
            .join(edge_nodes, "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        labels = labels.union(isolated)
    # materialize the final labeling, then free the remaining blocks
    final = labels.localCheckpoint()
    und_ck.unpersist()
    checkpointed.unpersist()
    return final


def _connected_components_star(
    edges: DataFrame,
    src: str,
    dst: str,
    nodes: DataFrame | None,
    node_col: str,
    max_iter: int,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star / small-star min-labeling (Kiveris et
    al., SoCC'14). Each round:

    * large-star: every node u computes m = min(Γ(u) ∪ {u}) and
      re-wires each strictly-larger neighbor v > u to m;
    * small-star: edges oriented high→low; every high end u re-wires
      its low neighbors AND itself to m = min(Γ⁻(u)).

    Both steps preserve connectivity and only ever lower the high end
    of an edge toward the component minimum, halving path lengths —
    O(log d) rounds to a fixpoint where every edge is (node, root).

    Scale shape: two groupBy-min + join rounds per iteration, all
    partitioned on node id; per-round driver traffic is a single
    2-value checksum row (count + bit_xor of pair hashes; xor is safe
    because the pair set is distinct, and it cannot overflow under
    ANSI mode) used for the fixpoint test. A checksum collision between
    rounds would end the loop EARLY on an unconverged edge set — wrong
    component labels, not a wasted round — so the first checksum match
    is confirmed with one exact set comparison (exceptAll both ways);
    the exact check runs exactly once per call, at convergence, and a
    collision (~2^-64/round) just costs one more loop iteration.
    """
    # oriented high→low, self-loops dropped
    e, e_ck = _cut(
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo")
        )
        .distinct()
    )
    all_nodes, nodes_ck = _cut(
        e.select(F.col("hi").alias("node"))
        .union(e.select(F.col("lo").alias("node")))
        .distinct(),
        # eager: first consumed only after the loop, when the initial
        # edge checkpoint it derives from may already be unpersisted
        eager=True,
    )

    def _checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(hi, lo))").alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev_sum = _checksum(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # -- large-star over the symmetric view ------------------------
        und = e.select("hi", "lo").union(
            e.select(F.col("lo").alias("hi"), F.col("hi").alias("lo"))
        )
        mins = und.groupBy(F.col("hi").alias("u")).agg(
            F.least(F.min("lo"), F.first("hi")).alias("m")
        )
        large = (
            und.join(mins, und["hi"] == mins["u"])
            .filter(F.col("lo") > F.col("hi"))
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
        )
        large = large.filter(F.col("hi") != F.col("lo")).distinct()
        # -- small-star over the oriented view -------------------------
        mins2 = large.groupBy(F.col("hi").alias("u")).agg(
            F.min("lo").alias("m")
        )
        joined = large.join(mins2, large["hi"] == mins2["u"])
        small, small_ck = _cut(
            joined.select(
                F.greatest(F.col("lo"), F.col("m")).alias("hi"),
                F.least(F.col("lo"), F.col("m")).alias("lo"),
            )
            .union(mins2.select(F.col("u").alias("hi"), F.col("m").alias("lo")))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        prev_e, prev_ck = e, e_ck
        e, e_ck = small, small_ck
        cur = _checksum(e)
        if cur == prev_sum:
            # Confirm the fixpoint exactly before trusting it: both
            # sets are distinct, so an empty symmetric difference means
            # the round was a true no-op. Runs once, at convergence.
            diff = (
                e.exceptAll(prev_e).count() + prev_e.exceptAll(e).count()
            )
            prev_ck.unpersist()
            if diff == 0:
                converged = True
                break
        else:
            # previous round's edge blocks are dead once `small` is
            # materialized — release eagerly (see label-prop loop note)
            prev_ck.unpersist()
        prev_sum = cur
    else:
        converged = False
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged

    # fixpoint edges are (node, root); roots + isolated nodes label
    # themselves
    labels = e.groupBy(F.col("hi").alias("node")).agg(
        F.min("lo").alias("component")
    )
    roots = (
        all_nodes.join(labels.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    labels = labels.union(roots)
    if nodes is not None:
        isolated = (
            nodes.select(F.col(node_col).alias("node"))
            .join(all_nodes, "node", "left_anti")
            .select("node", F.col("node").alias("component"))
        )
        labels = labels.union(isolated)
    final = labels.localCheckpoint()
    nodes_ck.unpersist()
    e_ck.unpersist()
    return final


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    doc_id: str = "doc_id",
    algorithm: str = "label",
) -> DataFrame:
    """Assign every document a duplicate-cluster id (the minimum doc_id
    of its component; singletons cluster with themselves) and flag the
    canonical representative. The downstream dedup is then a single
    ``filter(is_canonical)`` — exactly-one-survivor semantics.

    Isolated documents are labeled by ``coalesce`` in a single LEFT
    join against the edge-node labels instead of passing ``nodes=`` to
    ``connected_components`` (which computes them as a corpus
    anti-join, unioned, then re-joined by this function — one extra
    corpus-wide shuffle plus an extra corpus scan; guide §2.4). A doc
    absent from the label frame IS an isolated node, so
    ``coalesce(component, doc_id)`` produces the identical labeling.
    """
    comp = connected_components(
        pairs, src=id_a, dst=id_b, algorithm=algorithm
    )
    lab = comp.select(
        F.col("node").alias(doc_id), F.col("component").alias("__comp")
    )
    return (
        # NULL doc_ids never matched the previous inner join and are
        # still excluded — a left join alone would retain them with a
        # NULL label
        docs.filter(F.col(doc_id).isNotNull())
        .join(lab, doc_id, "left")
        .withColumn("cluster_id", F.coalesce(F.col("__comp"), F.col(doc_id)))
        .drop("__comp")
        .withColumn("is_canonical", F.col(doc_id) == F.col("cluster_id"))
    )
