"""Maintenance pack: config-driven OPTIMIZE/cluster + VACUUM runs,
ANALYZE for CBO stats, clustering actually narrows per-file ranges."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.tables import LakeTable
from databricks_delta_lake_project_spark.tables.maintenance import (
    analyze_table,
    run_maintenance,
)


def test_run_maintenance_compacts_and_clusters(spark, tmp_path):
    df = spark.range(2000).select(
        (F.col("id") % 97).alias("customer_id"), F.col("id").alias("x")
    ).repartition(16)
    t = LakeTable.create(spark, str(tmp_path / "customers"), df=df)
    n_before = len(t._files())
    assert n_before >= 8

    out = run_maintenance(
        {"customers": t}, cluster_map={"customers": ["customer_id"]},
        vacuum_retain_hours=1e6,  # keep history in this test
    )
    m = out["customers"]
    assert m["numFilesRemoved"] == n_before
    assert m["numFilesAdded"] < n_before
    assert t.to_df().count() == 2000

    # clustering narrowed per-file key ranges -> stats pruning bites:
    # a single-key DELETE rewrites a strict subset of files
    res = t.delete("customer_id = 13")
    assert res["numRemovedFiles"] < len(t._files()) + res["numRemovedFiles"]
    assert res["numDeletedRows"] > 0


def test_optimize_scoped_and_incremental(spark, tmp_path):
    """OPTIMIZE WHERE only rewrites files whose stats intersect the
    predicate, and repeated compaction is a no-op once nothing is
    fragmented — the table is never rewritten wholesale."""
    schema = "day int, x long"
    t = LakeTable.create(
        spark, str(tmp_path / "t"), df=spark.createDataFrame([(1, 0)], schema)
    )
    for i in range(4):
        t.append(spark.createDataFrame([(1, i + 1)], schema))
    for i in range(4):
        t.append(spark.createDataFrame([(2, i)], schema))
    day2 = {
        e["path"] for e in t._files() if e["stats"]["day"]["min"] == 2
    }
    assert len(day2) == 4

    m = t.optimize(where="day = 1")
    assert m["numFilesRemoved"] == 5 and m["numFilesAdded"] == 1
    assert day2 <= {e["path"] for e in t._files()}  # out-of-scope untouched
    assert t.to_df().count() == 9

    # already compacted -> second scoped run is a no-op
    assert t.optimize(where="day = 1")["numFilesRemoved"] == 0

    # unscoped compaction picks up only the small-file tail, and goes
    # quiescent once a single file remains
    assert t.optimize()["numFilesRemoved"] == 5
    assert t.optimize()["numFilesRemoved"] == 0


def test_analyze_table_feeds_cbo(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("g"))
    try:
        analyze_table(spark, df, "analyzed_t", for_columns=["g"])
        stats = spark.sql("DESCRIBE EXTENDED analyzed_t").collect()
        rendered = {r["col_name"]: r["data_type"] for r in stats}
        assert "Statistics" in rendered  # row count recorded for the CBO
    finally:
        spark.sql("DROP TABLE IF EXISTS analyzed_t")


def test_optimize_full_reclusters_everything(spark, tmp_path):
    """OPTIMIZE t FULL: recluster ALL data by the declared keys; only
    meaningful on a clustered table (loud refusal otherwise)."""
    import pytest
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        run_statement,
    )
    from databricks_delta_lake_project_spark.tables import sqldml

    df = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("x")
    ).repartition(6)
    t = LakeTable.create(spark, str(tmp_path / "ofull"), df=df)
    sqldml.register_table(spark, "ofull", t)
    with pytest.raises(ValueError, match="requires clustering keys"):
        run_statement(spark, "OPTIMIZE ofull FULL")
    run_statement(spark, "ALTER TABLE ofull CLUSTER BY (k)")
    n_before = len(t._files())
    res = run_statement(spark, "OPTIMIZE ofull FULL").collect()[0]
    assert res["numFilesRemoved"] == n_before  # whole scope rewritten
    assert t.to_df().count() == 500
    # rows now ordered by the cluster key within the rewritten scope
    ks = [r["k"] for r in t.to_df().collect()]
    assert ks == sorted(ks)
    with pytest.raises(ValueError, match="reclusters everything"):
        run_statement(spark, "OPTIMIZE ofull FULL WHERE k = 1")
