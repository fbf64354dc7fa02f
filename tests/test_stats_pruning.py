"""Footer-stats file pruning: DELETE/UPDATE/MERGE must touch only
files whose [min, max] can contain matching rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.tables import LakeTable
from databricks_delta_lake_project_spark.tables.table import (
    _prune_by_stats,
    predicate_bounds,
)


def test_predicate_bounds_extraction():
    assert predicate_bounds("k = 5") == {"k": (5, 5)}
    assert predicate_bounds("k >= 3 AND k < 9") == {"k": (3, 9)}
    assert predicate_bounds("k = 5 AND city = 'NY'") == {
        "k": (5, 5), "city": ("NY", "NY")
    }
    # anything non-conjunctive or complex: no pruning
    assert predicate_bounds("k = 5 OR k = 7") == {}
    assert predicate_bounds("NOT (k = 5)") == {}
    assert predicate_bounds("abs(k) = 5") == {}


def test_prune_by_stats_keeps_possible_files():
    files = [
        {"path": "a", "stats": {"k": {"min": 0, "max": 9}}},
        {"path": "b", "stats": {"k": {"min": 10, "max": 19}}},
        {"path": "c", "stats": {}},  # no stats -> never pruned
    ]
    kept = _prune_by_stats(files, {"k": (12, 15)})
    assert [f["path"] for f in kept] == ["b", "c"]
    kept = _prune_by_stats(files, {"k": (5, None)})
    assert [f["path"] for f in kept] == ["a", "b", "c"]
    assert _prune_by_stats(files, {}) == files


@pytest.fixture()
def ranged_table(spark, tmp_path):
    """10 files with disjoint k-ranges (0-99, 100-199, ...)."""
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = LakeTable.create(spark, str(tmp_path / "t"), df=df)
    t.optimize(zorder_by=["k"], target_files=10)
    assert len(t._files()) == 10
    return t


def test_delete_prunes_files(spark, ranged_table):
    res = ranged_table.delete("k = 250")
    assert res["numDeletedRows"] == 1
    # only the one file whose range contains 250 was rewritten
    assert res["numRemovedFiles"] == 1


def test_update_prunes_files(spark, ranged_table):
    res = ranged_table.update("k >= 980", {"v": "0"})
    assert res["numUpdatedRows"] == 20
    assert res["numRemovedFiles"] == 1


def test_merge_prunes_files_by_source_range(spark, ranged_table):
    src = spark.createDataFrame(
        [(101, -1), (150, -2)], "k long, v long"
    )
    res = (
        ranged_table.merge(src, "t.k = s.k")
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    assert res["numTargetRowsUpdated"] == 2
    assert res["numRemovedFiles"] == 1  # only the 100-199 file
    # state correct
    got = {
        r["k"]: r["v"]
        for r in ranged_table.to_df().filter("k IN (101, 150, 500)").collect()
    }
    assert got == {101: -1, 150: -2, 500: 1000}
