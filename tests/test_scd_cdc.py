"""SCD Type 2 and CDC-apply operator tests (M4/M5 semantics; golden
scenarios from the reference's silver transforms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.cdc import (
    cdc_apply,
    latest_changes,
)
from databricks_delta_lake_project_spark.operators.scd import (
    scd2_apply,
    scd2_prepare_initial,
)
from databricks_delta_lake_project_spark.tables import LakeTable


def _ts(s: str):
    return s  # tests pass strings; casts handled in frames


@pytest.fixture()
def scd_table(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "NY", "gold", "2024-01-01 00:00:00"),
         (2, "LA", "silver", "2024-01-01 00:00:00")],
        "customer_id long, city string, tier string, updated_s string",
    ).select(
        "customer_id", "city", "tier",
        F.col("updated_s").cast("timestamp").alias("updated_at"),
    )
    initial = scd2_prepare_initial(src, "updated_at")
    return LakeTable.create(spark, str(tmp_path / "scd"), df=initial)


def test_scd2_change_close_and_insert(spark, scd_table):
    batch = spark.createDataFrame(
        [(1, "SF", "gold", "2024-02-01 00:00:00"),     # city changed
         (2, "LA", "silver", "2024-02-01 00:00:00"),   # unchanged
         (3, "TX", "bronze", "2024-02-01 00:00:00")],  # new key
        "customer_id long, city string, tier string, updated_s string",
    ).select(
        "customer_id", "city", "tier",
        F.col("updated_s").cast("timestamp").alias("updated_at"),
    )
    res = scd2_apply(
        scd_table, batch, key="customer_id", tracked=["city", "tier"],
        ts_col="updated_at",
    )
    assert res == {"closed": 1, "inserted": 2}

    df = scd_table.to_df()
    assert df.count() == 4  # 2 initial + 1 closed stays + 1 new version + 1 new key
    cur = {r["customer_id"]: r for r in df.filter("is_current").collect()}
    assert set(cur) == {1, 2, 3}
    assert cur[1]["city"] == "SF"
    hist = df.filter("NOT is_current").collect()
    assert len(hist) == 1
    assert hist[0]["customer_id"] == 1 and hist[0]["city"] == "NY"
    assert hist[0]["effective_end_ts"] is not None


def test_scd2_idempotent_replay(spark, scd_table):
    batch = spark.createDataFrame(
        [(1, "SF", "gold", "2024-02-01 00:00:00")],
        "customer_id long, city string, tier string, updated_s string",
    ).select(
        "customer_id", "city", "tier",
        F.col("updated_s").cast("timestamp").alias("updated_at"),
    )
    scd2_apply(scd_table, batch, "customer_id", ["city", "tier"], "updated_at")
    res2 = scd2_apply(scd_table, batch, "customer_id", ["city", "tier"], "updated_at")
    # replay of identical state: no changes detected
    assert res2 == {"closed": 0, "inserted": 0}
    assert scd_table.to_df().count() == 3


@pytest.fixture()
def state_table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "tickets"),
        df=spark.createDataFrame(
            [(1, "open", "a"), (2, "open", "b")],
            "ticket_id long, status string, body string",
        ),
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "ticket_id long, status string, body string, "
        "cdc_operation string, cdc_ts_s string",
    ).select(
        "ticket_id", "status", "body", "cdc_operation",
        F.col("cdc_ts_s").cast("timestamp").alias("cdc_timestamp"),
    )


def test_latest_changes_keeps_newest_op(spark, state_table):
    ch = _changes(spark, [
        (1, "open", "a", "update_preimage", "2024-01-02 00:00:00"),
        (1, "closed", "a2", "update_postimage", "2024-01-02 00:00:00"),
        (1, "pending", "a1", "update_postimage", "2024-01-01 00:00:00"),
    ])
    latest = latest_changes(ch, key="ticket_id").collect()
    assert len(latest) == 1
    assert latest[0]["status"] == "closed"  # newest ts wins, preimage dropped


def test_cdc_apply_upsert_and_delete(spark, state_table):
    ch = _changes(spark, [
        (1, "closed", "a2", "update_postimage", "2024-01-02 00:00:00"),
        (2, "open", "b", "delete", "2024-01-02 00:00:00"),
        (3, "open", "c", "insert", "2024-01-02 00:00:00"),
    ])
    cdc_apply(state_table, ch, key="ticket_id")
    state = {r["ticket_id"]: r["status"] for r in state_table.to_df().collect()}
    assert state == {1: "closed", 3: "open"}  # 2 hard-deleted


def test_cdc_apply_soft_delete(spark, state_table):
    ch = _changes(spark, [
        (2, "open", "b", "delete", "2024-01-02 00:00:00"),
    ])
    cdc_apply(state_table, ch, key="ticket_id", soft_delete=True)
    state = {r["ticket_id"]: r["status"] for r in state_table.to_df().collect()}
    assert state == {1: "open", 2: "deleted"}  # row kept, flagged
