"""Governance flows: GDPR erasure + DSAR export + CCPA opt-out +
retention over LakeTables, audit logging, PII discovery scan."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.governance import (
    AuditLog,
    ComplianceManager,
    classify_columns,
    pii_scan,
)
from databricks_delta_lake_project_spark.tables import LakeTable


@pytest.fixture()
def lake(spark, tmp_path):
    profiles = LakeTable.create(
        spark, str(tmp_path / "profiles"),
        df=spark.createDataFrame(
            [(1, "a@x.com", False), (2, "b@y.com", False)],
            "customer_id long, email string, do_not_sell boolean",
        ),
    )
    orders = LakeTable.create(
        spark, str(tmp_path / "orders"),
        df=spark.createDataFrame(
            [(10, 1, 5.0), (11, 1, 6.0), (12, 2, 7.0)],
            "order_id long, customer_id long, amount double",
        ),
    )
    audit = AuditLog(spark, str(tmp_path / "audit"))
    mgr = ComplianceManager(
        spark, {"profiles": profiles, "orders": orders}, audit=audit
    )
    return mgr, profiles, orders, audit, tmp_path


def test_gdpr_erasure(spark, lake):
    mgr, profiles, orders, audit, _ = lake
    deleted = mgr.erase_subject(1)
    assert deleted == {"profiles": 1, "orders": 2}
    assert profiles.to_df().filter("customer_id = 1").count() == 0
    assert orders.to_df().count() == 1
    acts = [r["action"] for r in audit.to_df().collect()]
    assert "gdpr_erasure" in acts


def test_dsar_export(spark, lake):
    mgr, _, _, _, tmp_path = lake
    counts = mgr.subject_access_export(2, str(tmp_path / "dsar"))
    assert counts == {"profiles": 1, "orders": 1}
    exported = []
    for p in Path(tmp_path / "dsar" / "orders").glob("*.json"):
        exported += [json.loads(line) for line in p.read_text().splitlines()]
    assert exported == [{"order_id": 12, "customer_id": 2, "amount": 7.0}]


def test_ccpa_opt_out(spark, lake):
    mgr, profiles, _, _, _ = lake
    n = mgr.opt_out("profiles", 2, "do_not_sell")
    assert n == 1
    row = profiles.to_df().filter("customer_id = 2").first()
    assert row["do_not_sell"] is True
    assert profiles.to_df().filter("customer_id = 1").first()["do_not_sell"] is False


def test_retention(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (2, "2030-01-01 00:00:00")],
        "id long, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("created_at"))
    t = LakeTable.create(spark, str(tmp_path / "t"), df=df)
    mgr = ComplianceManager(spark, {"t": t}, subject_key="id")
    n = mgr.enforce_retention("t", "created_at", retain_days=365)
    assert n == 1
    assert [r["id"] for r in t.to_df().collect()] == [2]


def test_pii_scan_and_classify(spark):
    df = spark.createDataFrame(
        [
            ("a@x.com", "+1 555 123 4567", "123-45-6789", "hello", 1),
            ("b@y.org", "(555) 987-6543", "987-65-4321", "world", 2),
        ],
        "email string, phone string, ssn string, note string, id long",
    )
    findings = {(f["column"], f["pii_type"]) for f in pii_scan(df)}
    assert ("email", "email") in findings
    assert ("phone", "phone") in findings
    assert ("ssn", "ssn") in findings
    assert not any(c == "note" for c, _ in findings)
    tags = classify_columns(df)
    assert tags["email"] == "pii.email"
    assert tags["note"] == "non_pii"
    assert tags["id"] == "non_pii"


def test_redact_pii_in_text(spark):
    """Data-plane scrubbing: every in-text email/SSN/phone is replaced
    by a typed placeholder, non-PII text untouched, and the plan stays
    JVM-side (no Python UDF)."""
    from pyspark.sql import functions as F

    from databricks_delta_lake_project_spark.governance.pii import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            ("mail a.user+tag@sub.example.org now",),
            ("ssn 123-45-6789 and phone +1-555-0199",),
            ("nothing sensitive here 12345",),
        ],
        "text string",
    )
    out = [r["clean"] for r in df.select(redact_pii(F.col("text")).alias("clean")).collect()]
    assert out == [
        "mail [EMAIL] now",
        "ssn [SSN] and phone [PHONE]",
        "nothing sensitive here 12345",
    ]
    plan = (
        df.select(redact_pii(F.col("text")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
