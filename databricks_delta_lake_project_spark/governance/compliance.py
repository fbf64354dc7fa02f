"""Compliance flows (M6-M7, X4, X11 in SURVEY §2; reference
``/root/reference/governance/compliance_policies.py``):

* GDPR right-to-erasure: DELETE a subject's rows across every
  registered table + audit append + optional VACUUM
  (``compliance_policies.py:136-212``).
* GDPR DSAR export: collect a subject's rows from all tables to JSON
  (``compliance_policies.py:222-252``).
* CCPA opt-out: UPDATE flag by predicate
  (``compliance_policies.py:277-295``).
* Retention enforcement: delete rows older than a per-table window,
  then VACUUM beyond the compliance retention
  (``compliance_policies.py:93-134``).
* Audit log: engine-owned LakeTable replacing ``system.access.audit``
  (``compliance_policies.py:321-334``; SURVEY §2.11 X11).

Scale notes: erasure/opt-out are copy-on-write DMLs — LakeTable
rewrites only files containing matching rows (file pruning via footer
stats), so a single-subject GDPR delete touches O(files-with-subject),
not the whole table.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import LakeTable

AUDIT_SCHEMA = (
    "event_time_ms long, action string, principal string, "
    "table_name string, details string"
)


class AuditLog:
    """Append-only audit LakeTable (X11)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        if LakeTable.is_table(path):
            self.table = LakeTable.for_path(spark, path)
        else:
            self.table = LakeTable.create(
                spark, path,
                schema=spark.createDataFrame([], AUDIT_SCHEMA).schema,
            )

    def record(
        self, action: str, table_name: str, principal: str = "engine",
        **details: Any,
    ) -> None:
        self.table.append(
            self.spark.createDataFrame(
                [
                    (
                        int(time.time() * 1000),
                        action,
                        principal,
                        table_name,
                        json.dumps(details, default=str),
                    )
                ],
                AUDIT_SCHEMA,
            )
        )

    def to_df(self) -> DataFrame:
        return self.table.to_df()


class ComplianceManager:
    """GDPR/CCPA operations over a registry of subject-keyed tables."""

    def __init__(
        self,
        spark: SparkSession,
        tables: dict[str, LakeTable],
        subject_key: str = "customer_id",
        audit: AuditLog | None = None,
    ):
        self.spark = spark
        self.tables = tables
        self.subject_key = subject_key
        self.audit = audit

    def erase_subject(
        self, subject_id: Any, vacuum_retain_hours: float | None = None
    ) -> dict[str, int]:
        """GDPR Article-17 erasure across all registered tables
        (``compliance_policies.py:136-212``). Returns rows deleted per
        table. VACUUM with 0-retention makes the erasure physical, not
        just logical (the reference's explicit compliance step)."""
        deleted: dict[str, int] = {}
        for name, t in self.tables.items():
            if self.subject_key not in [f.name for f in t.schema.fields]:
                continue
            res = t.delete(F.col(self.subject_key) == F.lit(subject_id))
            deleted[name] = int(res.get("numDeletedRows", 0))
            if vacuum_retain_hours is not None:
                t.vacuum(retain_hours=vacuum_retain_hours)
        if self.audit:
            self.audit.record(
                "gdpr_erasure", ",".join(deleted), subject_id=subject_id,
                rows_deleted=deleted,
            )
        return deleted

    def subject_access_export(
        self, subject_id: Any, out_dir: str
    ) -> dict[str, int]:
        """DSAR export: every table's rows for the subject as JSON
        (``compliance_policies.py:222-252``). coalesce(1) per table —
        the result is one subject's rows, driver-small by design."""
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        counts: dict[str, int] = {}
        for name, t in self.tables.items():
            if self.subject_key not in [f.name for f in t.schema.fields]:
                continue
            rows = t.to_df().filter(
                F.col(self.subject_key) == F.lit(subject_id)
            )
            rows.coalesce(1).write.mode("overwrite").json(str(out / name))
            counts[name] = rows.count()
        if self.audit:
            self.audit.record("dsar_export", ",".join(counts), subject_id=subject_id)
        return counts

    def opt_out(self, table_name: str, subject_id: Any, flag_col: str) -> int:
        """CCPA do-not-sell flag (``compliance_policies.py:277-295``)."""
        t = self.tables[table_name]
        res = t.update(
            F.col(self.subject_key) == F.lit(subject_id),
            {flag_col: "true"},
        )
        if self.audit:
            self.audit.record("ccpa_opt_out", table_name, subject_id=subject_id)
        return int(res.get("numUpdatedRows", 0))

    def enforce_retention(
        self, table_name: str, ts_col: str, retain_days: int
    ) -> int:
        """Row-level retention: delete rows older than the window
        (``compliance_policies.py:93-134`` interval predicates)."""
        t = self.tables[table_name]
        cutoff_ms = int(time.time() * 1000) - retain_days * 86_400_000
        res = t.delete(
            F.col(ts_col) < F.timestamp_millis(F.lit(cutoff_ms))
        )
        if self.audit:
            self.audit.record(
                "retention_enforcement", table_name,
                retain_days=retain_days,
                rows_deleted=res.get("numDeletedRows", 0),
            )
        return int(res.get("numDeletedRows", 0))
