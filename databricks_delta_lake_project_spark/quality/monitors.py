"""Quality monitors + alert evaluator (Q8-Q9 in SURVEY §2.9).

Ports the reference's monitoring pack — freshness from table history,
z-score volume anomaly, and the alert-definition registry
(``src/quality/quality_monitoring.py:59-125``,
``src/databricks_sql/sql_alerts_monitoring.py:27-171,210-277``) — onto
engine LakeTables. Alert conditions are data-driven (thresholds from
``config.pipeline_config``-style dicts), evaluation is one aggregate
per monitored table.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import LakeTable


def freshness(table: LakeTable) -> dict[str, Any]:
    """Hours since last write, from the commit log (the reference reads
    DESCRIBE HISTORY, ``quality_monitoring.py:59-76``). Driver-side
    metadata only — no data scan."""
    history = [
        r
        for r in table.history().collect()
        if r["operation"] not in ("VACUUM",)
    ]
    last_ms = max(r["timestamp_ms"] for r in history)
    hours = (time.time() * 1000 - last_ms) / 3_600_000
    return {"last_write_ms": last_ms, "hours_since_write": hours}


def volume_anomaly(
    df: DataFrame, date_col: str, z_threshold: float = 3.0
) -> DataFrame:
    """Daily-count z-scores (``sql_alerts_monitoring.py:147-171``);
    variance from exact integer sums in one aggregate pass (same
    deterministic formulation as ``queries.catalog.q10``)."""
    daily = df.groupBy(F.col(date_col).cast("date").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    j = daily.crossJoin(F.broadcast(stats))
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        F.col("ss").cast("double") - F.col("n").cast("double") * mean * mean
    ) / (F.col("n").cast("double") - F.lit(1.0))
    z = (F.col("cnt").cast("double") - mean) / F.sqrt(var)
    return j.select(
        F.col("d").alias("date"),
        "cnt",
        z.alias("z_score"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


@dataclass(frozen=True)
class AlertDefinition:
    """Registry row mirroring ``sql_alerts_monitoring.py:210-277``:
    named condition + severity + a metric callable returning the
    current value."""

    name: str
    severity: str  # info | warning | critical
    metric: Callable[[], float]
    fires_when: Callable[[float], bool]
    description: str = ""


def evaluate_alerts(alerts: list[AlertDefinition]) -> list[dict[str, Any]]:
    """Run every alert; returns (name, severity, value, fired) rows —
    the engine-side replacement for Databricks SQL alert schedules."""
    out = []
    for a in alerts:
        value = float(a.metric())
        out.append(
            {
                "name": a.name,
                "severity": a.severity,
                "value": value,
                "fired": bool(a.fires_when(value)),
            }
        )
    return out


def standard_alerts(
    tables: dict[str, LakeTable],
    freshness_hours: float = 24.0,
    null_rate_caps: dict[str, tuple[str, float]] | None = None,
) -> list[AlertDefinition]:
    """The reference's standard pack (freshness > 24h, null-rate > cap;
    ``pipeline_config.py:122-128``)."""
    alerts: list[AlertDefinition] = []
    for name, t in tables.items():
        alerts.append(
            AlertDefinition(
                name=f"freshness_{name}",
                severity="warning",
                metric=lambda t=t: freshness(t)["hours_since_write"],
                fires_when=lambda v, cap=freshness_hours: v > cap,
                description=f"{name} not written in {freshness_hours}h",
            )
        )
    for name, (col, cap) in (null_rate_caps or {}).items():
        t = tables[name]

        def null_rate(t: LakeTable = t, col: str = col) -> float:
            row = t.to_df().agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias("nn"),
            ).collect()[0]
            return (row["nn"] or 0) / row["n"] if row["n"] else 0.0

        alerts.append(
            AlertDefinition(
                name=f"null_rate_{name}_{col}",
                severity="critical",
                metric=null_rate,
                fires_when=lambda v, cap=cap: v > cap,
            )
        )
    return alerts
