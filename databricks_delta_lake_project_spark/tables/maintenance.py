"""Table maintenance pack (X1-X8 in SURVEY §2.11; reference
``src/utils/performance_optimization.py``): config-driven OPTIMIZE /
cluster-by runs, ANALYZE for the CBO, and cache helpers.

The reference drives OPTIMIZE + ZORDER from a per-table column map
(``config/pipeline_config.py:113-120``); ``run_maintenance`` is that
map's executor against LakeTables. Clustering here is
range-partition + sort (see ``LakeTable.optimize``) — the same
file-skipping effect Z-ORDER targets, from footer min/max stats.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .table import LakeTable

# reference zorder map, re-keyed for the engine's tables
DEFAULT_CLUSTER_MAP: dict[str, list[str]] = {
    "customers": ["customer_id"],
    "transactions": ["customer_id", "transaction_date"],
    "clickstream": ["customer_id", "event_date"],
    "customer_360": ["customer_id"],
    "revenue_daily": ["order_date"],
}


def run_maintenance(
    tables: dict[str, LakeTable],
    cluster_map: dict[str, list[str]] | None = None,
    vacuum_retain_hours: float = 168.0,
) -> dict[str, dict[str, Any]]:
    """OPTIMIZE (+clustering) then VACUUM per table — the stage-4
    maintenance task of the reference DAG
    (``workflow_definitions.json:161-171``)."""
    cmap = cluster_map or DEFAULT_CLUSTER_MAP
    out: dict[str, dict[str, Any]] = {}
    for name, t in tables.items():
        metrics = t.optimize(zorder_by=cmap.get(name))
        removed = t.vacuum(retain_hours=vacuum_retain_hours)
        out[name] = {**metrics, "vacuumed_files": len(removed)}
    return out


def analyze_table(
    spark: SparkSession, df: DataFrame, table_name: str,
    for_columns: list[str] | None = None,
) -> None:
    """ANALYZE TABLE ... COMPUTE STATISTICS for the CBO (X6;
    ``performance_optimization.py:195-198``). ANALYZE requires a
    catalog table (Spark 4 rejects temp views), so the frame is
    registered as a managed table first; caller drops it when done."""
    df.write.mode("overwrite").saveAsTable(table_name)
    spark.sql(f"ANALYZE TABLE {table_name} COMPUTE STATISTICS")
    if for_columns:
        cols = ", ".join(for_columns)
        spark.sql(
            f"ANALYZE TABLE {table_name} COMPUTE STATISTICS FOR COLUMNS {cols}"
        )


def cache_hot(df: DataFrame) -> DataFrame:
    """df.cache() (X7) — the OSS stand-in for the Databricks disk
    cache; rely on the OS page cache for parquet bytes."""
    return df.cache()
