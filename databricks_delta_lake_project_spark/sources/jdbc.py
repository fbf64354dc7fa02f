"""Federated JDBC source (S10 in SURVEY §2.1; reference
``src/delta_sharing/lakehouse_federation.py:43-154,268-309``).

The reference's Lakehouse Federation declares foreign catalogs over
PostgreSQL/MySQL/Snowflake and relies on predicate pushdown into the
remote engine. OSS Spark's built-in JDBC source provides the same
semantics: filters and column pruning are pushed into the generated
remote SQL (``pushDownPredicate``/``pushDownAggregate``), and
``partitionColumn`` splits the remote read across executors.

Exercised end-to-end in ``tests/test_jdbc.py`` against embedded Apache
Derby (whose driver ships inside the Spark distribution): round-trip
write/scan, predicate + column pushdown into the JDBC relation,
partitioned parallel reads, and mirror overwrite/MERGE refresh.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..tables import LakeTable


def read_federated(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Remote table scan with pushdown enabled. With a numeric/date
    ``partition_column`` + bounds the scan runs as ``num_partitions``
    parallel range queries instead of one driver-side cursor — the
    difference between minutes and hours at warehouse scale."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("pushDownPredicate", "true")
        .option("pushDownAggregate", "true")
        .option("pushDownLimit", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def mirror_to_lake(
    spark: SparkSession, source: DataFrame, path: str, key: str | None = None
) -> LakeTable:
    """Materialize a federated frame as a local LakeTable
    (``lakehouse_federation.py:268-292``): full overwrite, or MERGE
    refresh when a key is given (incremental mirror)."""
    if not LakeTable.is_table(path):
        return LakeTable.create(spark, path, df=source)
    t = LakeTable.for_path(spark, path)
    if key is None:
        t.overwrite(source)
    else:
        (
            t.merge(source, f"t.{key} = s.{key}")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
    return t
