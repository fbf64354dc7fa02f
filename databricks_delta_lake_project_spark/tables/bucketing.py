"""Bucketed tables for shuffle-free co-located joins.

The reference leans on broadcast for its dimension joins
(``src/utils/performance_optimization.py:374-391``) — fine for small
dims, useless for the large-large joins that dominate at 100 TB
(orders x lineitem, events x sessions, repeated self-joins in dedup).
Spark's native answer is bucketing: both sides pre-hash-partitioned
into the same number of buckets on the join key at WRITE time, so the
join reads co-located buckets and the per-query shuffle disappears.
You pay one shuffle once (at write), then every downstream
join/groupBy on the key is exchange-free.

Design notes for scale:

* Bucket count is fixed at write and should be sized so one bucket of
  the LARGER table fits an executor core's working memory at full
  scale (e.g. 100 TB / 2048 buckets ~ 50 GB raw -> ~5 GB columnar
  compressed per bucket scan-side after pruning).
* Both sides must use the SAME bucket count (Spark requires it to
  avoid a shuffle; AQE cannot fix a mismatch at runtime).
* ``sortBy`` on the key additionally removes the per-bucket sort from
  sort-merge joins (bucket files are read pre-sorted).
* Bucketed tables live in the session catalog (saveAsTable); this is
  the one surface where the engine uses the metastore rather than the
  path-based LakeTable, because bucket metadata has no parquet-level
  encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) on
    ``bucket_by``. One up-front shuffle; downstream equi-joins and
    aggregations on the bucket key run exchange-free."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort:
        writer = writer.sortBy(*bucket_by)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. With
    bucketing aligned, the physical plan contains no Exchange on
    either side (pinned by ``tests/test_bucketing.py``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
