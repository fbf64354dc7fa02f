"""Bucketed co-located joins: writing both sides bucketed on the join
key removes the per-query shuffle — the exchange is paid once at write
time. This is the scale path for repeated large-large joins where
neither side broadcasts (SURVEY §4 / 100 TB brief)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.tables.bucketing import (
    bucketed_join,
    write_bucketed,
)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark):
    left = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("b")
    )
    try:
        write_bucketed(left, "bkt_left", ["k"], num_buckets=8)
        write_bucketed(right, "bkt_right", ["k"], num_buckets=8)

        # force the non-broadcast path: this is the large-large regime
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, "bkt_left", "bkt_right", ["k"])
            plan = _executed_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning" not in plan  # co-located
            assert joined.count() == 5_000

            # groupBy on the bucket key also reuses the write-time
            # partitioning: single-level aggregate, no exchange
            agg = spark.table("bkt_left").groupBy("k").agg(F.sum("a"))
            assert "Exchange hashpartitioning" not in _executed_plan(agg)

            # control: the same join over unbucketed data shuffles both sides
            plain = left.join(right, "k")
            assert "Exchange hashpartitioning" in _executed_plan(plain)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_sorted_files_skip_per_bucket_sort(spark):
    df = spark.range(4_000).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    try:
        write_bucketed(df, "bkt_sorted", ["k"], num_buckets=4, sort=True)
        write_bucketed(df, "bkt_sorted2", ["k"], num_buckets=4, sort=True)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = bucketed_join(spark, "bkt_sorted", "bkt_sorted2", ["k"])
            assert j.count() == 4_000
            # one sort node per side at most; sorted buckets let Spark
            # drop them entirely when file-per-bucket holds
            assert _executed_plan(j).count("Sort ") <= 2
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_sorted")
        spark.sql("DROP TABLE IF EXISTS bkt_sorted2")
