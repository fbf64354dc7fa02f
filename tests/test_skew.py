"""Skew operators: salted join equivalence, salted distinct counts,
capped ordered collect_list."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.skew import (
    capped_collect_list,
    salted_distinct_count,
    salted_join,
)


def test_salted_join_equals_plain_join(spark):
    # key 1 is hot: 500 of 520 rows
    left = spark.createDataFrame(
        [(i, 1 if i < 500 else i % 20) for i in range(520)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(20)], "k long, label string"
    )
    plain = {
        (r["row_id"], r["label"])
        for r in left.join(right, "k").collect()
    }
    salted = {
        (r["row_id"], r["label"])
        for r in salted_join(left, right, on="k", skewed_unique_col="row_id").collect()
    }
    assert salted == plain
    # salt actually spreads the hot key
    s = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("row_id")), F.lit(8))
    )
    n_buckets = s.filter("k = 1").select("__salt").distinct().count()
    assert n_buckets == 8


def test_salted_distinct_count_exact(spark):
    rows = [(k, f"v{v % (k + 1)}") for k in range(5) for v in range(50)]
    df = spark.createDataFrame(rows, "k long, v string")
    want = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {
        r["k"]: r["distinct_v"]
        for r in salted_distinct_count(df, "k", "v").collect()
    }
    assert got == want


def test_capped_collect_list(spark):
    rows = [(1, i, f"e{i}") for i in range(10)] + [(2, 0, "x")]
    df = spark.createDataFrame(rows, "session long, seq long, ev string")
    out = {
        r["session"]: (r["items"], r["n_items"])
        for r in capped_collect_list(
            df, ["session"], [F.col("seq").asc()], F.col("ev"), max_items=3
        ).collect()
    }
    assert out[1][0] == ["e0", "e1", "e2"]  # ordered, capped at 3
    assert out[1][1] == 3
    assert out[2][0] == ["x"]
