"""Sequence packing invariants: deterministic layout under any
physical ordering, complete assignment, and (greedy) budget safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.packing import (
    pack_chunked,
    pack_greedy,
    pack_stats,
)

BUDGET = 100


def _docs(spark, n=4_000):
    # token lengths 1..60, deterministic
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(60)) + 1).alias("n_tokens"),
    )


def test_pack_chunked_layout_independent_and_complete(spark):
    df = _docs(spark)
    a = pack_chunked(df, "doc_id", "n_tokens", BUDGET, buckets=8)
    b = pack_chunked(
        df.repartition(13).orderBy(F.rand(5)), "doc_id", "n_tokens", BUDGET, buckets=8
    )
    joined = a.join(
        b.select(
            "doc_id",
            F.col("pack_bucket").alias("b2"),
            F.col("seq_id").alias("s2"),
        ),
        "doc_id",
    )
    assert joined.filter(
        (F.col("pack_bucket") != F.col("b2")) | (F.col("seq_id") != F.col("s2"))
    ).count() == 0
    assert a.count() == 4_000  # every doc assigned exactly once

    # chunked contract: a sequence holds >= budget tokens once closed
    # (each doc belongs to the sequence where it STARTS, so a closed
    # sequence spans at least the full budget window)
    per_seq = a.groupBy("pack_bucket", "seq_id").agg(
        F.sum("n_tokens").alias("t")
    )
    max_seq = per_seq.groupBy("pack_bucket").agg(F.max("seq_id").alias("m"))
    closed = per_seq.join(max_seq, "pack_bucket").filter(
        F.col("seq_id") < F.col("m")
    )
    # start-offset binning: every closed bin's docs cover its window,
    # so token sum is at least budget minus one doc's head carried in
    # from the previous bin (doc lengths < 60 here)
    assert closed.filter(F.col("t") < BUDGET - 60).count() == 0


def test_pack_greedy_budget_and_determinism(spark):
    df = _docs(spark, 2_000)
    a = pack_greedy(df, "doc_id", "n_tokens", BUDGET, buckets=8)
    # no sequence over budget (no single doc exceeds it here)
    over = (
        a.groupBy("pack_bucket", "seq_id")
        .agg(F.sum("n_tokens").alias("t"))
        .filter(F.col("t") > BUDGET)
    )
    assert over.count() == 0
    assert a.count() == 2_000

    b = pack_greedy(
        df.repartition(7).orderBy(F.rand(2)), "doc_id", "n_tokens", BUDGET, buckets=8
    )
    joined = a.join(
        b.select(
            "doc_id",
            F.col("pack_bucket").alias("b2"),
            F.col("seq_id").alias("s2"),
        ),
        "doc_id",
    )
    assert joined.filter(
        (F.col("pack_bucket") != F.col("b2")) | (F.col("seq_id") != F.col("s2"))
    ).count() == 0


def test_pack_greedy_oversized_doc_isolated(spark):
    df = spark.createDataFrame(
        [(1, 30), (2, 250), (3, 40)], ["doc_id", "n_tokens"]
    )
    out = pack_greedy(df, "doc_id", "n_tokens", BUDGET, buckets=1)
    rows = {r["doc_id"]: r["seq_id"] for r in out.collect()}
    # the 250-token doc sits alone in its own sequence
    big_seq = rows[2]
    assert [d for d, s in rows.items() if s == big_seq] == [2]


def test_pack_stats_fill_ratio(spark):
    df = _docs(spark)
    packed = pack_greedy(df, "doc_id", "n_tokens", BUDGET, buckets=8)
    stats = pack_stats(packed, "n_tokens", BUDGET).collect()
    assert len(stats) == 8
    for r in stats:
        assert 0.0 < r["closed_fill_ratio"] <= 1.0
        # greedy with docs up to 60 tokens always fills past 40%
        assert r["closed_fill_ratio"] > 0.4
