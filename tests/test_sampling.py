"""Deterministic hash splits and stratified sampling: assignment is a
pure function of the id (stable under repartition/reorder/append) and
weights are honored within sampling tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.sampling import (
    hash_split,
    stratified_sample,
)


def test_hash_split_deterministic_and_layout_independent(spark):
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    a = hash_split(df, "doc_id")
    b = hash_split(df.repartition(17).orderBy(F.rand(7)), "doc_id")
    # identical assignment regardless of physical layout
    assert a.join(b.withColumnRenamed("split", "split2"), "doc_id").filter(
        F.col("split") != F.col("split2")
    ).count() == 0

    # exhaustive + disjoint: every row gets exactly one split
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 20_000
    assert set(counts) == {"train", "val", "test"}
    # weights honored within hash-bucket tolerance
    assert 0.75 < counts["train"] / 20_000 < 0.85
    assert 0.07 < counts["val"] / 20_000 < 0.13
    assert 0.07 < counts["test"] / 20_000 < 0.13

    # append-stable: the split of an existing id never changes when new
    # ids arrive (assignment reads only the row's own id)
    bigger = hash_split(
        spark.range(40_000).select(F.col("id").alias("doc_id")), "doc_id"
    )
    assert a.join(
        bigger.withColumnRenamed("split", "split2"), "doc_id"
    ).filter(F.col("split") != F.col("split2")).count() == 0


def test_stratified_sample_respects_fractions(spark):
    df = spark.range(30_000).select(
        F.col("id"), (F.when(F.col("id") % 3 == 0, "en").otherwise("fr")).alias("lang")
    )
    s = stratified_sample(df, "lang", {"en": 0.1, "fr": 0.5}, seed=1)
    got = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    n_en, n_fr = 10_000, 20_000
    assert abs(got["en"] / n_en - 0.1) < 0.03
    assert abs(got["fr"] / n_fr - 0.5) < 0.03
    # seeded -> reproducible
    again = stratified_sample(df, "lang", {"en": 0.1, "fr": 0.5}, seed=1)
    assert again.count() == s.count()
