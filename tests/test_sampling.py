"""Deterministic hash splits and stratified sampling: assignment is a
pure function of the id (stable under repartition/reorder/append) and
weights are honored within sampling tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.operators.sampling import (
    deterministic_shuffle,
    hash_sample,
    hash_split,
    mixture_fractions,
    mixture_sample,
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


def test_hash_sample_append_stable_and_fraction(spark):
    df = spark.range(50_000).select(F.col("id").alias("doc_id"))
    s = hash_sample(df, "doc_id", 0.2)
    n = s.count()
    assert abs(n / 50_000 - 0.2) < 0.02

    # layout-independent: identical kept set after repartition
    s2 = hash_sample(df.repartition(13), "doc_id", 0.2)
    assert s.subtract(s2).count() == 0 and s2.subtract(s).count() == 0

    # append-stable: kept ids from the prefix are still kept in the
    # superset (monotone membership — no resampling on growth)
    s_big = hash_sample(
        spark.range(100_000).select(F.col("id").alias("doc_id")), "doc_id", 0.2
    )
    assert s.subtract(s_big.filter(F.col("doc_id") < 50_000)).count() == 0


def test_mixture_fractions_math():
    counts = {"en": 8_000, "fr": 1_000, "es": 1_000}
    fr = mixture_fractions(counts, {"en": 0.5, "fr": 0.3, "es": 0.2})
    # fr is scarcest relative to its 30% share: 1000/0.3 bounds output
    assert fr["fr"] == 1.0
    assert abs(fr["en"] - (0.5 * (1_000 / 0.3)) / 8_000) < 1e-12
    assert abs(fr["es"] - (0.2 * (1_000 / 0.3)) / 1_000) < 1e-12


def test_mixture_sample_hits_target_shares(spark):
    df = spark.range(40_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 8 < 6, "en")
        .when(F.col("id") % 8 == 6, "fr")
        .otherwise("es")
        .alias("lang"),
    )
    out = mixture_sample(df, "doc_id", "lang", {"en": 0.5, "fr": 0.3, "es": 0.2})
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    # fr (12.5% observed, 30% target) is the binding domain -> kept whole
    assert got["fr"] == 5_000
    assert abs(got["en"] / total - 0.5) < 0.02
    assert abs(got["es"] / total - 0.2) < 0.02


def test_deterministic_shuffle_reproducible(spark):
    df = spark.range(5_000).select(F.col("id").alias("doc_id"))
    a = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=3).collect()]
    b = [
        r["doc_id"]
        for r in deterministic_shuffle(df.repartition(7), "doc_id", seed=3).collect()
    ]
    assert a == b
    assert a != sorted(a)  # actually shuffled
    c = [r["doc_id"] for r in deterministic_shuffle(df, "doc_id", seed=4).collect()]
    assert a != c  # seed changes the order


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
