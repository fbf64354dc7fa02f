"""Skew mitigation operators (SURVEY §4 scale notes).

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled``,
on in the session factory): it splits oversized shuffle partitions at
runtime. These helpers cover the cases AQE does not:

* ``salted_join`` — a *broadcast-infeasible* join where one join key
  dominates (the classic hot-customer problem). The skewed side gets a
  deterministic salt derived from a unique column; the other side is
  replicated ``salt`` times. Result equals the plain join, but the hot
  key's rows spread over ``salt`` reducers.
* ``salted_distinct_count`` — exact distinct counts per hot key in two
  shuffles, neither of which concentrates a key on one reducer.
* ``capped_collect_list`` — bounded event-sequence aggregation: the
  reference collects full per-session event arrays
  (``transform_clickstream.py:106-108``), which at 100 TB can OOM a
  task on a runaway session; the cap keeps state bounded while staying
  deterministic (keep first-N by explicit ordering).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    skewed_unique_col: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``.

    The salt is ``pmod(xxhash64(unique_col), salt)`` — deterministic
    (replayable plans, no rand()) and uniform. ``other`` is exploded
    against every salt bucket, multiplying it by ``salt``; use only
    when ``other`` is the smaller side yet too big to broadcast.
    """
    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(skewed_unique_col)), F.lit(salt))
    )
    o = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return s.join(o, [on, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame, key: str, value: str, salt: int = 16
) -> DataFrame:
    """Exact countDistinct(value) per key without concentrating any
    key's values on one reducer: shuffle 1 groups on
    (key, hash(value) % salt) computing partial distincts; shuffle 2
    sums the partials. Equivalent to
    ``groupBy(key).agg(countDistinct(value))``."""
    partial = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
        .groupBy(key, "__salt")
        .agg(F.count_distinct(F.col(value)).alias("__part"))
    )
    return partial.groupBy(key).agg(
        F.sum("__part").alias(f"distinct_{value}")
    )


def capped_collect_list(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    payload: Column,
    max_items: int = 1000,
    alias: str = "items",
) -> DataFrame:
    """Ordered, size-capped ``collect_list(struct(...))`` (A4 with the
    §4 size cap): rank within key, keep the first ``max_items``, then
    aggregate ``sort_array`` for a deterministic sequence."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_items
    )
    return (
        ranked.groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__rn").alias("__ord"), payload.alias("item")))
            ).alias("__sorted"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .withColumn(alias, F.transform(F.col("__sorted"), lambda s: s["item"]))
        .drop("__sorted")
    )
