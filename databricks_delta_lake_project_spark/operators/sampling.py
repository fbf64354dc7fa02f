"""Deterministic dataset splitting and stratified sampling.

Training-data pipelines need reproducible train/val/test assignment
that (a) never changes when the table is re-partitioned, re-ordered,
or incrementally appended, and (b) is computable by any engine for
audit. `randomSplit` fails (a) — its assignment depends on partition
layout. The standard fix is content hashing: bucket = hash(id) % N,
split by cumulative weight ranges.

The hash here is a Knuth multiplicative hash in pure int64 arithmetic
(reduce mod the Mersenne prime 2^31-1, multiply by 2654435761, fold
mod 2^32) so the product never overflows under ANSI mode for ANY
bigint id, and the identical expression runs on the DuckDB oracle —
split assignment is bit-reproducible across engines.

Scale: split assignment is a pure map-side projection (no shuffle, no
state); stratified sampling uses Spark's per-stratum Bernoulli
sampling which pipelines into the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERSENNE = 2147483647  # 2^31 - 1
_KNUTH = 2654435761
_FOLD = 4294967296  # 2^32


def hash_bucket(id_col: Column, buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id."""
    h = F.pmod(id_col.cast("bigint"), F.lit(_MERSENNE)) * F.lit(_KNUTH)
    return F.pmod(F.pmod(h, F.lit(_FOLD)), F.lit(buckets))


def hash_bucket_sql(id_expr: str, buckets: int = 1000) -> str:
    """The same bucket computation as ANSI SQL (oracle parity)."""
    return (
        f"((({id_expr}) % {_MERSENNE}) * {_KNUTH} % {_FOLD}) % {buckets}"
    )


def split_column(
    id_col: Column, splits: dict[str, float], buckets: int = 1000
) -> Column:
    """CASE expression assigning each id to a named split by cumulative
    weight over its hash bucket. Weights must sum to 1."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = hash_bucket(id_col, buckets)
    expr = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = bucket < int(round(acc * buckets))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return last


def split_column_sql(
    id_expr: str, splits: dict[str, float], buckets: int = 1000
) -> str:
    """Oracle-SQL twin of :func:`split_column`."""
    bucket = hash_bucket_sql(id_expr, buckets)
    parts = []
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        parts.append(f"WHEN {bucket} < {int(round(acc * buckets))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    buckets: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Tag each row with its deterministic split assignment."""
    splits = splits or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_column(F.col(id_col), splits, buckets))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (`sampleBy`): e.g. downsample an
    over-represented language while keeping rare ones intact. Seeded,
    so repeatable on identical input data; for append-stable sampling
    use :func:`hash_split` buckets instead."""
    return df.sampleBy(strata_col, fractions, seed=seed)
