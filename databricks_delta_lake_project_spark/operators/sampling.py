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

import math

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


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, buckets: int = 1_000_000
) -> DataFrame:
    """Append-stable Bernoulli sample: keep a row iff
    ``hash(id) % buckets < fraction * buckets``. Unlike ``df.sample``
    (whose per-partition seeded RNG shifts with physical layout), the
    keep/drop decision reads only the row's own id — re-partitioning,
    re-ordering, or appending new rows never flips an existing row.
    Pure map-side filter: pipelines into the scan with zero shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    thresh = int(round(fraction * buckets))
    return df.filter(hash_bucket(F.col(id_col), buckets) < F.lit(thresh))


def hash_sample_sql(
    id_expr: str, fraction: float, buckets: int = 1_000_000
) -> str:
    """Oracle-SQL predicate twin of :func:`hash_sample`."""
    thresh = int(round(fraction * buckets))
    return f"{hash_bucket_sql(id_expr, buckets)} < {thresh}"


def mixture_fractions(
    counts: dict[str, int], targets: dict[str, float], out_rows: int | None = None
) -> dict[str, float]:
    """Per-domain keep-fractions that reshape observed ``counts`` into
    the ``targets`` mixture by downsampling only (never upsampling).

    With ``out_rows`` unset, picks the largest output satisfying every
    target share exactly: bounded by the scarcest domain's
    ``count / share``. Driver-side arithmetic over the (small) domain
    list — the heavy per-row work stays in :func:`hash_sample`."""
    total_share = sum(targets.values())
    if abs(total_share - 1.0) > 1e-9:
        raise ValueError(f"target shares must sum to 1, got {total_share}")
    missing = set(targets) - set(counts)
    if missing:
        raise ValueError(f"no observed rows for target domains: {sorted(missing)}")
    feasible = min(counts[d] / share for d, share in targets.items() if share > 0)
    n_out = feasible if out_rows is None else min(out_rows, feasible)
    return {d: min(1.0, (share * n_out) / counts[d]) for d, share in targets.items()}


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    targets: dict[str, float],
    out_rows: int | None = None,
    buckets: int = 1_000_000,
) -> DataFrame:
    """Resample to a target domain mixture (e.g. 50% en / 30% fr /
    20% es for training-corpus composition) with append-stable hash
    decisions per domain. Domains absent from ``targets`` are dropped.

    One small count aggregation (|domains| rows to the driver) decides
    fractions; the sample itself is a map-side when-ladder filter —
    no shuffle of the data, safe at 100 TB."""
    counts = {
        r["d"]: r["n"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fracs = mixture_fractions(counts, targets, out_rows)
    bucket = hash_bucket(F.col(id_col), buckets)
    keep = None
    for d, f in fracs.items():
        # floor(x+0.5), not round(): Python round() is banker's, and
        # the oracle recomputes this threshold with SQL FLOOR(x+0.5)
        thresh = int(math.floor(f * buckets + 0.5))
        cond = (F.col(domain_col) == d) & (bucket < thresh)
        keep = cond if keep is None else keep | cond
    return df.filter(keep)


def shuffle_key(id_col: Column, seed: int = 0) -> Column:
    """Deterministic pseudo-random sort key for training order: a
    second Knuth multiply over the seed-shifted id. ``orderBy``
    (range-partition sort) or ``repartitionByRange`` on this key gives
    a reproducible global shuffle that any engine can replay."""
    h = F.pmod(id_col.cast("bigint") + F.lit(seed), F.lit(_MERSENNE)) * F.lit(_KNUTH)
    folded = F.pmod(h, F.lit(_FOLD))
    h2 = F.pmod(folded, F.lit(_MERSENNE)) * F.lit(_KNUTH)
    return F.pmod(h2, F.lit(_FOLD))


def shuffle_key_sql(id_expr: str, seed: int = 0) -> str:
    """Oracle-SQL twin of :func:`shuffle_key` (positive ids only,
    where ``%`` and ``pmod`` agree)."""
    return (
        f"(((({id_expr}) + {seed}) % {_MERSENNE}) * {_KNUTH} % {_FOLD})"
        f" % {_MERSENNE} * {_KNUTH} % {_FOLD}"
    )


def deterministic_shuffle(df: DataFrame, id_col: str, seed: int = 0) -> DataFrame:
    """Globally reorder rows by :func:`shuffle_key` — same order every
    run, on any cluster size or partition layout."""
    return df.orderBy(shuffle_key(F.col(id_col), seed), F.col(id_col))
