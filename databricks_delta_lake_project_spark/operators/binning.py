"""Approximate-quantile binning: the raw-fact-scale replacement for
global ntile windows (SURVEY §4 scale note on W5 / `docs/SCALE.md`).

A global ``ntile`` serializes the whole dataset through one reducer.
Here the breakpoints come from ``approxQuantile`` (Greenwald-Khanna,
one distributed pass, driver receives only n_bins numbers) and the bin
assignment is a broadcast-free scalar CASE — a pure map stage. Error
is bounded by ``relative_error`` on the *breakpoints*; assignment is
exact against those breakpoints.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_breakpoints(
    df: DataFrame, col: str, n_bins: int, relative_error: float = 0.001
) -> list[float]:
    """Interior breakpoints (n_bins - 1 values) for equal-frequency
    bins of ``col``."""
    probs = [i / n_bins for i in range(1, n_bins)]
    return df.approxQuantile(col, probs, relative_error)


def bin_expr(col: Column, breakpoints: list[float]) -> Column:
    """1-based bin id for a value against sorted breakpoints: a nested
    WHEN ladder — whole-stage-codegen scalar work, no shuffle."""
    expr: Column = F.lit(len(breakpoints) + 1)
    for i in range(len(breakpoints) - 1, -1, -1):
        expr = F.when(col <= F.lit(breakpoints[i]), F.lit(i + 1)).otherwise(expr)
    return expr.cast("int")


def quantile_bins(
    df: DataFrame,
    col: str,
    n_bins: int,
    out_col: str | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Equal-frequency binning of ``col`` into ``n_bins`` buckets —
    e.g. RFM quintiles over raw facts:
    ``quantile_bins(per_customer, "monetary", 5, "m_score")``."""
    bps = quantile_breakpoints(df, col, n_bins, relative_error)
    return df.withColumn(out_col or f"{col}_bin", bin_expr(F.col(col), bps))
