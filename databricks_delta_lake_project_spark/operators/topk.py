"""Distributed top-k per key without a key-partitioned global window.

``Window.partitionBy(key)`` + ``row_number`` serializes each key's ENTIRE
candidate list through one partition — with few keys (q34/q35 have
N_QUERIES=5) that is a 5-partition bottleneck, and at 100 TB it is a
full shuffle of every candidate row. This operator does what every
distributed top-k engine does instead:

1. **Local prune** (``mapInPandas``, Arrow-batched, shuffle-free):
   each scan partition keeps only its own top-k rows per key,
   accumulated batch-by-batch so peak memory is one Arrow batch plus
   k rows per key seen in the partition.
2. **Global merge**: a row_number window over the surviving
   ``partitions x keys x k`` rows — thousands of rows, not the
   candidate set — recomputes the exact global ranks.

Correctness: the global top-k is a subset of the union of local
top-ks (any row in the global top-k is in its own partition's local
top-k), so the merge sees every winner; ordering ties are broken by
explicit tiebreak columns, so the result is deterministic and equal to
the single-window formulation row-for-row (pinned against the q34/q35
oracles).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_key(
    df: DataFrame,
    keys: list[str],
    score: str,
    k: int,
    tiebreak: list[str],
    rank_col: str = "rank",
    ascending: bool = False,
) -> DataFrame:
    """Exact per-key top-k by (``score`` desc by default, then
    ``tiebreak`` asc) with local pruning + global merge. Returns the
    input columns plus ``rank_col`` (1-based).

    NaN scores order like Spark's float semantics (NaN greater than
    every real value: first under desc, last under asc). Two traps
    make that need explicit machinery: pandas' ``na_position`` cannot
    express the per-direction rule, and the Arrow boundary of
    ``mapInPandas`` converts a pandas NaN back to a Spark NULL (which
    Spark orders OPPOSITE to NaN) — so the local prune sorts on an
    is-NaN flag, ships that flag through the merge window as a
    leading sort key, and reconstitutes NaN afterwards. Null KEYS
    survive the local prune (``dropna=False``); pandas cannot
    distinguish a null score from NaN after Arrow conversion of a
    float column, so callers must not feed genuinely NULL scores
    (q34/q35 compute cosines that can be NaN, never null)."""
    sort_cols = list(keys) + ["__isnan", score] + list(tiebreak)
    # __isnan's direction rides `ascending`: desc wants NaN (True)
    # first -> descending bools; asc wants NaN last -> ascending bools
    sort_asc = (
        [True] * len(keys) + [ascending, ascending] + [True] * len(tiebreak)
    )

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            if acc is not None:
                pdf = pd.concat([acc, pdf], ignore_index=True)
            acc = (
                pdf.assign(__isnan=pdf[score].isna())
                .sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
                .groupby(list(keys), sort=False, dropna=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        FloatType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        list(df.schema.fields) + [StructField("__isnan", BooleanType())]
    )
    pruned = df.mapInPandas(prune, out_schema)
    flag = F.col("__isnan").asc() if ascending else F.col("__isnan").desc()
    order = [
        flag,
        F.col(score).asc() if ascending else F.col(score).desc(),
    ] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = pruned.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
    score_type = df.schema[score].dataType
    if isinstance(score_type, (DoubleType, FloatType)):
        # only floating scores can carry NaN; rewriting other types
        # through when/otherwise would silently coerce them to double
        out = out.withColumn(
            score,
            F.when(
                F.col("__isnan"), F.lit(float("nan")).cast(score_type)
            ).otherwise(F.col(score)),
        )
    return out.drop("__isnan")
