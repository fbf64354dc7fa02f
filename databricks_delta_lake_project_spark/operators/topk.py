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
    input columns plus ``rank_col`` (1-based)."""
    sort_cols = list(keys) + [score] + list(tiebreak)
    sort_asc = [True] * len(keys) + [ascending] + [True] * len(tiebreak)

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        for pdf in batches:
            if acc is not None:
                pdf = pd.concat([acc, pdf], ignore_index=True)
            acc = (
                pdf.sort_values(sort_cols, ascending=sort_asc, kind="mergesort")
                .groupby(list(keys), sort=False)
                .head(k)
            )
        if acc is not None and len(acc):
            yield acc

    pruned = df.mapInPandas(prune, df.schema)
    order = [
        F.col(score).asc() if ascending else F.col(score).desc()
    ] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return pruned.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
