"""Sequence packing: batch documents into fixed token-budget training
sequences (beyond-reference LLM-pipeline surface).

Greedy packing is inherently sequential, so the scalable form
parallelizes the way production packers do: documents are dealt into
``buckets`` independent streams by content hash, given a deterministic
in-stream order (seeded shuffle key), and each stream packs on its
own. Every decision reads only (id, token_count), so the layout is
reproducible across runs, engines, and cluster sizes.

Two packers:

- :func:`pack_chunked` — the concatenate-then-cut model (GPT-style):
  the stream's token sequence is cut at exact ``budget`` boundaries
  and a document belongs to the sequence where it starts. Pure window
  cumsum over JVM built-ins; has an exact DuckDB oracle (q47).
- :func:`pack_greedy` — whole-document first-fit-to-open-sequence: a
  doc that would overflow the open sequence closes it and starts the
  next, so no sequence exceeds the budget unless a single document
  alone does. Per-bucket ``applyInPandas`` (state is a running fill
  counter — Arrow-batched, one pass).

Scale: one shuffle each (hash-partition by bucket); in-bucket sort is
the window/group sort Spark does anyway. Buckets bound both state and
skew — at 100 TB raise ``buckets`` so each stream fits an executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .sampling import hash_bucket, hash_bucket_sql, shuffle_key, shuffle_key_sql

BUCKET_COL = "pack_bucket"
SEQ_COL = "seq_id"
_KEY = "_pack_key"


def pack_chunked(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    buckets: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Tag each row with (pack_bucket, seq_id) under the
    concatenate-then-cut model. ``seq_id`` is the 0-based sequence
    index within the bucket: ``(cumulative_tokens_before_doc) div
    budget``. Sequences may spill past the budget by at most one
    document's tail (that tail is truncated/continued at train time —
    the standard chunked-packing contract)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    w = (
        Window.partitionBy(BUCKET_COL)
        .orderBy(_KEY, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return (
        df.withColumn(BUCKET_COL, hash_bucket(F.col(id_col), buckets))
        .withColumn(_KEY, shuffle_key(F.col(id_col), seed))
        .withColumn(
            SEQ_COL,
            F.floor(
                (cum - F.col(token_col)).cast("double") / F.lit(float(budget))
            ).cast("bigint"),
        )
        .drop(_KEY)
    )


def pack_chunked_sql(
    id_expr: str,
    token_expr: str,
    budget: int,
    buckets: int = 256,
    seed: int = 0,
) -> tuple[str, str]:
    """Oracle-SQL twins of the (pack_bucket, seq_id) expressions;
    embed in a SELECT over the same rows."""
    bucket = hash_bucket_sql(id_expr, buckets)
    key = shuffle_key_sql(id_expr, seed)
    cum = (
        f"SUM({token_expr}) OVER (PARTITION BY {bucket} "
        f"ORDER BY {key}, {id_expr} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    seq = (
        f"CAST(FLOOR(CAST({cum} - {token_expr} AS DOUBLE) / {float(budget)}) "
        f"AS BIGINT)"
    )
    return bucket, seq


def pack_greedy(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    buckets: int = 256,
    seed: int = 0,
) -> DataFrame:
    """Whole-document first-fit packing: returns the input columns plus
    (pack_bucket, seq_id). Within a bucket, docs are visited in
    deterministic shuffle order; each doc joins the open sequence if it
    fits, else opens the next. Oversized docs (> budget) get a
    sequence of their own."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tagged = df.withColumn(
        BUCKET_COL, hash_bucket(F.col(id_col), buckets).cast("int")
    ).withColumn(_KEY, shuffle_key(F.col(id_col), seed))
    out_schema = StructType(
        [f for f in tagged.schema.fields if f.name != _KEY]
        + [StructField(SEQ_COL, LongType(), False)]
    )
    tok, key = token_col, _KEY

    def _pack(pdf):
        pdf = pdf.sort_values([key, id_col], kind="mergesort")
        seq, fill, seqs = 0, 0, []
        for t in pdf[tok]:
            t = int(t)
            if fill > 0 and fill + t > budget:
                seq, fill = seq + 1, 0
            seqs.append(seq)
            fill += t
        pdf = pdf.drop(columns=[key])
        pdf[SEQ_COL] = seqs
        return pdf

    return tagged.groupBy(BUCKET_COL).applyInPandas(_pack, out_schema)


def pack_stats(packed: DataFrame, token_col: str, budget: int) -> DataFrame:
    """Per-bucket packing efficiency: sequences produced, docs and
    tokens packed, mean fill ratio of CLOSED sequences (the open tail
    sequence of each bucket is excluded — it is still accepting)."""
    per_seq = packed.groupBy(BUCKET_COL, SEQ_COL).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("seq_tokens"),
    )
    closed = per_seq.withColumn(
        "_is_open",
        F.col(SEQ_COL)
        == F.max(SEQ_COL).over(Window.partitionBy(BUCKET_COL)),
    )
    return (
        closed.groupBy(BUCKET_COL)
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("seq_tokens").cast("bigint").alias("n_tokens"),
            (
                F.sum(F.when(~F.col("_is_open"), F.col("seq_tokens")).otherwise(F.lit(0))).cast("double")
                / (
                    F.greatest(
                        F.sum(F.when(~F.col("_is_open"), F.lit(1)).otherwise(F.lit(0))),
                        F.lit(1),
                    ).cast("double")
                    * F.lit(float(budget))
                )
            ).alias("closed_fill_ratio"),
        )
        .orderBy(BUCKET_COL)
    )
