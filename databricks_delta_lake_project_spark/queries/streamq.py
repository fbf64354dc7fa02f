"""Streaming catalog entry: an end-to-end Structured Streaming
pipeline (file source -> availableNow trigger -> foreachBatch MERGE
into a LakeTable) whose FINAL TABLE STATE is batch-equivalent — so the
streaming path (T6 trigger, T7 foreachBatch-MERGE, K1 table sink)
gets a driver DuckDB oracle row, not only pytest coverage.

Batch-equivalence design: the per-user rollup is built from
order-independent accumulators only — COUNT, MAX(ts), and an integer
cent-sum (``floor(value*100)``; float addition is order-dependent
across micro-batch boundaries, integer addition is not) — so ANY
micro-batch split of the input converges to the same table as one
global GROUP BY, which is exactly what Q48_SQL computes over the raw
events (reference contract: streams land via foreachBatch MERGE,
``transform_transactions.py:98-146``; late/replayed batches converge
by MERGE, ``README.md:281``).

Scale shape: each micro-batch pre-aggregates to one row per user
(partial agg before the MERGE join), and the MERGE's copy-on-write
touches only files whose stats overlap the batch's user-id range —
steady-state cost is O(batch + touched files), never O(table).
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import LakeTable
from .catalog import load, widen


def q48_streaming_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full streaming pipeline on the events table and return
    the resulting per-user profile table (user_id, n_events,
    total_cents, last_ts)."""
    work = Path(tempfile.mkdtemp(prefix="q48_stream_"))
    src_dir = work / "in"
    ckpt = work / "ckpt"
    table_path = work / "profiles"

    # stage the stream input as two files so availableNow +
    # maxFilesPerTrigger exercises a genuinely multi-micro-batch MERGE
    # (each extra batch is ~1.5 s of fixed foreachBatch+commit overhead
    # at fixture scale, so two batches is the cheapest honest shape)
    events = widen(load(spark, sf_dir, "events")).select(
        "event_id", "user_id", "value", "ts"
    )
    events.repartition(2).write.mode("overwrite").parquet(str(src_dir))
    schema = spark.read.parquet(str(src_dir)).schema

    table = LakeTable.create(
        spark,
        str(table_path),
        schema=(
            spark.createDataFrame(
                [], "user_id long, n_events long, total_cents long, last_ts timestamp"
            ).schema
        ),
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        rollup = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias(
                "total_cents"
            ),
            F.max("ts").alias("last_ts"),
        )
        (
            table.merge(rollup, "t.user_id = s.user_id")
            .whenMatchedUpdate(
                {
                    "n_events": "t.n_events + s.n_events",
                    "total_cents": "t.total_cents + s.total_cents",
                    "last_ts": "greatest(t.last_ts, s.last_ts)",
                }
            )
            .whenNotMatchedInsertAll()
            .execute()
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table.to_df().select("user_id", "n_events", "total_cents", "last_ts")


Q48_SQL = """
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       MAX(ts) AS last_ts
FROM events
GROUP BY user_id
"""


STREAM_QUERIES = {
    "q48_streaming_upsert": (q48_streaming_upsert, Q48_SQL),
}
