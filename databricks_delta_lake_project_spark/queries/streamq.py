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
from .catalog import bench_fast, load


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
    # at fixture scale, so two batches is the cheapest honest shape).
    # No widen(): staging is a narrow select + repartition(2) + write —
    # there is no CPU-heavy per-row derivation for widen to
    # parallelize, and its repartition would only add a second full
    # shuffle in front of the repartition(2)
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "ts"
    )
    if bench_fast():
        events = events.where("pmod(user_id, 4) = 0")
    events.repartition(2).write.mode("overwrite").parquet(str(src_dir))
    # the staged files carry exactly the frame's schema — re-inferring
    # it with a schemaless read costs a footer-read Spark job
    schema = events.schema

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


def q53_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end STREAMING gap sessionization (T3's streaming path as
    a driver-oracle row, not only pytest): file source -> watermark ->
    ``F.session_window`` groupBy (append mode) -> parquet sink under an
    availableNow trigger; returns the finalized sessions.

    Append-mode session windows only emit once the watermark passes a
    session's end, and with a finite input the watermark stops at
    max(ts) - delay — trailing sessions would sit in state forever. A
    SENTINEL event staged as the LAST file (FileStreamSource processes
    oldest-modification-time first) pushes the final watermark past
    every real session end, so the emitted set is total and equals the
    batch gap-sessionization the DuckDB oracle computes. On a live
    cluster the same plan runs unbounded: state is watermark-evicted,
    per-key state is O(open sessions), and the sink is an append table
    (reference streaming surface ``stream_clickstream.py:50-102``).
    """
    import os
    import time

    from pyspark.sql import Observation

    from ..streaming.ops import sessionized_stream

    work = Path(tempfile.mkdtemp(prefix="q53_sessions_"))
    src_dir = work / "in"
    ckpt = work / "ckpt"
    out_dir = work / "out"

    # no widen() — staging is a narrow select + write, nothing for it
    # to parallelize (see q48)
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    if bench_fast():
        events = events.where("pmod(user_id, 4) = 0")
    # max(ts) rides the staging write as an Observation metric (epoch
    # micros: integer, so no driver-timezone round trip) instead of a
    # second full scan+agg job over events. NO repartition: unlike q48
    # (maxFilesPerTrigger=1 needs >=2 staged files for a multi-batch
    # shape), q53's second micro-batch comes from the late-mtime
    # SENTINEL file, so the round-robin exchange bought nothing — the
    # scan's natural splits write straight out (guide §2.4: remove
    # shuffles outright; measured 2 jobs -> 1, ~0.8 -> ~0.6 s warm)
    obs = Observation()
    events.observe(obs, F.max(F.unix_micros(F.col("ts"))).alias("max_us")) \
        .write.mode("overwrite").parquet(str(src_dir))

    # sentinel: one event far past max(ts); staged strictly after the
    # real files (newer mtime) so it lands in the final micro-batch and
    # advances the watermark over every real session end. One row —
    # written driver-side (pyarrow) rather than spending a Spark job on
    # a coalesce(1) write.
    import pyarrow as pa
    import pyarrow.parquet as pq

    sentinel_us = int(obs.get["max_us"]) + 75 * 60 * 1_000_000
    # FileStreamSource globs *.parquet files in the top dir
    dst = src_dir / "zz_sentinel.parquet"
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([-1], pa.int64()),
                "event_type": pa.array(["view"], pa.string()),
                "ts": pa.array([sentinel_us], pa.int64()).cast(
                    pa.timestamp("us", tz="UTC")
                ),
            }
        ),
        dst,
    )
    late = time.time() + 3600
    os.utime(dst, (late, late))

    schema = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(str(src_dir))
    )
    sessions = sessionized_stream(
        stream, ts_col="ts", user_col="user_id", gap="30 minutes",
        watermark="30 minutes",
    )
    q = (
        sessions.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.schema(sessions.schema)
        .parquet(str(out_dir))
        .filter(F.col("user_id") >= 0)
    )


# batch twin of F.session_window gap semantics: an event continues the
# session iff its gap to the previous event is AT MOST 30 minutes —
# Spark merges sessions whose windows touch (next.start == prev.end
# still merges; verified empirically and pinned by the batch/stream
# parity property test) — so a new session needs gap > 30 minutes;
# session_end is last event + gap
Q53_SQL = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
), sess AS (
  SELECT user_id, ts, is_p,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM flagged
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       COUNT(*) AS n_events,
       CAST(SUM(is_p) AS BIGINT) AS n_purchases
FROM sess
GROUP BY user_id, sid
"""


STREAM_QUERIES = {
    "q48_streaming_upsert": (q48_streaming_upsert, Q48_SQL),
    "q53_streaming_sessions": (q53_streaming_sessions, Q53_SQL),
}
