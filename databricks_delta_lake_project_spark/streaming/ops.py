"""Streaming transformation operators (T1-T5 in SURVEY §2.8).

Each helper authors a streaming logical plan; callers attach sinks via
``sink.py``. All state is bounded by watermarks so the plans run
indefinitely on a real cluster (state-store eviction, append-mode
window finalization — reference
``src/streaming/stream_clickstream.py:50-102``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    events: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    watermark: str = "15 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or sliding, with ``slide``) window aggregation behind a
    watermark (T1+T2; reference ``stream_clickstream.py:64-90``).

    Emits ``window_start``/``window_end`` columns like the reference's
    final select. Works identically on batch DataFrames (no watermark
    applied) — used by tests to cross-check streaming output.
    """
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    out = wm.groupBy(win.alias("w"), *(group_cols or [])).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def tumbling_counts(
    events: DataFrame,
    ts_col: str,
    window_duration: str = "5 minutes",
    group_cols: list[str] | None = None,
    watermark: str = "15 minutes",
) -> DataFrame:
    """The reference's real-time clickstream aggregate: event count +
    distinct users per window (``stream_clickstream.py:67-90``).
    approx_count_distinct is used on the streaming path — exact
    countDistinct is unsupported in append-mode streaming and explodes
    state at scale (SURVEY §4 scale note on A3)."""
    return windowed_agg(
        events,
        ts_col,
        window_duration,
        [
            F.count(F.lit(1)).alias("event_count"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        ],
        group_cols=group_cols,
        watermark=watermark,
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming gap-based sessionization via ``F.session_window``
    (T3 streaming path; the batch path is the lag/cumsum plan in
    ``queries.catalog.q05_sessionization`` — reference
    ``transform_clickstream.py:47-126``)."""
    wm = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "n_purchases"
            ),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            F.col(user_col),
            "n_events",
            "n_purchases",
        )
    )


def stream_dedup(
    events: DataFrame, keys: list[str], ts_col: str, watermark: str = "10 minutes"
) -> DataFrame:
    """Stateful streaming dedup with bounded state
    (``dropDuplicatesWithinWatermark``, T4; reference
    ``stream_transactions.py:59-65``)."""
    wm = events.withWatermark(ts_col, watermark)
    return wm.dropDuplicatesWithinWatermark(keys)


def enrich_stream(
    stream: DataFrame,
    static_dim: DataFrame,
    on: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join (J8; reference declares the
    pattern at ``src/silver/transform_transactions.py:13`` and executes
    it inside foreachBatch). Spark natively supports stream-static
    joins micro-batch-side; broadcasting the dimension keeps every
    micro-batch shuffle-free — the right default whenever the dim fits
    the broadcast threshold."""
    dim = F.broadcast(static_dim) if broadcast_dim else static_dim
    return stream.join(dim, on, how)
