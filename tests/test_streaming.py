"""Streaming layer tests: Auto-Loader-equivalent file source (schema
registry, hints, rescue column), watermarked windows cross-checked
against the batch plan, session windows, streaming dedup, and the
foreachBatch-MERGE exactly-once sink."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.sources import (
    SchemaRegistry,
    infer_schema,
    read_file_stream,
)
from databricks_delta_lake_project_spark.streaming import (
    StreamMonitor,
    merge_stream,
    sessionized_stream,
    stream_dedup,
    stream_to_lake_table,
    tumbling_counts,
)
from databricks_delta_lake_project_spark.queries.catalog import load
from databricks_delta_lake_project_spark.tables import LakeTable

from conftest import SF_SMALL


def _write_json(dirpath, name, rows):
    dirpath.mkdir(parents=True, exist_ok=True)
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows))


def _drain(query, timeout=120):
    StreamMonitor(query).await_all_data(timeout)


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def test_infer_schema_with_hints(spark, tmp_path):
    src = tmp_path / "in"
    _write_json(src, "a.json", [{"id": 1, "amount": "12.5", "name": "x"}])
    schema = infer_schema(
        spark, str(src), "json", hints="amount double, extra_col string"
    )
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert by_name["amount"] == "double"  # hint overrides inferred string
    assert by_name["extra_col"] == "string"  # hint-only column appended
    assert by_name["id"] == "bigint"


def test_file_stream_rescue_column(spark, tmp_path):
    src = tmp_path / "in"
    _write_json(
        src,
        "a.json",
        [{"id": 1, "amount": 5.0}, {"id": 2, "amount": 6.0}],
    )
    # a malformed line lands in _rescued_data instead of being dropped
    with open(src / "b.json", "w") as f:
        f.write('{"id": 3, "amount": "not-a-number"}\n')
        f.write("this is not json\n")
    stream = read_file_stream(
        spark,
        str(src),
        "json",
        schema_location=str(tmp_path / "registry"),
        hints="amount double",
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rescue_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = spark.sql("SELECT * FROM rescue_t").collect()
    assert len(rows) == 4
    rescued = [r for r in rows if r["_rescued_data"] is not None]
    assert len(rescued) == 2  # bad-typed field + non-JSON line
    ok = {r["id"]: r["amount"] for r in rows if r["_rescued_data"] is None}
    assert ok == {1: 5.0, 2: 6.0}


def test_schema_registry_evolution(spark, tmp_path):
    src = tmp_path / "in"
    reg_loc = str(tmp_path / "registry")
    _write_json(src, "a.json", [{"id": 1}])
    s1 = read_file_stream(spark, str(src), "json", schema_location=reg_loc).schema
    assert "new_col" not in s1.names
    # new column arrives -> restart picks it up (addNewColumns mode)
    _write_json(src, "b.json", [{"id": 2, "new_col": "v"}])
    s2 = read_file_stream(spark, str(src), "json", schema_location=reg_loc).schema
    assert "new_col" in s2.names
    # registry recorded both versions
    reg = SchemaRegistry(reg_loc)
    assert reg.latest().json() == s2.json()


# ---------------------------------------------------------------------------
# windowed aggregation: streaming result == batch result
# ---------------------------------------------------------------------------


def test_tumbling_window_stream_matches_batch(spark, tmp_path):
    events = load(spark, SF_SMALL, "events")
    src = tmp_path / "events_parquet"
    events.write.parquet(str(src))

    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        tumbling_counts(stream, "ts", "1 hour")
        .writeStream.format("memory")
        .queryName("win_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        (r["window_start"], r["event_count"])
        for r in spark.sql("SELECT * FROM win_t").collect()
    }
    want = {
        (r["window_start"], r["event_count"])
        for r in tumbling_counts(events, "ts", "1 hour").collect()
    }
    # append-mode emits only watermark-closed windows: subset of batch,
    # and every emitted window must agree exactly with the batch plan
    assert got
    assert got <= want


def test_session_window_stream(spark, tmp_path):
    rows = [
        ("2024-01-01 00:00:00", 1, "view"),
        ("2024-01-01 00:10:00", 1, "purchase"),
        ("2024-01-01 02:00:00", 1, "view"),  # new session after 30min gap
        ("2024-01-01 00:05:00", 2, "view"),
        # sentinel far in the future: advances the watermark so every
        # earlier session closes and is emitted in append mode
        ("2024-01-01 09:00:00", 99, "view"),
    ]
    df = spark.createDataFrame(rows, "ts_s string, user_id long, event_type string")
    df = df.select(F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type")
    src = tmp_path / "sess_parquet"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        sessionized_stream(stream, "ts", "user_id", gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql(
        "SELECT * FROM sess_t WHERE user_id != 99 ORDER BY user_id, session_start"
    ).collect()
    # user 1: two sessions (2 events, then 1); user 2: one session
    sessions = [(r["user_id"], r["n_events"], r["n_purchases"]) for r in got]
    assert sessions == [(1, 2, 1), (1, 1, 0), (2, 1, 0)]


@pytest.mark.slow
def test_session_parity_batch_vs_stream_property(spark, tmp_path):
    """PROPERTY (SURVEY "what's hard" #4): the manual lag/cumsum
    batch sessionization and the streaming ``F.session_window`` plan
    are the SAME function — randomized gap patterns (including exact
    30-minute boundaries and zero gaps) produce identical session
    boundaries even when a session's events straddle micro-batch
    boundaries (time-ordered file chunks, one file per trigger).
    Convention under test (probed empirically, r14): Spark merges
    sessions whose windows TOUCH — an event exactly gap after the
    previous one continues the session — so a new session starts iff
    the gap is STRICTLY greater than 30 minutes; session_end = last
    event + gap."""
    import os
    import random
    import shutil
    import time as _time
    from datetime import datetime, timedelta

    from pyspark.sql import Window

    schema = "ts timestamp, user_id long, event_type string"
    gap_pool = [0, 1, 60, 1799, 1800, 1801, 2400, 5400]
    for seed in (7, 23):
        rng = random.Random(seed)
        base = datetime(2024, 1, 1)
        events = []
        for user in range(1, 9):
            t = base + timedelta(seconds=rng.randrange(0, 600))
            for _ in range(rng.randrange(5, 25)):
                events.append(
                    (t, user, rng.choice(["view", "view", "purchase"]))
                )
                t += timedelta(seconds=rng.choice(gap_pool))
        events.sort(key=lambda e: e[0])
        src = tmp_path / f"sess_prop_{seed}"
        src.mkdir()
        chunks = 7
        per = (len(events) + chunks - 1) // chunks
        now = _time.time()
        staged = [
            events[i * per : (i + 1) * per] for i in range(chunks)
        ]
        # sentinel past every session end flushes append mode
        staged.append(
            [(events[-1][0] + timedelta(hours=2), -1, "view")]
        )
        for i, chunk in enumerate(staged):
            if not chunk:
                continue
            tmp = src / f"_tmp{i}"
            spark.createDataFrame(chunk, schema).coalesce(
                1
            ).write.mode("overwrite").parquet(str(tmp))
            part = next(tmp.glob("part-*.parquet"))
            dst = src / f"c{i:02d}.parquet"
            part.rename(dst)
            os.utime(dst, (now + i, now + i))
            shutil.rmtree(tmp)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            sessionized_stream(stream, "ts", "user_id", gap="30 minutes")
            .writeStream.format("memory")
            .queryName(f"sess_prop_{seed}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        got = {
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["n_purchases"],
            )
            for r in spark.sql(
                f"SELECT * FROM sess_prop_{seed} WHERE user_id >= 0"
            ).collect()
        }
        # the manual lag/cumsum batch twin, same gap convention
        w = Window.partitionBy("user_id").orderBy("ts")
        bdf = (
            spark.createDataFrame(events, schema)
            .withColumn(
                "_new",
                F.when(
                    F.lag("ts").over(w).isNull()
                    | (
                        F.unix_micros("ts")
                        - F.unix_micros(F.lag("ts").over(w))
                        > 1800 * 1_000_000
                    ),
                    1,
                ).otherwise(0),
            )
            .withColumn(
                "_sid",
                F.sum("_new").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .groupBy("user_id", "_sid")
            .agg(
                F.min("ts").alias("session_start"),
                (
                    F.max("ts") + F.expr("INTERVAL 30 MINUTES")
                ).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                ).alias("n_purchases"),
            )
        )
        expected = {
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["n_events"],
                r["n_purchases"],
            )
            for r in bdf.collect()
        }
        assert got == expected, f"seed {seed}: batch/stream diverge"


def test_stream_dedup_within_watermark(spark, tmp_path):
    rows = [
        ("2024-01-01 00:00:00", 100),
        ("2024-01-01 00:00:30", 100),  # duplicate id within watermark
        ("2024-01-01 00:01:00", 101),
    ]
    df = spark.createDataFrame(rows, "ts_s string, txn_id long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "txn_id"
    )
    src = tmp_path / "dedup_parquet"
    df.write.parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (
        stream_dedup(stream, ["txn_id"], "ts")
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = spark.sql("SELECT txn_id FROM dedup_t").collect()
    assert sorted(r["txn_id"] for r in got) == [100, 101]


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


def test_stream_append_to_lake_table(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    src = tmp_path / "in_parquet"
    df.write.parquet(str(src))
    table = LakeTable.create(spark, str(tmp_path / "t"), schema=df.schema)
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = stream_to_lake_table(stream, table, str(tmp_path / "ckpt"))
    _drain(q)
    assert table.to_df().count() == 2


def test_merge_stream_upsert_and_idempotency(spark, tmp_path):
    init = spark.createDataFrame([(1, "old"), (2, "old")], "id long, v string")
    table = LakeTable.create(spark, str(tmp_path / "t"), df=init)

    upd = spark.createDataFrame([(2, "new"), (3, "new")], "id long, v string")
    src = tmp_path / "in_parquet"
    upd.write.parquet(str(src))

    def run(ckpt: str):
        stream = spark.readStream.schema(upd.schema).parquet(str(src))
        q = merge_stream(stream, table, key="id", checkpoint=ckpt)
        _drain(q)

    run(str(tmp_path / "ckpt1"))
    state = {r["id"]: r["v"] for r in table.to_df().collect()}
    assert state == {1: "old", 2: "new", 3: "new"}

    # replaying the same data through a FRESH checkpoint re-merges the
    # same keys -> state unchanged (idempotent-by-key MERGE, T11)
    run(str(tmp_path / "ckpt2"))
    state2 = {r["id"]: r["v"] for r in table.to_df().collect()}
    assert state2 == state
    assert table.to_df().count() == 3


def test_stream_static_enrichment(spark, tmp_path):
    txns = spark.createDataFrame(
        [(1, 100, 5.0), (2, 101, 6.0), (3, 999, 7.0)],
        "txn_id long, customer_id long, amount double",
    )
    src = tmp_path / "txn_parquet"
    txns.write.parquet(str(src))
    dims = spark.createDataFrame(
        [(100, "gold"), (101, "silver")], "customer_id long, tier string"
    )
    from databricks_delta_lake_project_spark.streaming import enrich_stream

    stream = spark.readStream.schema(txns.schema).parquet(str(src))
    q = (
        enrich_stream(stream, dims, on="customer_id")
        .writeStream.format("memory")
        .queryName("enrich_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    got = {
        r["txn_id"]: r["tier"]
        for r in spark.sql("SELECT * FROM enrich_t").collect()
    }
    assert got == {1: "gold", 2: "silver", 3: None}  # left join keeps orphans


def test_sliding_window_agg(spark, tmp_path):
    from databricks_delta_lake_project_spark.streaming import windowed_agg

    rows = [
        ("2024-01-01 00:02:00", 1),
        ("2024-01-01 00:07:00", 2),
        ("2024-01-01 00:12:00", 3),
    ]
    df = spark.createDataFrame(rows, "ts_s string, v long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "v"
    )
    out = windowed_agg(
        df, "ts", "10 minutes", [F.count(F.lit(1)).alias("n")], slide="5 minutes"
    ).collect()
    # each event lands in two overlapping 10-min windows
    by_start = {r["window_start"].strftime("%H:%M"): r["n"] for r in out}
    assert by_start == {"23:55": 1, "00:00": 2, "00:05": 2, "00:10": 1}


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState: per-key totals accumulate across
    micro-batches AND across a restart from the same checkpoint."""
    from databricks_delta_lake_project_spark.streaming import running_totals

    src = tmp_path / "state_src"
    ckpt = str(tmp_path / "state_ckpt")
    batch1 = spark.createDataFrame(
        [("a", 10.0), ("a", 5.0), ("b", 1.0)], "key string, amount double"
    )
    src.mkdir()
    batch1.write.parquet(str(src / "f1.parquet"))

    updates: list = []

    def run():
        stream = (
            spark.readStream.schema(batch1.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*")
        )

        def collect_batch(bdf, _bid):
            updates.extend(bdf.collect())

        q = (
            running_totals(stream, "key", "amount")
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
        out = {}
        for r in updates:  # keep the latest update per key
            if r["key"] not in out or r["n_events"] > out[r["key"]][0]:
                out[r["key"]] = (r["n_events"], r["total_amount"])
        return out

    assert run() == {"a": (2, 15.0), "b": (1, 1.0)}

    # second file lands; restart from the SAME checkpoint -> state
    # resumes, totals are cumulative over both files
    spark.createDataFrame(
        [("a", 2.0), ("c", 7.0)], "key string, amount double"
    ).write.parquet(str(src / "f2.parquet"))
    got = run()
    assert got["a"] == (3, 17.0)  # resumed state: 2+1 events, 15+2
    assert got["c"] == (1, 7.0)
    assert got["b"] == (1, 1.0)  # untouched key keeps batch-1 totals


def test_evolution_mode_rescue_captures_new_fields(spark, tmp_path):
    """rescue mode: schema frozen; unknown top-level JSON fields land
    in _rescued_data as a JSON object; malformed lines rescue whole."""
    src = tmp_path / "rescue_src"
    _write_json(src, "a.json", [{"id": 1, "name": "x"}])
    reg = str(tmp_path / "reg")
    # first start registers {id, name}
    read_file_stream(spark, str(src), "json", schema_location=reg)
    # new field arrives; rescue mode must NOT evolve
    _write_json(src, "b.json", [{"id": 2, "name": "y", "extra": "боль"}])
    (src / "c.json").write_text('{"id": broken')
    stream = read_file_stream(
        spark, str(src), "json", schema_location=reg, evolution_mode="rescue"
    )
    assert "extra" not in stream.columns
    q = (
        stream.writeStream.format("memory")
        .queryName("rescue_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    rows = {r["id"]: r for r in spark.sql("SELECT * FROM rescue_t").collect()}
    assert rows[1]["_rescued_data"] is None
    assert json.loads(rows[2]["_rescued_data"]) == {"extra": "боль"}
    malformed = [r for r in rows.values() if r["id"] is None]
    assert malformed and malformed[0]["_rescued_data"] == '{"id": broken'


def test_evolution_mode_fail_on_new_columns(spark, tmp_path):
    from databricks_delta_lake_project_spark.sources import NewColumnsError

    src = tmp_path / "fail_src"
    _write_json(src, "a.json", [{"id": 1}])
    reg = str(tmp_path / "reg")
    read_file_stream(spark, str(src), "json", schema_location=reg)
    _write_json(src, "b.json", [{"id": 2, "surprise": 1}])
    with pytest.raises(NewColumnsError, match="surprise"):
        read_file_stream(
            spark,
            str(src),
            "json",
            schema_location=reg,
            evolution_mode="failOnNewColumns",
        )
    # mode "none": frozen schema, new field silently dropped
    stream = read_file_stream(
        spark, str(src), "json", schema_location=reg, evolution_mode="none"
    )
    assert "surprise" not in stream.columns


def test_rocksdb_state_store_engaged(spark, tmp_path):
    """The session factory pins the RocksDB state-store provider
    (disk-backed state — the 100 TB streaming-state survival path,
    SURVEY §4): the conf is set AND a stateful query's checkpoint
    carries RocksDB artifacts — ``<v>.changelog`` commit deltas under
    changelog checkpointing (the r14 default; full ``<v>.zip``
    snapshots are uploaded lazily in the background) — not the default
    heap provider's ``<v>.delta`` files."""
    from databricks_delta_lake_project_spark.session import ROCKSDB_PROVIDER
    from databricks_delta_lake_project_spark.streaming import running_totals

    assert (
        spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB_PROVIDER
    )

    src = tmp_path / "rocks_src"
    ckpt = tmp_path / "rocks_ckpt"
    src.mkdir()
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "key string, amount double"
    )
    df.write.parquet(str(src / "f1.parquet"))
    stream = spark.readStream.schema(df.schema).parquet(str(src) + "/*")
    q = (
        running_totals(stream, "key", "amount")
        .writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    state_files = [p.name for p in (ckpt / "state").rglob("*") if p.is_file()]
    assert any(
        n.endswith((".zip", ".changelog")) for n in state_files
    ), state_files
    assert not any(n.endswith(".delta") for n in state_files), state_files
