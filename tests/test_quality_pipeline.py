"""Quality engine (WARN/DROP/FAIL/QUARANTINE, single-pass metrics),
monitors/alerts, and the declarative pipeline DAG runner.

Golden values mirror the reference's notebook assertions
(``tests/test_quality_rules.py:45-129``: 2-pass/4-fail combined rule,
quarantine split at amount >= 100000).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.plans import Pipeline
from databricks_delta_lake_project_spark.quality import (
    Action,
    QualityEngine,
    QualityRule,
    evaluate_alerts,
    freshness,
    volume_anomaly,
)
from databricks_delta_lake_project_spark.quality.expectations import (
    QualityViolation,
    transaction_rules,
)
from databricks_delta_lake_project_spark.quality.monitors import standard_alerts
from databricks_delta_lake_project_spark.tables import LakeTable


@pytest.fixture()
def txns(spark):
    rows = [
        (1, 10, 50.0),
        (2, 20, -5.0),      # fails positive_amount
        (None, 30, 60.0),   # fails valid_transaction_id
        (4, None, 70.0),    # fails valid_customer_fk
        (5, 50, 150000.0),  # quarantined (amount cap)
        (6, 60, 80.0),
    ]
    return spark.createDataFrame(
        rows, "transaction_id long, customer_id long, amount double"
    )


def test_measure_single_pass(spark, txns):
    engine = QualityEngine()
    results = engine.measure(txns, transaction_rules())
    by_name = {r.rule.name: r for r in results}
    assert by_name["valid_transaction_id"].n_fail == 1
    assert by_name["valid_customer_fk"].n_fail == 1
    assert by_name["positive_amount"].n_fail == 1
    assert by_name["amount_below_cap"].n_fail == 1
    assert by_name["positive_amount"].n_total == 6


def test_apply_drop_and_quarantine(spark, txns, tmp_path):
    quarantine = LakeTable.create(
        spark, str(tmp_path / "quarantine"),
        schema=txns.schema.add("_quarantine_rule", "string")
        .add("_quarantine_source", "string")
        .add("_quarantine_at", "timestamp"),
    )
    metrics = LakeTable.create(
        spark, str(tmp_path / "metrics"),
        schema=spark.createDataFrame(
            [],
            "source string, rule string, action string, n_total long, "
            "n_pass long, n_fail long, pass_rate double, measured_at timestamp",
        ).schema,
    )
    engine = QualityEngine(quarantine_table=quarantine, metrics_table=metrics)
    kept, results = engine.apply(txns, transaction_rules(), "txn_test")
    # 6 rows - 3 dropped - 1 quarantined = 2 kept
    assert sorted(r["transaction_id"] for r in kept.collect()) == [1, 6]
    q = quarantine.to_df().collect()
    assert len(q) == 1 and q[0]["transaction_id"] == 5
    assert q[0]["_quarantine_rule"] == "amount_below_cap"
    m = metrics.to_df()
    assert m.count() == 4
    assert m.filter(F.col("rule") == "positive_amount").first()["n_fail"] == 1


def test_apply_fail_action(spark, txns):
    engine = QualityEngine()
    rules = [QualityRule("no_nulls", "transaction_id IS NOT NULL", Action.FAIL)]
    with pytest.raises(QualityViolation, match="no_nulls"):
        engine.apply(txns, rules)


def test_warn_keeps_rows(spark, txns):
    engine = QualityEngine()
    rules = [QualityRule("warn_only", "amount < 100", Action.WARN)]
    kept, results = engine.apply(txns, rules)
    assert kept.count() == 6  # WARN never filters
    assert results[0].n_fail == 1  # only 150000.0 violates amount < 100


def test_volume_anomaly_and_alerts(spark, tmp_path):
    # 10 normal days + 1 spike
    rows = [(f"2024-01-{d:02d} 00:00:00", i) for d in range(1, 11) for i in range(10)]
    rows += [("2024-01-11 00:00:00", i) for i in range(200)]
    df = spark.createDataFrame(rows, "ts_s string, i long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "i"
    )
    res = volume_anomaly(df, "ts")
    anomalies = [r["date"].isoformat() for r in res.filter("is_anomaly").collect()]
    assert anomalies == ["2024-01-11"]

    t = LakeTable.create(spark, str(tmp_path / "t"), df=df)
    alerts = standard_alerts({"t": t}, freshness_hours=24.0,
                             null_rate_caps={"t": ("i", 0.05)})
    fired = {a["name"]: a["fired"] for a in evaluate_alerts(alerts)}
    assert fired == {"freshness_t": False, "null_rate_t_i": False}
    assert freshness(t)["hours_since_write"] < 1.0


# ---------------------------------------------------------------------------
# pipeline DAG
# ---------------------------------------------------------------------------


def test_pipeline_topo_and_materialization(spark, tmp_path):
    p = Pipeline(str(tmp_path / "lake"))

    @p.table(name="gold")  # declared first, depends on both silvers
    def gold(ctx):
        a = ctx.read("silver_a")
        b = ctx.read("silver_b")
        return a.join(b, "id")

    @p.table(name="silver_a", expectations=[
        QualityRule("pos_id", "id IS NOT NULL", Action.DROP)
    ])
    def silver_a(ctx):
        return ctx.read("bronze").select("id", "x")

    @p.table(name="silver_b")
    def silver_b(ctx):
        return ctx.read("bronze").select("id", (F.col("x") * 2).alias("y"))

    @p.table(name="bronze")
    def bronze(ctx):
        return ctx.spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (None, 30.0)], "id long, x double"
        )

    res = p.run(spark)
    # bronze before silvers before gold
    assert res.order.index("bronze") < res.order.index("silver_a")
    assert res.order.index("silver_a") < res.order.index("gold")
    assert res.order.index("silver_b") < res.order.index("gold")
    assert res.metrics["silver_a"]["rows"] == 2  # null id dropped
    assert res.metrics["silver_a"]["expectations"]["pos_id"]["n_fail"] == 1
    assert res.metrics["gold"]["rows"] == 2

    g = p.table_df(spark, "gold").orderBy("id").collect()
    assert [(r["id"], r["x"], r["y"]) for r in g] == [(1, 10.0, 20.0), (2, 20.0, 40.0)]


def test_pipeline_incremental_merge(spark, tmp_path):
    p = Pipeline(str(tmp_path / "lake"))
    state = {"batch": [(1, "v1"), (2, "v1")]}

    @p.table(name="src")
    def src(ctx):
        return ctx.spark.createDataFrame(state["batch"], "id long, v string")

    @p.table(name="agg", incremental=True, key="id")
    def agg(ctx):
        return ctx.read("src")

    res1 = p.run(spark)
    assert res1.metrics["agg"]["action"] == "create"

    state["batch"] = [(2, "v2"), (3, "v2")]
    res2 = p.run(spark)
    assert res2.metrics["agg"]["action"] == "merge"
    got = {r["id"]: r["v"] for r in p.table_df(spark, "agg").collect()}
    assert got == {1: "v1", 2: "v2", 3: "v2"}


def test_pipeline_cycle_detection(spark, tmp_path):
    p = Pipeline(str(tmp_path / "lake"))

    @p.table(name="a")
    def a(ctx):
        return ctx.read("b")

    @p.table(name="b")
    def b(ctx):
        return ctx.read("a")

    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)


def test_event_log_tvf(spark, tmp_path):
    """The reference's documented event-log queries run verbatim
    (``dlt_bronze_to_silver.py:234``, ``quality_monitoring.py:142``):
    event_log(TABLE(t)) filtered to flow_progress returns the run's
    pass/drop counts, and the Databricks details:<path> extraction
    resolves through the dialect layer."""
    import json

    from databricks_delta_lake_project_spark.queries.sqlpack import (
        run_statement,
    )

    p = Pipeline(str(tmp_path / "lake"))

    @p.table(name="clean_customers", expectations=[
        QualityRule("valid_id", "id IS NOT NULL", Action.DROP),
        QualityRule("has_x", "x > 0", Action.WARN),
    ])
    def clean_customers(ctx):
        return ctx.spark.createDataFrame(
            [(1, 10.0), (2, -1.0), (None, 30.0)], "id long, x double"
        )

    p.run(spark)
    rows = run_statement(
        spark,
        "SELECT * FROM "
        "event_log(TABLE(customer_360_catalog.silver.clean_customers)) "
        "WHERE event_type = 'flow_progress'",
    ).collect()
    assert len(rows) == 1
    ev = rows[0]
    assert ev["level"] == "INFO" and "COMPLETED" in ev["message"]
    details = json.loads(ev["details"])
    dq = details["flow_progress"]["data_quality"]
    assert dq["dropped_records"] == 1  # the null id
    by_name = {e["name"]: e for e in dq["expectations"]}
    assert by_name["valid_id"]["failed_records"] == 1
    assert by_name["has_x"]["failed_records"] == 1  # warn counts too
    assert by_name["valid_id"]["passed_records"] == 2

    # the expectation-metrics form with the details:<path> operator
    out = run_statement(
        spark,
        "SELECT details:flow_progress.data_quality.expectations "
        "AS expectations, timestamp "
        "FROM event_log(TABLE(customer_360_catalog.silver.clean_customers)) "
        "WHERE event_type = 'flow_progress' ORDER BY timestamp DESC",
    ).collect()
    assert len(out) == 1
    exps = json.loads(out[0]["expectations"])
    assert {e["name"] for e in exps} == {"valid_id", "has_x"}

    # an unrun table has an EMPTY event log, not an error
    assert (
        run_statement(
            spark, "SELECT * FROM event_log(TABLE(never_ran))"
        ).count()
        == 0
    )

    # a second run appends a second event (sequence increments)
    p.run(spark)
    seqs = [
        r["sequence"]
        for r in run_statement(
            spark,
            "SELECT sequence FROM event_log(TABLE(clean_customers)) "
            "ORDER BY sequence",
        ).collect()
    ]
    assert seqs == [0, 1]


def test_event_log_and_details_quote_safety(spark):
    """String literals containing event_log(...) or details:<path>
    must pass through untouched (both rewrites are quote-aware)."""
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        run_statement,
    )

    row = run_statement(
        spark,
        "SELECT 'see event_log(TABLE(x)) docs' AS tip, "
        "'details:abc at 12:30' AS note",
    ).collect()[0]
    assert row["tip"] == "see event_log(TABLE(x)) docs"
    assert row["note"] == "details:abc at 12:30"
    # qualified extraction works outside quotes
    out = run_statement(
        spark,
        "SELECT e.details:a.b AS v FROM "
        "(SELECT '{\"a\": {\"b\": 7}}' AS details) e",
    ).collect()[0]
    assert out["v"] == "7"


def test_details_path_multipart_qualifiers(spark):
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        normalize_sql,
    )

    assert normalize_sql("SELECT db.tbl.details:a.b FROM db.tbl") == (
        "SELECT get_json_object(db.tbl.details, '$.a.b') FROM db.tbl"
    )
    assert normalize_sql("SELECT `e`.details:x FROM t e") == (
        "SELECT get_json_object(`e`.details, '$.x') FROM t e"
    )


def test_event_log_durable_across_sessions(spark, tmp_path):
    """spark.engine.eventLog.path makes flow_progress events survive
    the session: a fresh session (cleared buffer) still serves the
    prior run's history from the Delta-backed event table."""
    from databricks_delta_lake_project_spark.quality import event_log
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        run_statement,
    )
    from databricks_delta_lake_project_spark.session import session_key

    log_path = str(tmp_path / "event_log_table")
    spark.conf.set(event_log.PATH_CONF, log_path)
    try:
        p = Pipeline(str(tmp_path / "lake"))

        @p.table(name="durable_flow", expectations=[
            QualityRule("pos", "x > 0", Action.DROP),
        ])
        def durable_flow(ctx):
            return ctx.spark.createDataFrame(
                [(1.0,), (-2.0,), (3.0,)], "x double"
            )

        p.run(spark)
        # simulate a fresh session: the in-memory buffer is gone
        event_log._EVENTS.pop(session_key(spark), None)
        rows = run_statement(
            spark,
            "SELECT flow_name, event_type, details FROM "
            "event_log(TABLE(durable_flow)) "
            "WHERE event_type = 'flow_progress'",
        ).collect()
        assert len(rows) == 1
        assert rows[0]["flow_name"] == "durable_flow"
        import json as _json

        dq = _json.loads(rows[0]["details"])["flow_progress"]["data_quality"]
        assert dq["dropped_records"] == 1
        # a SECOND run in the "new" session composes: buffer + table
        p.run(spark)
        rows = run_statement(
            spark,
            "SELECT sequence FROM event_log(TABLE(durable_flow)) "
            "WHERE event_type = 'flow_progress'",
        ).collect()
        assert len(rows) == 2
    finally:
        spark.conf.unset(event_log.PATH_CONF)


def test_event_log_same_basename_distinct_pipelines(spark, tmp_path):
    """Two pipelines whose nodes share a basename keep SEPARATE event
    histories when the TVF reference resolves to a registered table:
    the match anchors on the materialized path, not the basename."""
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        run_statement,
    )
    from databricks_delta_lake_project_spark.tables import sqldml

    made = {}
    for tag, n in (("alpha", 2), ("beta", 5)):
        p = Pipeline(str(tmp_path / tag))

        @p.table(name="events_clean")
        def events_clean(ctx, _n=n):
            return ctx.spark.range(_n).withColumnRenamed("id", "v")

        p.run(spark)
        made[tag] = str(tmp_path / tag / "events_clean")

    sqldml.register_table(
        spark, "alpha.gold.events_clean",
        LakeTable.for_path(spark, made["alpha"]),
    )
    sqldml.register_table(
        spark, "beta.gold.events_clean",
        LakeTable.for_path(spark, made["beta"]),
    )
    try:
        for tag, n in (("alpha", 2), ("beta", 5)):
            rows = run_statement(
                spark,
                "SELECT details FROM "
                f"event_log(TABLE({tag}.gold.events_clean)) "
                "WHERE event_type = 'flow_progress'",
            ).collect()
            assert len(rows) == 1, f"{tag}: conflated histories"
            import json as _json

            m = _json.loads(rows[0]["details"])["flow_progress"]["metrics"]
            assert m["num_output_rows"] == n
        # an UNRESOLVABLE reference still falls back to the basename
        # rule (both pipelines' events, like before)
        rows = run_statement(
            spark,
            "SELECT id FROM event_log(TABLE(events_clean)) "
            "WHERE event_type = 'flow_progress'",
        ).collect()
        assert len(rows) in (1, 2)
    finally:
        from databricks_delta_lake_project_spark.tables.sqldml import _skey

        sqldml._REGISTRY.pop(_skey(spark, "alpha.gold.events_clean"), None)
        sqldml._REGISTRY.pop(_skey(spark, "beta.gold.events_clean"), None)


@pytest.mark.slow
def test_event_log_probe_stays_bounded(spark, tmp_path, monkeypatch):
    """With MANY flows journaled to one durable event table, the TVF's
    durable probe for a path-resolvable reference is ONE prunable
    equality (``path = ...``) — never an OR shape that defeats
    file-level stats pruning and scans every file; the OR-of-LIKE
    basename probe runs only for unresolvable references, and is
    bounded at two disjuncts regardless of flow count."""
    from databricks_delta_lake_project_spark.quality import event_log
    from databricks_delta_lake_project_spark.session import session_key
    from databricks_delta_lake_project_spark.tables import sqldml

    log_path = str(tmp_path / "event_log_many")
    spark.conf.set(event_log.PATH_CONF, log_path)
    try:
        p = Pipeline(str(tmp_path / "lake"))
        for i in range(12):

            @p.table(name=f"flow_{i}")
            def flow(ctx, _i=i):
                return ctx.spark.range(_i + 1).withColumnRenamed("id", "v")

        p.run(spark)
        sqldml.register_table(
            spark,
            "m.g.flow_3",
            LakeTable.for_path(spark, str(tmp_path / "lake" / "flow_3")),
        )
        # durable-only reads (fresh-session shape)
        event_log._EVENTS.pop(session_key(spark), None)
        conds: list[str] = []
        real = LakeTable.read_where

        def spy(self, condition):
            conds.append(condition)
            return real(self, condition)

        monkeypatch.setattr(LakeTable, "read_where", spy)
        rows = event_log.events_df(spark, "m.g.flow_3").collect()
        assert {r["flow_name"] for r in rows} == {"flow_3"}
        assert len(conds) == 1
        assert conds[0].startswith("path = ") and " OR " not in conds[0]
        # unresolvable reference: basename fallback, two disjuncts
        conds.clear()
        rows = event_log.events_df(spark, "flow_7").collect()
        assert {r["flow_name"] for r in rows} == {"flow_7"}
        assert len(conds) == 1
        assert conds[0].count(" OR ") == 1
    finally:
        spark.conf.unset(event_log.PATH_CONF)
        from databricks_delta_lake_project_spark.tables.sqldml import _skey

        sqldml._REGISTRY.pop(_skey(spark, "m.g.flow_3"), None)
