"""Persistent views (beyond the reference repo's surface; UC view
semantics): CREATE/DROP/SHOW VIEWS DDL, per-statement re-analysis (a
view always reads the underlying tables' CURRENT snapshot), UC's
owner's-rights ACL model (creator needs SELECT on the body's tables,
queriers need SELECT on the VIEW only), durable catalog-registry
persistence, and lineage that composes through view bodies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.governance import (
    access_control as acl,
    catalog_registry,
)
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml


@pytest.fixture()
def view_world(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "vord"),
        df=spark.range(10).withColumn("amount", F.col("id") * 2.0),
    )
    sqldml.register_table(spark, "vcat.gold.vord", t)
    sid = session_key(spark)
    yield t
    sqldml._REGISTRY.pop((sid, "vcat.gold.vord"), None)
    for key in [k for k in sqldml._VIEW_DEFS if k[0] == sid]:
        sqldml._VIEW_DEFS.pop(key, None)


def test_view_ddl_freshness_and_composition(spark, view_world, tmp_path):
    """CREATE VIEW binds a named, re-analyzed-per-statement view:
    mutations to the underlying table show up immediately, views
    compose over views, OR REPLACE swaps the definition, IF NOT EXISTS
    no-ops, DROP removes it, SHOW VIEWS and
    information_schema.tables list it."""
    out = run_statement(
        spark,
        "CREATE VIEW vcat.gold.big_orders (oid, dbl) "
        "COMMENT 'doubled big orders' AS "
        "SELECT id, amount * 2 FROM vord WHERE amount > 4",
    ).collect()[0]
    assert (out["view"], out["created"]) == ("vcat.gold.big_orders", 1)
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM big_orders"
        ).collect()[0]["n"]
        == 7
    )
    # FRESHNESS: the definition re-analyzes per statement, so DML on
    # the underlying table is visible without re-creating the view
    run_statement(spark, "DELETE FROM vord WHERE id >= 8")
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM big_orders"
        ).collect()[0]["n"]
        == 5
    )
    # view over view
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.big2 AS "
        "SELECT dbl FROM big_orders WHERE dbl > 20",
    )
    assert (
        run_statement(spark, "SELECT count(*) AS n FROM big2").collect()[
            0
        ]["n"]
        == 2
    )
    shows = {
        (r["namespace"], r["viewName"])
        for r in run_statement(spark, "SHOW VIEWS").collect()
    }
    assert ("vcat.gold", "big_orders") in shows
    assert ("vcat.gold", "big2") in shows
    # the COMMENT clause is stored (durable payload)
    assert (
        sqldml._VIEW_DEFS[(session_key(spark), "vcat.gold.big_orders")][
            "comment"
        ]
        == "doubled big orders"
    )
    # namespace-scoped listing
    assert {
        r["viewName"]
        for r in run_statement(spark, "SHOW VIEWS IN vcat.gold").collect()
    } >= {"big_orders", "big2"}
    ist = {
        tuple(r)
        for r in run_statement(
            spark,
            "SELECT table_catalog, table_schema, table_name, table_type "
            "FROM system.information_schema.tables "
            "WHERE table_type = 'VIEW'",
        ).collect()
    }
    assert ("vcat", "gold", "big_orders", "VIEW") in ist
    # IF NOT EXISTS no-ops; plain CREATE refuses; OR REPLACE swaps
    assert (
        run_statement(
            spark,
            "CREATE VIEW IF NOT EXISTS vcat.gold.big_orders AS "
            "SELECT id FROM vord",
        ).collect()[0]["created"]
        == 0
    )
    with pytest.raises(ValueError, match="already exists"):
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.big_orders AS SELECT id FROM vord",
        )
    run_statement(
        spark,
        "CREATE OR REPLACE VIEW vcat.gold.big2 AS SELECT oid FROM "
        "big_orders",
    )
    assert run_statement(spark, "SELECT * FROM big2").columns == ["oid"]
    # name collision with a registered table refuses — both directions
    with pytest.raises(ValueError, match="collides"):
        run_statement(
            spark,
            "CREATE VIEW other.ns.vord AS SELECT 1 AS x",
        )
    with pytest.raises(ValueError, match="collides"):
        sqldml.register_table(
            spark, "other.ns.big_orders", view_world
        )
    # a self-referential body would freeze the PREVIOUS definition's
    # plan: refused
    with pytest.raises(ValueError, match="references itself"):
        run_statement(
            spark,
            "CREATE OR REPLACE VIEW vcat.gold.big_orders AS "
            "SELECT oid FROM big_orders WHERE oid > 1",
        )
    # views sharing a basename would silently shadow each other
    with pytest.raises(ValueError, match="collides with view"):
        run_statement(
            spark,
            "CREATE VIEW other.ns.big2 AS SELECT 1 AS x",
        )
    # DROP
    run_statement(spark, "DROP VIEW vcat.gold.big2")
    assert not [
        r
        for r in run_statement(spark, "SHOW VIEWS").collect()
        if r["viewName"] == "big2"
    ]
    # CREATE TEMPORARY VIEW stays native Spark (not registered with
    # the engine, but native SHOW VIEWS output is preserved: the temp
    # view lists with isTemporary=true)
    run_statement(
        spark, "CREATE TEMPORARY VIEW tview AS SELECT 1 AS one"
    )
    assert (session_key(spark), "tview") not in sqldml._VIEW_DEFS
    trows = [
        r
        for r in run_statement(spark, "SHOW VIEWS").collect()
        if r["viewName"] == "tview"
    ]
    assert trows and trows[0]["isTemporary"]
    spark.catalog.dropTempView("tview")
    # a DIALECT body (DATEADD) validates AND re-analyzes: the stored
    # definition is the normalized text, so freshness survives syncs
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.recent AS SELECT id FROM vord "
        "WHERE current_date() < DATEADD(DAY, 10000, current_date())",
    )
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM recent"
        ).collect()[0]["n"]
        == 8
    )
    # a broken view FAILS CLOSED: drop the underlying table's
    # registration and the view stops serving (no stale frozen plan),
    # while other statements keep working
    import warnings as _w

    saved = sqldml._REGISTRY.pop(
        (session_key(spark), "vcat.gold.vord")
    )
    try:
        spark.catalog.dropTempView("vord")
        with _w.catch_warnings():
            _w.simplefilter("ignore")
            with pytest.raises(Exception):
                run_statement(
                    spark, "SELECT count(*) AS n FROM recent"
                ).collect()
            assert (
                run_statement(spark, "SELECT 1 AS ok").collect()[0]["ok"]
                == 1
            )
    finally:
        sqldml._REGISTRY[(session_key(spark), "vcat.gold.vord")] = saved


def test_view_lineage_composes_to_real_tables(
    spark, view_world, tmp_path
):
    """A CTAS reading a view records the VIEW as its table-level
    source (source_type VIEW) while COLUMN lineage expands through the
    view body to the real table columns; CREATE VIEW itself records
    underlying-table -> view edges."""
    from databricks_delta_lake_project_spark.queries import sqlpack

    run_statement(
        spark,
        "CREATE VIEW vcat.gold.vbig AS "
        "SELECT id, amount * 2 AS dbl FROM vord WHERE amount > 4",
    )
    run_statement(
        spark,
        f"CREATE TABLE vcat.silver.vsnap USING delta LOCATION "
        f"'{tmp_path / 'vsnap'}' AS SELECT dbl AS d2, id FROM vbig",
    )
    tl = {
        tuple(r)
        for r in run_statement(
            spark,
            "SELECT source_table_full_name, source_type, "
            "target_table_full_name FROM system.lineage.table_lineage",
        ).collect()
    }
    assert ("vcat.gold.vord", "TABLE", "vcat.gold.vbig") in tl
    assert ("vcat.gold.vbig", "VIEW", "vcat.silver.vsnap") in tl
    cl = sorted(
        tuple(r)
        for r in run_statement(
            spark,
            "SELECT source_table_full_name, source_column_name, "
            "target_column_name FROM system.lineage.column_lineage "
            "WHERE target_table_full_name = 'vcat.silver.vsnap'",
        ).collect()
    )
    assert cl == [
        ("vcat.gold.vord", "amount", "d2"),
        ("vcat.gold.vord", "id", "id"),
    ]
    # MERGE USING a view expands the same way
    tgt = LakeTable.create(
        spark,
        str(tmp_path / "vm"),
        df=spark.createDataFrame([(1, 0.0)], "id long, amount double"),
    )
    sqldml.register_table(spark, "vcat.silver.vm", tgt)
    try:
        edges = sorted(
            sqlpack._merge_column_lineage_edges(
                spark,
                "MERGE INTO vcat.silver.vm t USING vbig s "
                "ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET amount = s.dbl",
                "vcat.silver.vm",
            )
        )
        assert edges == [("vcat.gold.vord", "amount", "amount")]
    finally:
        sqldml._REGISTRY.pop((session_key(spark), "vcat.silver.vm"), None)


def test_view_acl_owner_rights(spark, view_world):
    """UC's owner's-rights model: the CREATOR must hold SELECT on the
    body's tables (checked once, at definition); queriers need SELECT
    on the VIEW only — no grant on the underlying table required."""
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "owner")
    spark.conf.set(acl.ADMINS_CONF, "owner")
    try:
        for g in (
            "GRANT USAGE ON CATALOG vcat TO owner",
            "GRANT USAGE ON SCHEMA vcat.gold TO owner",
            "GRANT CREATE ON SCHEMA vcat.gold TO owner",
            "GRANT SELECT ON SCHEMA vcat.gold TO owner",
        ):
            run_statement(spark, g)
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.sview AS "
            "SELECT id FROM vord WHERE amount > 4",
        )
        run_statement(
            spark, "GRANT SELECT ON TABLE vcat.gold.sview TO reader"
        )
        run_statement(spark, "GRANT USAGE ON CATALOG vcat TO reader")
        run_statement(spark, "GRANT USAGE ON SCHEMA vcat.gold TO reader")
        spark.conf.set(acl.PRINCIPAL_CONF, "reader")
        # reader holds NOTHING on vcat.gold.vord, but the view grant
        # suffices
        assert (
            run_statement(
                spark, "SELECT count(*) AS n FROM sview"
            ).collect()[0]["n"]
            == 7
        )
        with pytest.raises(PermissionError):
            run_statement(spark, "SELECT * FROM vord")
        # an unprivileged principal cannot CREATE a view over tables
        # it cannot read
        spark.conf.set(acl.PRINCIPAL_CONF, "intruder")
        with pytest.raises(PermissionError):
            run_statement(
                spark,
                "CREATE VIEW vcat.gold.leak AS SELECT id FROM vord",
            )
        # ...nor REPLACE someone else's view (ownership/manage gate),
        # nor hide a runtime-built name in a view body
        spark.conf.set(acl.PRINCIPAL_CONF, "reader")
        with pytest.raises(PermissionError):
            run_statement(
                spark,
                "CREATE OR REPLACE VIEW vcat.gold.sview AS "
                "SELECT 1 AS x",
            )
        spark.conf.set(acl.PRINCIPAL_CONF, "owner")
        with pytest.raises(PermissionError, match=r"IDENTIFIER\(\)"):
            run_statement(
                spark,
                "CREATE VIEW vcat.gold.dyn AS "
                "SELECT * FROM IDENTIFIER('vo' || 'rd')",
            )
        # no existence oracle: an unprivileged principal gets the SAME
        # PermissionError for an existing and a missing view name
        spark.conf.set(acl.PRINCIPAL_CONF, "intruder")
        for nm in ("sview", "nosuchview"):
            with pytest.raises(PermissionError):
                run_statement(
                    spark,
                    f"CREATE VIEW IF NOT EXISTS vcat.gold.{nm} AS "
                    "SELECT 1 AS x",
                )
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)
        acl._GRANTS.clear()


def test_drop_schema_cascade_removes_views(spark, view_world):
    """DROP SCHEMA CASCADE clears contained views from the session
    registry (no ghost SHOW VIEWS rows, no permanent basename squat);
    RESTRICT counts a contained view as a child."""
    run_statement(
        spark,
        "CREATE VIEW vxc.s.only_view AS SELECT id FROM vord",
    )
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP SCHEMA vxc.s")
    run_statement(spark, "DROP SCHEMA vxc.s CASCADE")
    assert (session_key(spark), "vxc.s.only_view") not in sqldml._VIEW_DEFS
    assert not [
        r
        for r in run_statement(spark, "SHOW VIEWS").collect()
        if r["viewName"] == "only_view"
    ]
    # the basename is free again
    sqldml.register_table(spark, "other.ns.only_view", view_world)
    sqldml._REGISTRY.pop((session_key(spark), "other.ns.only_view"), None)


def test_view_durable_across_sessions(spark, view_world, tmp_path):
    """spark.engine.catalogRegistry.path persists view definitions: a
    fresh session (cleared dict) re-resolves the view from the durable
    registry on first touch; DROP VIEW tombstones it."""
    reg = str(tmp_path / "catreg")
    spark.conf.set(catalog_registry.PATH_CONF, reg)
    sid = session_key(spark)
    try:
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.dview AS "
            "SELECT id FROM vord WHERE amount > 10",
        )
        # fresh session: definitions gone, loaded-marker cleared
        sqldml._VIEW_DEFS.pop((sid, "vcat.gold.dview"), None)
        catalog_registry._LOADED.pop(sid, None)
        assert (
            run_statement(
                spark, "SELECT count(*) AS n FROM dview"
            ).collect()[0]["n"]
            == 4
        )
        # DROP tombstones on disk too
        run_statement(spark, "DROP VIEW vcat.gold.dview")
        sqldml._VIEW_DEFS.pop((sid, "vcat.gold.dview"), None)
        catalog_registry._LOADED.pop(sid, None)
        catalog_registry.ensure_loaded(spark)
        assert (sid, "vcat.gold.dview") not in sqldml._VIEW_DEFS
    finally:
        spark.conf.unset(catalog_registry.PATH_CONF)
        catalog_registry._LOADED.pop(sid, None)
        catalog_registry._ADDS.pop(sid, None)
        catalog_registry._DELS.pop(sid, None)
        catalog_registry._PDELS.pop(sid, None)


def test_show_create_view(spark, view_world):
    """SHOW CREATE TABLE/VIEW over a persistent view reconstructs the
    CREATE statement from the stored definition (cols + comment +
    normalized body)."""
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.scv (a, b) COMMENT 'summed view' AS "
        "SELECT id, amount FROM vord",
    )
    stmt = run_statement(
        spark, "SHOW CREATE VIEW vcat.gold.scv"
    ).collect()[0]["createtab_stmt"]
    assert stmt.startswith("CREATE VIEW vcat.gold.scv (a, b)")
    assert "COMMENT 'summed view'" in stmt
    assert "SELECT id, amount FROM vord" in stmt
    # the reconstruction round-trips: drop, replay, same rows
    run_statement(spark, "DROP VIEW vcat.gold.scv")
    run_statement(spark, stmt)
    assert (
        run_statement(spark, "SELECT count(*) AS n FROM scv").collect()[
            0
        ]["n"]
        == 10
    )
    # SHOW CREATE TABLE spelling resolves views too
    assert run_statement(
        spark, "SHOW CREATE TABLE scv"
    ).collect()[0]["createtab_stmt"] == stmt


def test_show_views_no_engine_binding_leak(spark, view_world):
    """Native SHOW VIEWS rows are filtered of ENGINE-owned temp-view
    bindings: a registered table's resolution binding never lists as a
    view, and a persistent view lists exactly once (namespace row,
    isTemporary=false) — while a user's own temp view still shows."""
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.lk AS SELECT id FROM vord",
    )
    spark.sql("CREATE TEMPORARY VIEW user_own AS SELECT 1 AS x")
    try:
        rows = run_statement(spark, "SHOW VIEWS").collect()
        names = [(r["viewName"], r["isTemporary"]) for r in rows]
        assert names.count(("lk", False)) == 1
        assert ("lk", True) not in names  # never double-listed
        assert ("vord", True) not in names  # table binding is plumbing
        assert ("user_own", True) in names  # user temp views remain
    finally:
        spark.catalog.dropTempView("user_own")


def test_short_named_view_over_engine_table(spark, view_world):
    """A 1-part view whose body reads an ENGINE table lands in the
    engine (native permanent views cannot reference temp bindings);
    a 1-part view over purely native objects stays native."""
    run_statement(spark, "CREATE VIEW shortv AS SELECT id FROM vord")
    assert (session_key(spark), "shortv") in sqldml._VIEW_DEFS
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM shortv"
        ).collect()[0]["n"]
        == 10
    )
    run_statement(spark, "DROP VIEW shortv")
    assert (session_key(spark), "shortv") not in sqldml._VIEW_DEFS


def test_group_membership_view_stays_fresh(spark, view_world):
    """A view body using IS_ACCOUNT_GROUP_MEMBER flags the session so
    the membership UDF re-registers with the CURRENT groups conf
    before every sync — group changes apply without re-creating the
    view."""
    from databricks_delta_lake_project_spark.functions.masking import (
        GROUPS_CONF_KEY,
    )

    spark.conf.set(GROUPS_CONF_KEY, "pii_team")
    try:
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.gated AS SELECT id FROM vord "
            "WHERE IS_ACCOUNT_GROUP_MEMBER('pii_team')",
        )
        assert session_key(spark) in sqldml._MASKED_SESSIONS
        assert (
            run_statement(
                spark, "SELECT count(*) AS n FROM gated"
            ).collect()[0]["n"]
            == 10
        )
        # leave the group: the NEXT statement re-binds the UDF and the
        # view serves nothing
        spark.conf.set(GROUPS_CONF_KEY, "other_team")
        assert (
            run_statement(
                spark, "SELECT count(*) AS n FROM gated"
            ).collect()[0]["n"]
            == 0
        )
    finally:
        spark.conf.unset(GROUPS_CONF_KEY)


def test_view_sync_referenced_only_and_version_keyed(
    spark, view_world, monkeypatch
):
    """The per-statement view sync is LAZY and VERSION-KEYED: a
    statement re-analyzes only the views it references (plus their
    transitive view deps), and only when their freshness key moved —
    an unchanged underlying table re-analyzes nothing. Observed by
    counting spark.sql calls that analyze a stored view body."""
    sid = session_key(spark)
    run_statement(
        spark, "CREATE VIEW vcat.gold.lv1 AS SELECT id FROM vord"
    )
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.lv2 AS SELECT amount FROM vord",
    )
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.lvv AS SELECT id FROM lv1 WHERE id > 0",
    )
    bodies = {
        n: meta["sql"]
        for (s, n), meta in sqldml._VIEW_DEFS.items()
        if s == sid and n.startswith("vcat.gold.lv")
    }
    by_body = {sql: n for n, sql in bodies.items()}
    analyzed: list[str] = []
    real_sql = spark.sql

    def counting_sql(q, *a, **k):
        if isinstance(q, str) and q in by_body:
            analyzed.append(by_body[q])
        return real_sql(q, *a, **k)

    monkeypatch.setattr(spark, "sql", counting_sql)

    # first touch after CREATE: exactly the referenced view analyzes
    # (the CREATE-time bind carries no freshness key), siblings do not
    run_statement(spark, "SELECT count(*) AS n FROM lv2")
    assert analyzed == ["vcat.gold.lv2"]
    # repeat with nothing changed: the keyed binding is reused
    analyzed.clear()
    run_statement(spark, "SELECT count(*) AS n FROM lv2")
    assert analyzed == []
    # a view-over-view statement binds the view; its dep lv1 was
    # already analyzed and KEYED by lvv's own CREATE sync (the body
    # references it), so the keyed binding is reused
    analyzed.clear()
    run_statement(spark, "SELECT count(*) AS n FROM lvv")
    assert analyzed == ["vcat.gold.lvv"]
    analyzed.clear()
    run_statement(spark, "SELECT count(*) AS n FROM lvv")
    assert analyzed == []
    # the underlying table moves: the next statement referencing the
    # view chain re-analyzes it (dep first propagation), the
    # unreferenced sibling stays untouched
    run_statement(spark, "DELETE FROM vord WHERE id >= 8")
    analyzed.clear()
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM lvv"
        ).collect()[0]["n"]
        == 7
    )
    assert sorted(analyzed) == ["vcat.gold.lv1", "vcat.gold.lvv"]
    # the sibling's key moved too — but only ITS statement pays
    analyzed.clear()
    run_statement(spark, "SELECT count(*) AS n FROM lv2")
    assert analyzed == ["vcat.gold.lv2"]


def test_view_self_reference_narrowed_to_from_position(
    spark, view_world
):
    """The self-reference refusal scans FROM/USING/JOIN positions, not
    all tokens: a COLUMN that merely shares the view's basename
    creates fine; a FROM-position self-reference (bare or dotted)
    still refuses; a CTE sharing the name shadows it legally."""
    out = run_statement(
        spark,
        "CREATE VIEW vcat.gold.amount AS SELECT amount FROM vord",
    ).collect()[0]
    assert out["created"] == 1
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM amount"
        ).collect()[0]["n"]
        == 10
    )
    with pytest.raises(ValueError, match="references itself"):
        run_statement(
            spark,
            "CREATE OR REPLACE VIEW vcat.gold.amount AS "
            "SELECT amount FROM amount",
        )
    with pytest.raises(ValueError, match="references itself"):
        run_statement(
            spark,
            "CREATE OR REPLACE VIEW vcat.gold.amount AS "
            "SELECT amount FROM vcat.gold.amount",
        )
    # a CTE named like the view shadows it inside the body — legal
    out = run_statement(
        spark,
        "CREATE OR REPLACE VIEW vcat.gold.amount AS "
        "WITH amount AS (SELECT id FROM vord WHERE id < 3) "
        "SELECT id FROM amount",
    ).collect()[0]
    assert out["created"] == 1
    assert (
        run_statement(
            spark, "SELECT count(*) AS n FROM amount"
        ).collect()[0]["n"]
        == 3
    )


def test_failed_view_invalidates_bound_dependents(spark, tmp_path):
    """Fail-closed must PROPAGATE: when a view's body stops analyzing
    (its table is gone) the views bound OVER it must not keep serving
    their frozen plans — the next reference re-analyzes and fails."""
    import shutil
    import warnings as _w

    t = LakeTable.create(
        spark, str(tmp_path / "dep_t"), df=spark.range(5)
    )
    sqldml.register_table(spark, "vcat.gold.dep_t", t)
    run_statement(
        spark, "CREATE VIEW vcat.gold.dep_a AS SELECT * FROM dep_t"
    )
    run_statement(
        spark, "CREATE VIEW vcat.gold.dep_b AS SELECT * FROM dep_a"
    )
    assert run_statement(spark, "SELECT * FROM dep_b").count() == 5

    # the table vanishes out from under the chain
    sid = session_key(spark)
    sqldml._REGISTRY.pop((sid, "vcat.gold.dep_t"))
    spark.catalog.dropTempView("dep_t")
    shutil.rmtree(t.root)

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        with pytest.raises(Exception):
            run_statement(spark, "SELECT * FROM dep_b").collect()
    for key in [k for k in sqldml._VIEW_DEFS if k[0] == sid]:
        sqldml._VIEW_DEFS.pop(key, None)
    sqldml._BOUND_VIEWS.pop((sid, "vcat.gold.dep_a"), None)
    sqldml._BOUND_VIEWS.pop((sid, "vcat.gold.dep_b"), None)


def test_view_over_global_temp_stays_fresh(spark, tmp_path, view_world):
    """A body reading a relation the engine cannot version (here a
    global_temp view) re-analyzes per statement — replacing the
    relation shows up immediately instead of serving the bound plan."""
    spark.range(3).createOrReplaceGlobalTempView("gfresh")
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.vg AS SELECT * FROM global_temp.gfresh",
    )
    assert run_statement(spark, "SELECT * FROM vg").count() == 3
    spark.range(7).createOrReplaceGlobalTempView("gfresh")
    assert run_statement(spark, "SELECT * FROM vg").count() == 7
    spark.catalog.dropGlobalTempView("gfresh")


def test_view_over_engine_function_stays_fresh(spark, view_world):
    """CREATE OR REPLACE FUNCTION must reach views that call it: a
    bound plan inlined the OLD body and no table version moves, so
    function-calling views are volatile, never keyed-skipped."""
    run_statement(
        spark,
        "CREATE FUNCTION vcat.gold.rate(x DOUBLE) RETURNS DOUBLE "
        "RETURN x * 0.1",
    )
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.vrate AS "
        "SELECT id, rate(amount) AS r FROM vord WHERE id = 1",
    )
    assert run_statement(spark, "SELECT r FROM vrate").collect()[0][
        "r"
    ] == pytest.approx(0.2)
    run_statement(
        spark,
        "CREATE OR REPLACE FUNCTION vcat.gold.rate(x DOUBLE) "
        "RETURNS DOUBLE RETURN x * 0.5",
    )
    assert run_statement(spark, "SELECT r FROM vrate").collect()[0][
        "r"
    ] == pytest.approx(1.0)


def test_view_over_native_temp_function_stays_fresh(
    spark, view_world, monkeypatch
):
    """A view calling a temp function created NATIVELY (raw
    spark.sql, outside the engine's DDL path) must never serve a
    stale inlined body: such calls are neither Spark builtins nor in
    the engine's function registry, so the view is disqualified from
    keyed skipping — while a sibling view calling only builtins keeps
    the keyed fast path (analysis-counter proven)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION nat_rate(x DOUBLE) "
        "RETURNS DOUBLE RETURN x * 0.1"
    )
    try:
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.vnat AS "
            "SELECT id, nat_rate(amount) AS r FROM vord WHERE id = 1",
        )
        run_statement(
            spark,
            "CREATE VIEW vcat.gold.vbuiltin AS "
            "SELECT count(*) AS n, sum(amount) AS s FROM vord",
        )
        sid = session_key(spark)
        bodies = {
            meta["sql"]: n
            for (s, n), meta in sqldml._VIEW_DEFS.items()
            if s == sid and n.startswith("vcat.gold.v")
        }
        analyzed: list[str] = []
        real_sql = spark.sql

        def counting_sql(q, *a, **k):
            if isinstance(q, str) and q in bodies:
                analyzed.append(bodies[q])
            return real_sql(q, *a, **k)

        monkeypatch.setattr(spark, "sql", counting_sql)

        assert run_statement(spark, "SELECT r FROM vnat").collect()[
            0
        ]["r"] == pytest.approx(0.2)
        # REPLACE the function natively — no engine DDL, no table
        # version moves; the next statement must see the new body
        real_sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION nat_rate(x DOUBLE) "
            "RETURNS DOUBLE RETURN x * 0.5"
        )
        assert run_statement(spark, "SELECT r FROM vnat").collect()[
            0
        ]["r"] == pytest.approx(1.0)
        # the unknown-call view re-analyzed on BOTH statements
        assert analyzed.count("vcat.gold.vnat") == 2
        # ...while the builtin-only sibling still keyed-skips
        analyzed.clear()
        run_statement(spark, "SELECT n FROM vbuiltin")
        assert analyzed == ["vcat.gold.vbuiltin"]
        analyzed.clear()
        run_statement(spark, "SELECT n FROM vbuiltin")
        assert analyzed == []
    finally:
        spark.sql("DROP TEMPORARY FUNCTION IF EXISTS nat_rate")


def test_call_position_refs_keyword_shapes():
    """The call-position scanner must not read keyword-paren shapes
    or AS-aliased column lists as function calls (each false positive
    permanently forfeits keyed skipping for that view), while real
    unknown calls are still caught."""
    refs = sqldml.call_position_refs(
        "SELECT a, count(*) FROM t GROUP BY GROUPING SETS ((a), (b))"
    )
    assert "sets" not in refs and "count" in refs
    refs = sqldml.call_position_refs(
        "SELECT v.a FROM (VALUES (1, 2)) AS v(a, b)"
    )
    assert "v" not in refs
    refs = sqldml.call_position_refs(
        "SELECT my_fn(x) OVER (PARTITION BY y) FROM t"
    )
    assert refs == {"my_fn"}
    # string literals never contribute call tokens
    refs = sqldml.call_position_refs("SELECT 'not_a_call(x)' FROM t")
    assert "not_a_call" not in refs


def test_alter_view_as_redefines_in_place(spark, view_world):
    """ALTER VIEW v AS <query>: body swaps, comment survives, column
    list resets to the new query's output; unknown views fall through
    (native error); the manage gate applies via the replace path."""
    run_statement(
        spark,
        "CREATE VIEW vcat.gold.av (a) COMMENT 'kept' AS "
        "SELECT id FROM vord WHERE id < 3",
    )
    assert run_statement(spark, "SELECT * FROM av").columns == ["a"]
    run_statement(
        spark,
        "ALTER VIEW vcat.gold.av AS SELECT id, amount FROM vord "
        "WHERE id >= 8",
    )
    out = run_statement(spark, "SELECT * FROM av")
    assert out.columns == ["id", "amount"] and out.count() == 2
    # comment survived the redefinition
    stmt = run_statement(
        spark, "SHOW CREATE VIEW vcat.gold.av"
    ).collect()[0][0]
    assert "COMMENT 'kept'" in stmt and "id >= 8" in stmt
    with pytest.raises(Exception):
        run_statement(spark, "ALTER VIEW no_such_view_xyz AS SELECT 1")
