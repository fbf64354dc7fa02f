"""Durable governance registries (spark.engine.catalogRegistry.path):
catalogs/schemas/volumes, layer tags and SQL functions declared in one
session resolve in a fresh session — same opt-in write-through,
journal-merge and tombstone discipline as the durable grants registry
(UC's metastore is durable; the default in-memory registries are
session-scoped like the reference's notebook-run state)."""

from __future__ import annotations

import pytest

from databricks_delta_lake_project_spark.governance import (
    catalog_registry as creg,
    systables,
)
from databricks_delta_lake_project_spark.queries import sqlpack
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import metasql


def _fresh_session(spark):
    """Simulate a restart: all session registries gone, durable path
    conf still set (as a deployment's spark-defaults would be)."""
    sid = session_key(spark)
    metasql._NAMESPACES.pop(sid, None)
    systables._LAYER_TAGS.pop(sid, None)
    fmap = sqlpack._FUNCS.pop(sid, None)
    if fmap:
        for base in fmap.values():
            spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {base}")
    creg._LOADED.clear()
    creg._ADDS.clear()
    creg._DELS.clear()


def test_namespaces_and_volumes_persist(spark, tmp_path):
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    spark.conf.set(metasql.VOLUMES_ROOT_CONF, str(tmp_path / "vols"))
    try:
        run_statement(spark, "CREATE CATALOG dur_cat COMMENT 'c'")
        run_statement(spark, "CREATE SCHEMA dur_cat.bronze")
        run_statement(spark, "CREATE VOLUME dur_cat.bronze.land")
        _fresh_session(spark)
        # declared tree resolves after the restart
        cats = metasql.declared_namespaces(spark, "catalog")
        assert cats["dur_cat"]["comment"] == "c"
        assert "dur_cat.bronze" in metasql.declared_namespaces(
            spark, "schema"
        )
        assert metasql.volume_path(spark, "dur_cat.bronze.land")
        # IF NOT EXISTS sees the durable row (no duplicate create);
        # without the clause the loaded entry refuses loudly
        run_statement(spark, "CREATE CATALOG IF NOT EXISTS dur_cat")
        with pytest.raises(ValueError, match="already exists"):
            run_statement(spark, "CREATE CATALOG dur_cat")
    finally:
        spark.conf.unset(creg.PATH_CONF)
        spark.conf.unset(metasql.VOLUMES_ROOT_CONF)


def test_drop_tombstones_persist(spark, tmp_path):
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    spark.conf.set(metasql.VOLUMES_ROOT_CONF, str(tmp_path / "vols"))
    try:
        run_statement(spark, "CREATE CATALOG tomb_cat")
        run_statement(spark, "CREATE SCHEMA tomb_cat.silver")
        run_statement(spark, "CREATE VOLUME tomb_cat.silver.v")
        run_statement(spark, "DROP CATALOG tomb_cat CASCADE")
        _fresh_session(spark)
        assert "tomb_cat" not in metasql.declared_namespaces(
            spark, "catalog"
        )
        assert "tomb_cat.silver" not in metasql.declared_namespaces(
            spark, "schema"
        )
        with pytest.raises(ValueError, match="no such volume"):
            metasql.volume_path(spark, "tomb_cat.silver.v")
    finally:
        spark.conf.unset(creg.PATH_CONF)
        spark.conf.unset(metasql.VOLUMES_ROOT_CONF)


def test_layer_tags_persist(spark, tmp_path):
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(
            spark,
            "ALTER CATALOG tagcat SET TAGS "
            "('layer' = 'gold', 'owner' = 'data-eng')",
        )
        _fresh_session(spark)
        tags = systables.layer_tags(spark, "catalog")
        assert tags["tagcat"] == {"layer": "gold", "owner": "data-eng"}
        # unset-to-empty erases the durable row too
        run_statement(
            spark, "ALTER CATALOG tagcat UNSET TAGS ('layer', 'owner')"
        )
        _fresh_session(spark)
        assert "tagcat" not in systables.layer_tags(spark, "catalog")
    finally:
        spark.conf.unset(creg.PATH_CONF)


def test_sql_functions_persist(spark, tmp_path):
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(
            spark,
            "CREATE FUNCTION durcat.gold.mask_email(e STRING) RETURNS "
            "STRING RETURN concat('***@', split(e, '@')[1])",
        )
        _fresh_session(spark)
        row = run_statement(
            spark,
            "SELECT durcat.gold.mask_email('ann@corp.com') AS m",
        ).collect()[0]
        assert row["m"] == "***@corp.com"
        # a drop tombstones the durable row
        run_statement(spark, "DROP FUNCTION durcat.gold.mask_email")
        _fresh_session(spark)
        with pytest.raises(ValueError, match="no such function"):
            run_statement(spark, "DROP FUNCTION durcat.gold.mask_email")
    finally:
        spark.conf.unset(creg.PATH_CONF)
        _fresh_session(spark)


def test_rival_session_drop_stays_dropped(spark, tmp_path):
    """Journal-merge: session A re-persisting must not resurrect a
    namespace session B dropped on disk meanwhile (the same
    composition rule the durable grants registry follows)."""
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(spark, "CREATE CATALOG keep_cat")
        run_statement(spark, "CREATE CATALOG rival_cat")
        # --- session B: fresh state, drops rival_cat on disk
        loaded_a = dict(creg._LOADED)
        sid = session_key(spark)
        ns_a = dict(metasql._NAMESPACES.get(sid, {}))
        creg._LOADED.clear()
        metasql._NAMESPACES.pop(sid, None)
        run_statement(spark, "DROP CATALOG rival_cat")
        # --- back to session A's in-memory view (still holds both)
        creg._LOADED.clear()
        creg._LOADED.update(loaded_a)
        metasql._NAMESPACES[sid] = ns_a
        # A declares something new -> persist re-reads disk + journal
        run_statement(spark, "CREATE CATALOG a_new_cat")
        _fresh_session(spark)
        cats = metasql.declared_namespaces(spark, "catalog")
        assert "keep_cat" in cats and "a_new_cat" in cats
        assert "rival_cat" not in cats
    finally:
        spark.conf.unset(creg.PATH_CONF)


def test_no_conf_stays_session_only(spark, tmp_path):
    """Without the conf nothing touches disk (the default path pays
    zero I/O) and a restart loses the declaration."""
    run_statement(spark, "CREATE CATALOG ephemeral_cat")
    _fresh_session(spark)
    assert "ephemeral_cat" not in metasql.declared_namespaces(
        spark, "catalog"
    )
    assert not list(tmp_path.iterdir())


def test_declared_before_conf_lands_on_first_persist(spark, tmp_path):
    """Journaling is unconditional (like grants): objects declared
    BEFORE the conf is set land on the first write-through after."""
    run_statement(spark, "CREATE CATALOG early_cat")
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(spark, "CREATE CATALOG late_cat")
        _fresh_session(spark)
        cats = metasql.declared_namespaces(spark, "catalog")
        assert "early_cat" in cats and "late_cat" in cats
    finally:
        spark.conf.unset(creg.PATH_CONF)


def test_rival_tag_sessions_compose(spark, tmp_path):
    """Row-per-tag durability: two sessions tagging the same catalog
    merge instead of clobbering each other's keys."""
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(
            spark, "ALTER CATALOG shared SET TAGS ('layer' = 'gold')"
        )
        # --- session B: loads a fresh view, adds a DIFFERENT tag
        _fresh_session(spark)
        run_statement(
            spark, "ALTER CATALOG shared SET TAGS ('owner' = 'b-team')"
        )
        _fresh_session(spark)
        tags = systables.layer_tags(spark, "catalog")
        assert tags["shared"] == {"layer": "gold", "owner": "b-team"}
    finally:
        spark.conf.unset(creg.PATH_CONF)


def test_temporary_function_not_persisted(spark, tmp_path):
    """An explicit TEMPORARY function dies with the session even when
    the durable registry is on."""
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(
            spark,
            "CREATE TEMPORARY FUNCTION tcat.gold.tmp_fn(x INT) "
            "RETURNS INT RETURN x + 1",
        )
        _fresh_session(spark)
        assert not sqlpack._FUNCS.get(session_key(spark))
    finally:
        spark.conf.unset(creg.PATH_CONF)
        _fresh_session(spark)


def test_bad_function_row_warns_instead_of_bricking(spark, tmp_path):
    """A durable function row whose replay fails (two-session
    basename race) is skipped with a warning — the rest of the tree
    still loads; the session is not bricked."""
    import json as _json
    import warnings as _warnings

    from databricks_delta_lake_project_spark.tables import LakeTable

    path = str(tmp_path / "catreg")
    spark.conf.set(creg.PATH_CONF, path)
    try:
        run_statement(spark, "CREATE CATALOG good_cat")
        run_statement(
            spark,
            "CREATE FUNCTION c1.gold.dup_fn(x INT) RETURNS INT "
            "RETURN x",
        )
        # fabricate the rival row the in-session clash guard would
        # have refused: same basename under another full name
        t = LakeTable.for_path(spark, path)
        rows = t.to_df().collect()
        extra = (
            "function",
            "c2.gold.dup_fn",
            _json.dumps(
                {
                    "base": "dup_fn",
                    "sql": (
                        "CREATE FUNCTION c2.gold.dup_fn(x INT) "
                        "RETURNS INT RETURN x + 1"
                    ),
                }
            ),
        )
        t.overwrite(
            spark.createDataFrame(
                [tuple(r) for r in rows] + [extra], creg._SCHEMA
            )
        )
        _fresh_session(spark)
        with _warnings.catch_warnings(record=True) as w:
            _warnings.simplefilter("always")
            cats = metasql.declared_namespaces(spark, "catalog")
        assert "good_cat" in cats  # tree loaded despite the bad row
        assert any("dup_fn" in str(x.message) for x in w)
        # statements still run (session not bricked)
        assert run_statement(spark, "SELECT 1 AS ok").collect()[0]["ok"] == 1
    finally:
        spark.conf.unset(creg.PATH_CONF)
        _fresh_session(spark)


def test_drop_catalog_cascade_spares_same_named_connection(
    spark, tmp_path
):
    """Connections are a separate namespace: DROP CATALOG analytics
    CASCADE must not durably delete connection 'analytics'."""
    from databricks_delta_lake_project_spark.governance import federation

    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    try:
        run_statement(
            spark,
            "CREATE CONNECTION analytics TYPE DERBY "
            "OPTIONS (path '/tmp/none')",
        )
        run_statement(spark, "CREATE CATALOG analytics")
        run_statement(spark, "DROP CATALOG analytics CASCADE")
        sid = session_key(spark)
        # in-memory connection survives ...
        assert "analytics" in federation._CONNECTIONS.get(sid, {})
        # ... and so does the DURABLE row after a restart
        federation._CONNECTIONS.pop(sid, None)
        _fresh_session(spark)
        rows = run_statement(spark, "SHOW CONNECTIONS").collect()
        assert [r["name"] for r in rows] == ["analytics"]
        assert "analytics" not in metasql.declared_namespaces(
            spark, "catalog"
        )
        run_statement(spark, "DROP CONNECTION analytics")
    finally:
        spark.conf.unset(creg.PATH_CONF)
