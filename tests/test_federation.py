"""Federation SQL DDL end-to-end (S10 SQL surface; reference
``src/delta_sharing/lakehouse_federation.py:45-154,268-292``) against
embedded Apache Derby: the reference notebook's statement sequence —
CREATE CONNECTION (with ``secret()`` literals) -> CREATE FOREIGN
CATALOG -> SHOW SCHEMAS/TABLES -> pushdown SELECT through the mounted
3-part name -> federated-joins-local -> GRANT/REVOKE governance ->
mirror-to-Delta — runs end-to-end through ``run_statement``."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from databricks_delta_lake_project_spark.governance import (
    access_control as acl,
    federation,
)
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_dir(spark, tmp_path_factory):
    """Embedded Derby DB seeded with customers + order_headers tables
    (the notebook's CRM and e-commerce sources, in one DB)."""
    db = tmp_path_factory.mktemp("derby_fed") / "crmdb"
    url = f"jdbc:derby:{db};create=true"
    customers = spark.createDataFrame(
        [
            Row(
                customer_id=i,
                first_name=f"First{i}",
                last_name=f"Last{i}",
                email=f"user{i}@example.com",
            )
            for i in range(1, 51)
        ]
    )
    orders = spark.createDataFrame(
        [
            Row(
                order_id=100 + i,
                customer_id=(i % 50) + 1,
                total_amount=float(i * 7),
                order_status="completed" if i % 2 == 0 else "pending",
            )
            for i in range(1, 41)
        ]
    )
    # Spark's Derby dialect maps StringType -> CLOB, which Derby cannot
    # compare with literals; give filterable string columns VARCHAR
    col_types = {
        "customers": (
            "first_name VARCHAR(64), last_name VARCHAR(64), "
            "email VARCHAR(128)"
        ),
        "order_headers": "order_status VARCHAR(20)",
    }
    for name, df in (("customers", customers), ("order_headers", orders)):
        (
            df.coalesce(1)
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", DRIVER)
            .option("createTableColumnTypes", col_types[name])
            .mode("overwrite")
            .save()
        )
    return str(db)


@pytest.fixture()
def fed_world(spark, derby_dir):
    """The notebook's setup statements, routed through run_statement,
    with secret() literals resolving from session conf."""
    spark.conf.set(
        f"{federation.SECRET_CONF_PREFIX}federation_secrets.db_user", "app"
    )
    spark.conf.set(
        f"{federation.SECRET_CONF_PREFIX}federation_secrets.db_password",
        "s3cret",
    )
    run_statement(
        spark,
        f"""CREATE CONNECTION IF NOT EXISTS crm_derby
        TYPE DERBY
        OPTIONS (
            path '{derby_dir}',
            driver '{DRIVER}',
            user secret('federation_secrets', 'db_user'),
            password secret('federation_secrets', 'db_password')
        )""",
    )
    run_statement(
        spark,
        "CREATE FOREIGN CATALOG IF NOT EXISTS crm_postgres "
        "USING CONNECTION crm_derby",
    )
    yield
    for key in (
        f"{federation.SECRET_CONF_PREFIX}federation_secrets.db_user",
        f"{federation.SECRET_CONF_PREFIX}federation_secrets.db_password",
    ):
        spark.conf.unset(key)


def test_show_schemas_and_tables_in_foreign_catalog(spark, fed_world):
    schemas = {
        r["namespace"]
        for r in run_statement(spark, "SHOW SCHEMAS IN crm_postgres").collect()
    }
    assert "app" in schemas and not any(s.startswith("sys") for s in schemas)
    rows = run_statement(spark, "SHOW TABLES IN crm_postgres.app").collect()
    names = {r["tableName"] for r in rows}
    assert {"customers", "order_headers"} <= names
    assert all(r["namespace"] == "app" and not r["isTemporary"] for r in rows)


def test_select_through_foreign_name_pushes_down(spark, fed_world):
    """The notebook's federated SELECT: the WHERE clause must reach the
    remote engine (PushedFilters in the JDBC scan), and only projected
    columns cross the wire."""
    df = run_statement(
        spark,
        "SELECT customer_id, email FROM crm_postgres.app.customers "
        "WHERE customer_id > 40",
    )
    assert df.count() == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan" in plan, plan
    assert "first_name" not in plan.split("PushedFilters")[0].lower(), plan


def test_join_federated_with_local_lake_table(spark, fed_world, tmp_path):
    """Section 4 of the notebook: federated JDBC rows join a local
    Delta table in one statement."""
    local = spark.createDataFrame(
        [Row(customer_id=i, lifetime_value=float(i * 100)) for i in (1, 2, 3)]
    )
    t = LakeTable.create(spark, str(tmp_path / "c360"), df=local)
    sqldml.register_table(spark, "gold.customer_360", t)
    out = run_statement(
        spark,
        """SELECT c360.customer_id, crm.email, c360.lifetime_value
        FROM customer_360 c360
        INNER JOIN crm_postgres.app.customers crm
            ON c360.customer_id = crm.customer_id
        ORDER BY c360.customer_id""",
    ).collect()
    assert [r["customer_id"] for r in out] == [1, 2, 3]
    assert out[0]["email"] == "user1@example.com"


def test_aggregate_over_foreign_table(spark, fed_world):
    """The notebook's MySQL-style filtered aggregate through the
    mounted name."""
    row = run_statement(
        spark,
        "SELECT COUNT(*) AS n, SUM(total_amount) AS rev "
        "FROM crm_postgres.app.order_headers "
        "WHERE order_status = 'completed'",
    ).collect()[0]
    assert row["n"] == 20 and row["rev"] > 0


def test_show_connections_redacts_secrets(spark, fed_world):
    rows = {
        r["name"]: r
        for r in run_statement(spark, "SHOW CONNECTIONS").collect()
    }
    conn = rows["crm_derby"]
    assert conn["connection_type"] == "derby"
    assert "secret('federation_secrets','db_user')" in conn["options"]
    assert "s3cret" not in conn["options"]


def test_secret_missing_refuses_loudly_at_use(spark, derby_dir):
    run_statement(
        spark,
        f"""CREATE CONNECTION bad_conn TYPE DERBY OPTIONS (
            path '{derby_dir}', driver '{DRIVER}',
            user secret('nope', 'missing'))""",
    )
    run_statement(
        spark,
        "CREATE FOREIGN CATALOG bad_cat USING CONNECTION bad_conn",
    )
    with pytest.raises(ValueError, match="spark.engine.secrets.nope.missing"):
        run_statement(
            spark, "SELECT * FROM bad_cat.app.customers"
        )


def test_create_without_ine_refuses_duplicates(spark, fed_world, derby_dir):
    with pytest.raises(ValueError, match="already exists"):
        run_statement(
            spark,
            f"CREATE CONNECTION crm_derby TYPE DERBY OPTIONS (path '{derby_dir}')",
        )
    with pytest.raises(ValueError, match="already exists"):
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG crm_postgres USING CONNECTION crm_derby",
        )
    # IF NOT EXISTS is the idempotent re-run path
    out = run_statement(
        spark,
        "CREATE FOREIGN CATALOG IF NOT EXISTS crm_postgres "
        "USING CONNECTION crm_derby",
    ).collect()[0]
    assert out["already_exists"]


def test_foreign_catalog_needs_existing_connection(spark):
    with pytest.raises(ValueError, match="no such connection"):
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG orphan USING CONNECTION ghost_conn",
        )


def test_foreign_catalog_listed_in_show_catalogs(spark, fed_world):
    cats = {
        r["catalog"] for r in run_statement(spark, "SHOW CATALOGS").collect()
    }
    assert "crm_postgres" in cats


def test_drop_connection_and_catalog_symmetry(spark, derby_dir):
    run_statement(
        spark,
        f"CREATE CONNECTION tmp_conn TYPE DERBY OPTIONS (path '{derby_dir}', driver '{DRIVER}')",
    )
    run_statement(
        spark, "CREATE FOREIGN CATALOG tmp_cat USING CONNECTION tmp_conn"
    )
    # dropping a connection still referenced by a catalog refuses
    with pytest.raises(ValueError, match="used by foreign catalog"):
        run_statement(spark, "DROP CONNECTION tmp_conn")
    out = run_statement(spark, "DROP FOREIGN CATALOG tmp_cat").collect()[0]
    assert out["dropped"]
    out = run_statement(spark, "DROP CONNECTION tmp_conn").collect()[0]
    assert out["dropped"]
    # IF EXISTS makes the re-drop idempotent; without it, loud refusal
    assert not run_statement(
        spark, "DROP CONNECTION IF EXISTS tmp_conn"
    ).collect()[0]["dropped"]
    with pytest.raises(ValueError, match="no such connection"):
        run_statement(spark, "DROP CONNECTION tmp_conn")


def test_federated_access_is_acl_governed(spark, fed_world):
    """Notebook section 5: GRANT USAGE ON CATALOG + SELECT ON SCHEMA
    open federated reads; REVOKE closes them; denials audit."""
    from databricks_delta_lake_project_spark.governance import systables

    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "analytics_team")
    try:
        with pytest.raises(PermissionError, match="SELECT"):
            run_statement(
                spark,
                "SELECT * FROM crm_postgres.app.customers WHERE customer_id = 1",
            )
        acl.grant(spark, "USAGE", "CATALOG", "crm_postgres", "analytics_team")
        acl.grant(
            spark, "SELECT", "SCHEMA", "crm_postgres.app", "analytics_team"
        )
        n = run_statement(
            spark,
            "SELECT * FROM crm_postgres.app.customers WHERE customer_id <= 5",
        ).count()
        assert n == 5
        acl.revoke(
            spark, "SELECT", "SCHEMA", "crm_postgres.app", "analytics_team"
        )
        with pytest.raises(PermissionError, match="SELECT"):
            run_statement(
                spark, "SELECT * FROM crm_postgres.app.customers"
            )
        # the denial + allowed reads landed in the audit trail
        audited = {
            (e[6], e[7])
            for buf in systables._AUDIT.values()
            for e in buf
        }
        assert ("crm_postgres.app.customers", 403) in audited
        assert ("crm_postgres.app.customers", 200) in audited
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)


def test_federation_ddl_requires_admin_under_enforcement(spark, derby_dir):
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="CREATE CONNECTION"):
            run_statement(
                spark,
                f"CREATE CONNECTION sneaky TYPE DERBY OPTIONS (path '{derby_dir}')",
            )
        spark.conf.set(acl.ADMINS_CONF, "intern")
        run_statement(
            spark,
            f"CREATE CONNECTION sneaky TYPE DERBY OPTIONS (path '{derby_dir}', driver '{DRIVER}')",
        )
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)


def test_mirror_table_stamps_timestamp(spark, fed_world, tmp_path):
    """create_mirror_table parity (lakehouse_federation.py:268-292):
    full mirror with _mirror_timestamp, then keyed MERGE refresh."""
    path = str(tmp_path / "mirror")
    t = federation.mirror_table(
        spark, "crm_postgres.app.customers", path
    )
    df = t.to_df()
    assert df.count() == 50 and "_mirror_timestamp" in df.columns
    t2 = federation.mirror_table(
        spark, "crm_postgres.app.customers", path, key="customer_id"
    )
    assert t2.to_df().count() == 50


def test_unparseable_federation_statement_refuses(spark):
    with pytest.raises(ValueError, match="cannot parse"):
        run_statement(spark, "CREATE CONNECTION broken WITHOUT OPTIONS")


def test_string_literal_foreign_name_not_rewritten(spark, fed_world):
    """A 3-part foreign name inside a string literal is data, not a
    table reference — the quote-aware rewrite must leave it alone."""
    row = run_statement(
        spark,
        "SELECT 'crm_postgres.app.customers' AS s",
    ).collect()[0]
    assert row["s"] == "crm_postgres.app.customers"


def test_connection_and_foreign_catalog_persist(spark, derby_dir, tmp_path):
    """Durable registry: a connection (secret refs stored UNRESOLVED)
    and its foreign catalog declared in one session resolve — and
    query — in a fresh session under the registry conf."""
    from databricks_delta_lake_project_spark.governance import (
        catalog_registry as creg,
    )
    from databricks_delta_lake_project_spark.session import session_key
    from databricks_delta_lake_project_spark.tables import metasql

    sid = session_key(spark)
    spark.conf.set(creg.PATH_CONF, str(tmp_path / "catreg"))
    spark.conf.set(
        f"{federation.SECRET_CONF_PREFIX}dur_scope.pw", "p4ss"
    )
    try:
        run_statement(
            spark,
            f"""CREATE CONNECTION dur_derby TYPE DERBY OPTIONS (
                path '{derby_dir}', driver '{DRIVER}',
                password secret('dur_scope', 'pw')
            )""",
        )
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG dur_crm USING CONNECTION dur_derby",
        )
        # --- fresh session: federation registries gone, conf kept
        federation._CONNECTIONS.pop(sid, None)
        federation._FOREIGN_CATALOGS.pop(sid, None)
        metasql._NAMESPACES.pop(sid, None)
        creg._LOADED.clear()
        creg._ADDS.clear()
        creg._DELS.clear()
        # the mounted name queries through the reloaded connection,
        # with the secret ref resolved at USE time (still a tuple)
        n = run_statement(
            spark,
            "SELECT COUNT(*) AS n FROM dur_crm.app.customers",
        ).collect()[0]["n"]
        assert n == 50
        conn = federation._CONNECTIONS[sid]["dur_derby"]
        assert conn["options"]["password"] == ("secret", "dur_scope", "pw")
        # SHOW CATALOGS lists the reloaded foreign catalog
        cats = {
            r["catalog"]
            for r in run_statement(spark, "SHOW CATALOGS").collect()
        }
        assert "dur_crm" in cats
        # drops tombstone durably
        run_statement(spark, "DROP FOREIGN CATALOG dur_crm")
        run_statement(spark, "DROP CONNECTION dur_derby")
        federation._CONNECTIONS.pop(sid, None)
        federation._FOREIGN_CATALOGS.pop(sid, None)
        creg._LOADED.clear()
        with pytest.raises(ValueError, match="no such connection"):
            run_statement(spark, "DROP CONNECTION dur_derby")
    finally:
        spark.conf.unset(creg.PATH_CONF)
        spark.conf.unset(f"{federation.SECRET_CONF_PREFIX}dur_scope.pw")


def test_federation_show_verbs_gated_under_enforcement(spark, fed_world):
    """Remote-inventory listing spends stored credentials: SHOW
    SCHEMAS/TABLES need USAGE on the foreign catalog, and SHOW
    CONNECTIONS filters to listable connections, like native SHOWs."""
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="USAGE"):
            run_statement(spark, "SHOW SCHEMAS IN crm_postgres")
        with pytest.raises(PermissionError, match="USAGE"):
            run_statement(spark, "SHOW TABLES IN crm_postgres.app")
        assert run_statement(spark, "SHOW CONNECTIONS").collect() == []
        # a USAGE grant opens the listing (and reveals the connection
        # is NOT needed — connections list on their own privilege)
        acl.grant(spark, "USAGE", "CATALOG", "crm_postgres", "intern")
        schemas = {
            r["namespace"]
            for r in run_statement(
                spark, "SHOW SCHEMAS IN crm_postgres"
            ).collect()
        }
        assert "app" in schemas
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)


def test_foreign_ref_spaced_and_backticked_dots(spark, fed_world):
    n = run_statement(
        spark,
        "SELECT COUNT(*) AS n FROM crm_postgres . app . customers",
    ).collect()[0]["n"]
    assert n == 50
    n2 = run_statement(
        spark,
        "SELECT COUNT(*) AS n FROM crm_postgres.`app`.`customers`",
    ).collect()[0]["n"]
    assert n2 == 50


def test_show_verbs_admin_bypass_and_backticked_catalog(spark, fed_world):
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "root_admin")
    spark.conf.set(acl.ADMINS_CONF, "root_admin")
    try:
        # admins list like they do through every native SHOW verb
        schemas = {
            r["namespace"]
            for r in run_statement(
                spark, "SHOW SCHEMAS IN crm_postgres"
            ).collect()
        }
        assert "app" in schemas
        assert run_statement(spark, "SHOW CONNECTIONS").count() >= 1
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)
    # backticked catalog part resolves too
    n = run_statement(
        spark,
        "SELECT COUNT(*) AS n FROM `crm_postgres`.app.customers",
    ).collect()[0]["n"]
    assert n == 50


def test_admin_show_inventory_still_audited(spark, fed_world):
    """Credential-spending remote listings by admins leave an audit
    trail (the bypass skips the denial, never the record)."""
    from databricks_delta_lake_project_spark.governance import systables
    from databricks_delta_lake_project_spark.session import session_key

    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "root_admin")
    spark.conf.set(acl.ADMINS_CONF, "root_admin")
    try:
        before = len(systables._AUDIT.get(session_key(spark), []))
        run_statement(spark, "SHOW SCHEMAS IN crm_postgres").collect()
        events = systables._AUDIT.get(session_key(spark), [])
        assert len(events) > before
        # audit rows are flat tuples (session_id, seq, event_time,
        # ts, email, action, securable, status_code) — see
        # systables.record_access / _DUR_AUDIT_SCHEMA
        last = events[-1]
        assert last[6] == "crm_postgres"
        assert last[7] == 200
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)


def test_internal_fed_view_direct_reference_enforced(spark, fed_world):
    """Naming the engine-internal fed__ view DIRECTLY gets the same
    SELECT check + audit as the 3-part name: materialization by a
    privileged principal must not open the remote table to every
    later statement in the session."""
    from databricks_delta_lake_project_spark.governance import systables

    # privileged phase (enforcement off): materialize the view
    run_statement(
        spark, "SELECT * FROM crm_postgres.app.customers LIMIT 1"
    ).collect()
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="SELECT"):
            run_statement(
                spark, "SELECT * FROM fed__crm_postgres__app__customers"
            )
        # backtick-quoted spelling resolves to the same view: caught too
        with pytest.raises(PermissionError, match="SELECT"):
            run_statement(
                spark, "SELECT * FROM `fed__crm_postgres__app__customers`"
            )
        audited = {
            (e[6], e[7])
            for buf in systables._AUDIT.values()
            for e in buf
        }
        assert ("crm_postgres.app.customers", 403) in audited
        # a granted principal reads through the internal name too
        acl.grant(spark, "USAGE", "CATALOG", "crm_postgres", "intern")
        acl.grant(spark, "SELECT", "SCHEMA", "crm_postgres.app", "intern")
        n = run_statement(
            spark, "SELECT * FROM fed__crm_postgres__app__customers"
        ).count()
        assert n == 50
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)


def test_drop_foreign_catalog_drops_fed_views(spark, fed_world):
    """DROP FOREIGN CATALOG drops the materialized fed__ views — a
    dropped catalog must stop serving remote data under its
    credentials."""
    from databricks_delta_lake_project_spark.session import session_key

    run_statement(
        spark, "SELECT * FROM crm_postgres.app.customers LIMIT 1"
    ).collect()
    view = "fed__crm_postgres__app__customers"
    assert spark.catalog.tableExists(view)
    run_statement(spark, "DROP FOREIGN CATALOG crm_postgres")
    assert not spark.catalog.tableExists(view)
    assert view not in federation._FED_VIEWS.get(session_key(spark), {})


def test_foreign_dml_target_refuses_read_only(spark, fed_world):
    """A DML statement targeting a foreign table refuses up front with
    a clear read-only error, not a downstream missing-view failure."""
    with pytest.raises(ValueError, match="read-only"):
        run_statement(
            spark,
            "INSERT INTO crm_postgres.app.customers "
            "SELECT 99, 'X', 'Y', 'x@y.z'",
        )
    with pytest.raises(ValueError, match="read-only"):
        run_statement(
            spark,
            "DELETE FROM crm_postgres.app.customers WHERE customer_id = 1",
        )


def test_create_foreign_catalog_invalid_name_refuses(spark, derby_dir):
    """Non-word catalog names would build invalid fed__ temp-view
    identifiers — refused at DDL time, not at first query."""
    run_statement(
        spark,
        f"CREATE CONNECTION IF NOT EXISTS namecheck_conn TYPE DERBY "
        f"OPTIONS (path '{derby_dir}', driver '{DRIVER}')",
    )
    with pytest.raises(ValueError, match="invalid catalog name"):
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG `my cat` USING CONNECTION namecheck_conn",
        )
    with pytest.raises(ValueError, match="invalid catalog name"):
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG `a.b` USING CONNECTION namecheck_conn",
        )


def test_foreign_table_backtick_parts_refuse(spark, fed_world):
    """foreign_table() refuses embedded backticks instead of
    mis-splitting `cat.`my.schema`.tbl` on the quoted dot."""
    with pytest.raises(ValueError, match="backtick"):
        federation.foreign_table(spark, "crm_postgres.`app.x`.customers")


def test_denied_federation_ddl_audits(spark, derby_dir):
    """A denied CREATE/DROP CONNECTION leaves a 403 audit row like
    every other manage-gated refusal."""
    from databricks_delta_lake_project_spark.governance import systables

    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="CREATE CONNECTION"):
            run_statement(
                spark,
                f"CREATE CONNECTION audit_denied TYPE DERBY "
                f"OPTIONS (path '{derby_dir}')",
            )
        audited = {
            (e[5], e[6], e[7])
            for buf in systables._AUDIT.values()
            for e in buf
        }
        assert ("CREATE CONNECTION", "audit_denied", 403) in audited
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)


def test_local_table_colliding_with_catalog_name_still_writable(
    spark, fed_world, tmp_path
):
    """Only a 3-part target denotes a catalog: a LOCAL 1-/2-part
    table whose first component collides with a foreign-catalog name
    keeps working through DML."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "collide"),
        df=spark.createDataFrame([(1, 0)], "k int, v int"),
    )
    sqldml.register_table(spark, "crm_postgres.users", t)
    try:
        run_statement(
            spark, "UPDATE crm_postgres.users SET v = 9 WHERE k = 1"
        )
        assert t.to_df().collect()[0]["v"] == 9
    finally:
        from databricks_delta_lake_project_spark.tables.sqldml import _skey

        sqldml._REGISTRY.pop(_skey(spark, "crm_postgres.users"), None)


def test_ctas_into_foreign_catalog_refuses_read_only(spark, fed_world):
    """CTAS targeting a foreign catalog gets the same up-front
    read-only refusal as INSERT/UPDATE/DELETE — never a silent local
    table under the spliced view name."""
    with pytest.raises(ValueError, match="read-only"):
        run_statement(
            spark,
            "CREATE TABLE crm_postgres.app.newtbl AS "
            "SELECT * FROM crm_postgres.app.customers",
        )


def test_double_underscore_catalog_name_refused(spark, derby_dir):
    """'__' is the fed__ view-name separator: catalogs containing it
    would collide view names across catalogs and break the DROP
    prefix sweep — refused at DDL time."""
    run_statement(
        spark,
        f"CREATE CONNECTION IF NOT EXISTS dd_conn TYPE DERBY "
        f"OPTIONS (path '{derby_dir}', driver '{DRIVER}')",
    )
    with pytest.raises(ValueError, match="invalid catalog name"):
        run_statement(
            spark,
            "CREATE FOREIGN CATALOG a__b USING CONNECTION dd_conn",
        )


def test_foreign_target_guard_matches_rewriter_spellings(
    spark, fed_world
):
    """The read-only refusal accepts every spelling the rewriter
    would splice: backticked catalog part, spaced dots, and a leading
    comment on a CTAS."""
    for stmt in (
        "INSERT INTO `crm_postgres`.app.customers SELECT 1, 'a', 'b', 'c'",
        "UPDATE crm_postgres . app . customers SET email = 'x'",
        "/* note */ CREATE TABLE crm_postgres.app.newt AS "
        "SELECT * FROM crm_postgres.app.customers",
        "CREATE OR REPLACE TABLE crm_postgres.`app`.customers AS "
        "SELECT 1 AS x",
    ):
        with pytest.raises(ValueError, match="read-only"):
            run_statement(spark, stmt)


def test_double_underscore_remote_table_reads_via_digest_view(
    spark, fed_world, derby_dir
):
    """Remote schema/table parts containing '__' stay readable: the
    rewrite uses a deterministic digest view name (no collisions with
    the readable fed__cat__schema__table scheme), still tracked for
    enforcement and dropped with the catalog."""
    from databricks_delta_lake_project_spark.session import session_key
    from pyspark.sql import Row

    url = f"jdbc:derby:{derby_dir}"
    df = spark.createDataFrame([Row(eid=1), Row(eid=2), Row(eid=3)])
    (
        df.coalesce(1)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "user__events")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    n = run_statement(
        spark,
        "SELECT COUNT(*) AS n FROM crm_postgres.app.user__events",
    ).collect()[0]["n"]
    assert n == 3
    fviews = federation._FED_VIEWS.get(session_key(spark), {})
    digest_views = [
        v
        for v, full in fviews.items()
        if full == "crm_postgres.app.user__events"
    ]
    assert len(digest_views) == 1
    assert digest_views[0].startswith("fed__crm_postgres__h")


def test_maintenance_verbs_on_foreign_table_refuse(spark, fed_world):
    """TRUNCATE/OPTIMIZE/VACUUM/ALTER/RESTORE share the read-only
    refusal with the DML verbs (one verb inventory with
    statement_target — no drift)."""
    for stmt in (
        "TRUNCATE TABLE crm_postgres.app.customers",
        "OPTIMIZE crm_postgres.app.customers",
        "VACUUM crm_postgres.app.customers",
        "ALTER TABLE crm_postgres.app.customers ADD COLUMNS (x INT)",
        "RESTORE TABLE crm_postgres.app.customers TO VERSION AS OF 0",
    ):
        with pytest.raises(ValueError, match="read-only"):
            run_statement(spark, stmt)


def test_commented_out_foreign_name_not_spliced_or_enforced(
    spark, fed_world
):
    """A foreign 3-part name inside a comment is dead text: never
    rewritten, never SELECT-enforced — a harmless statement must not
    403 for a principal without the grant."""
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        row = run_statement(
            spark,
            "SELECT 1 AS x -- was: crm_postgres.app.customers\n"
            "/* and crm_postgres.app.order_headers */",
        ).collect()[0]
        assert row["x"] == 1
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
