"""Share DDL as SQL (S9/X10 SQL tail): the reference provider
notebook's statement sequence
(``src/delta_sharing/delta_sharing_provider.py:41-106``) running
verbatim through ``run_statement`` against the filesystem
ShareProvider, ending with a recipient profile that loads the shared
table."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from databricks_delta_lake_project_spark.governance import (
    access_control as acl,
    share_sql,
)
from databricks_delta_lake_project_spark.governance.sharing import (
    SharingClient,
)
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml


@pytest.fixture()
def share_world(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "revenue_analytics"),
        df=spark.createDataFrame(
            [
                Row(region="US", customer_id=1, revenue=100.0),
                Row(region="US", customer_id=2, revenue=250.0),
                Row(region="EU", customer_id=3, revenue=75.0),
            ]
        ),
    )
    sqldml.register_table(spark, "shcat.gold.revenue_analytics", t)
    spark.conf.set(share_sql.ROOT_CONF, str(tmp_path / "shares_root"))
    yield t, tmp_path
    spark.conf.unset(share_sql.ROOT_CONF)
    sqldml._REGISTRY.pop(
        (session_key(spark), "shcat.gold.revenue_analytics"), None
    )


def test_reference_provider_statement_sequence(spark, share_world):
    _, tmp_path = share_world
    # the provider notebook, statement by statement
    run_statement(
        spark,
        "CREATE SHARE IF NOT EXISTS customer_360_analytics_share "
        "COMMENT 'Customer 360 aggregated analytics for partner teams';",
    )
    run_statement(
        spark,
        "ALTER SHARE customer_360_analytics_share "
        "ADD TABLE shcat.gold.revenue_analytics "
        "COMMENT 'Revenue analytics with time-series rollups';",
    )
    run_statement(
        spark,
        "ALTER SHARE customer_360_analytics_share "
        "ADD TABLE shcat.gold.revenue_analytics "
        "AS customer_analytics.revenue_all "
        "COMMENT 'Unified revenue (aliased)';",
    )
    run_statement(
        spark,
        "ALTER SHARE customer_360_analytics_share "
        "ADD TABLE shcat.gold.revenue_analytics "
        "PARTITION (region = 'US') "
        "AS customer_analytics.revenue_us_only "
        "COMMENT 'Revenue analytics - US region only';",
    )
    rec = run_statement(
        spark,
        "CREATE RECIPIENT IF NOT EXISTS partner_analytics_team "
        "USING ID 'aws:us-west-2:00000000-0000-0000-0000-000000000000' "
        "COMMENT 'Partner analytics team';",
    ).collect()[0]
    assert rec["recipient"] == "partner_analytics_team"
    run_statement(
        spark,
        "GRANT SELECT ON SHARE customer_360_analytics_share "
        "TO RECIPIENT partner_analytics_team;",
    )

    shares = run_statement(spark, "SHOW SHARES").collect()
    assert [(r["name"], r["num_tables"]) for r in shares] == [
        ("customer_360_analytics_share", 3)
    ]
    recips = run_statement(spark, "SHOW RECIPIENTS").collect()
    assert recips[0]["name"] == "partner_analytics_team"
    assert recips[0]["sharing_id"].startswith("aws:us-west-2:")
    in_share = run_statement(
        spark, "SHOW ALL IN SHARE customer_360_analytics_share"
    ).collect()
    assert {r["name"] for r in in_share} == {
        "gold.revenue_analytics",
        "customer_analytics.revenue_all",
        "customer_analytics.revenue_us_only",
    }

    # the written profile is a working activation artifact
    client = SharingClient(rec["profile"])
    assert client.list_shares() == ["customer_360_analytics_share"]
    full = client.load_table(
        spark,
        "customer_360_analytics_share.customer_analytics.revenue_all",
    )
    assert full.count() == 3
    us = client.load_table(
        spark,
        "customer_360_analytics_share.customer_analytics.revenue_us_only",
    ).collect()
    assert len(us) == 2 and all(r["region"] == "US" for r in us)


def test_remove_table_and_revoke(spark, share_world):
    run_statement(spark, "CREATE SHARE s2")
    run_statement(
        spark, "ALTER SHARE s2 ADD TABLE revenue_analytics AS a.b"
    )
    rec = run_statement(spark, "CREATE RECIPIENT r2").collect()[0]
    run_statement(spark, "GRANT SELECT ON SHARE s2 TO RECIPIENT r2")
    client = SharingClient(rec["profile"])
    assert client.list_tables("s2") == ["a.b"]
    run_statement(spark, "ALTER SHARE s2 REMOVE TABLE a.b")
    assert client.list_tables("s2") == []
    run_statement(spark, "REVOKE SELECT ON SHARE s2 FROM RECIPIENT r2")
    assert client.list_shares() == []


def test_default_alias_and_multi_partition(spark, share_world):
    run_statement(spark, "CREATE SHARE s3")
    # no AS: alias defaults to the last two name parts
    run_statement(
        spark,
        "ALTER SHARE s3 ADD TABLE shcat.gold.revenue_analytics "
        "PARTITION (region = 'EU', customer_id = 3)",
    )
    rows = run_statement(spark, "SHOW ALL IN SHARE s3").collect()
    assert rows[0]["name"] == "gold.revenue_analytics"
    assert rows[0]["partition_filter"] == "region = 'EU' AND customer_id = 3"


def test_share_ddl_requires_root_conf(spark, share_world):
    spark.conf.unset(share_sql.ROOT_CONF)
    with pytest.raises(ValueError, match="sharing.root"):
        run_statement(spark, "CREATE SHARE nope")
    spark.conf.set(
        share_sql.ROOT_CONF, str(share_world[1] / "shares_root")
    )


def test_unparseable_share_ddl_is_loud(spark, share_world):
    with pytest.raises(ValueError, match="share DDL"):
        run_statement(spark, "ALTER SHARE s1 FROBNICATE")


def test_share_admin_gated_under_acl(spark, share_world):
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "mallory")
    try:
        with pytest.raises(PermissionError, match="administer share"):
            run_statement(spark, "CREATE SHARE evil_share")
        # admins may; ADD TABLE also needs SELECT on the table
        spark.conf.set(acl.ADMINS_CONF, "mallory")
        run_statement(spark, "CREATE SHARE ok_share")
        with pytest.raises(PermissionError, match="SELECT"):
            run_statement(
                spark,
                "ALTER SHARE ok_share ADD TABLE "
                "shcat.gold.revenue_analytics",
            )
        acl.grant(spark, "ALL PRIVILEGES", "CATALOG", "shcat", "mallory")
        run_statement(
            spark,
            "ALTER SHARE ok_share ADD TABLE shcat.gold.revenue_analytics",
        )
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)
        acl._GRANTS.clear()
        from databricks_delta_lake_project_spark.governance import systables

        systables._AUDIT.clear()


def test_create_recipient_name_validated_and_no_silent_rotate(
    spark, share_world
):
    with pytest.raises(ValueError, match="invalid recipient name"):
        run_statement(spark, "CREATE RECIPIENT `../../evil`")
    with pytest.raises(ValueError, match="invalid recipient name"):
        run_statement(spark, "CREATE RECIPIENT `..`")
    # hyphens/dots are legal recipient names (no traversal)
    ok = run_statement(spark, "CREATE RECIPIENT `ext-partner.team`").collect()
    assert ok[0]["recipient"] == "ext-partner.team"
    rec = run_statement(spark, "CREATE RECIPIENT dupe").collect()[0]
    token_before = open(rec["profile"]).read()
    with pytest.raises(ValueError, match="already exists"):
        run_statement(spark, "CREATE RECIPIENT dupe")
    # IF NOT EXISTS keeps the original credential
    out = run_statement(
        spark, "CREATE RECIPIENT IF NOT EXISTS dupe"
    ).collect()[0]
    assert out["already_exists"] is True
    assert open(rec["profile"]).read() == token_before


def test_comment_literal_does_not_trigger_if_not_exists(spark, share_world):
    run_statement(spark, "CREATE RECIPIENT r9")
    with pytest.raises(ValueError, match="already exists"):
        run_statement(
            spark,
            "CREATE RECIPIENT r9 COMMENT 'kept if not exists by policy'",
        )
    run_statement(spark, "CREATE SHARE s9")
    with pytest.raises(ValueError, match="share already exists"):
        run_statement(spark, "CREATE SHARE s9")


def test_create_catalog_using_share_mount(spark, share_world):
    """The D2D consumption form (delta_sharing_recipient.py:35-39):
    CREATE CATALOG ... USING SHARE mounts every shared table as
    <catalog>.<schema>.<table>."""
    run_statement(spark, "CREATE SHARE IF NOT EXISTS d2d_share")
    run_statement(
        spark,
        "ALTER SHARE d2d_share ADD TABLE shcat.gold.revenue_analytics "
        "PARTITION (region = 'US') AS customer_analytics.revenue_us",
    )
    rec = run_statement(spark, "CREATE RECIPIENT d2d_partner").collect()[0]
    run_statement(
        spark, "GRANT SELECT ON SHARE d2d_share TO RECIPIENT d2d_partner"
    )
    spark.conf.set(share_sql.PROFILE_CONF, rec["profile"])
    try:
        mounted = run_statement(
            spark,
            "CREATE CATALOG IF NOT EXISTS partner_data "
            "USING SHARE `provider_account`.d2d_share "
            "COMMENT 'Shared data from the Customer 360 provider';",
        ).collect()
        assert [(r["table"], r["mounted_view"]) for r in mounted] == [
            (
                "partner_data.customer_analytics.revenue_us",
                "partner_data__customer_analytics__revenue_us",
            )
        ]
        rows = run_statement(
            spark,
            "SELECT region, revenue FROM "
            "partner_data.customer_analytics.revenue_us ORDER BY revenue",
        ).collect()
        assert [r["region"] for r in rows] == ["US", "US"]
        # an ungranted share refuses to mount
        run_statement(spark, "REVOKE SELECT ON SHARE d2d_share FROM RECIPIENT d2d_partner")
        with pytest.raises(PermissionError, match="not granted"):
            run_statement(
                spark,
                "CREATE CATALOG p2 USING SHARE d2d_share",
            )
    finally:
        spark.conf.unset(share_sql.PROFILE_CONF)
        share_sql._MOUNTS.clear()
        spark.catalog.dropTempView(
            "partner_data__customer_analytics__revenue_us"
        )


def test_mount_refresh_drops_stale_and_feeds_dml(spark, share_world):
    from databricks_delta_lake_project_spark.tables import metasql

    run_statement(spark, "CREATE SHARE IF NOT EXISTS ref_share")
    run_statement(
        spark,
        "ALTER SHARE ref_share ADD TABLE shcat.gold.revenue_analytics "
        "AS s.keepme",
    )
    run_statement(
        spark,
        "ALTER SHARE ref_share ADD TABLE shcat.gold.revenue_analytics "
        "AS s.dropme",
    )
    rec = run_statement(spark, "CREATE RECIPIENT ref_rcpt").collect()[0]
    run_statement(
        spark, "GRANT SELECT ON SHARE ref_share TO RECIPIENT ref_rcpt"
    )
    spark.conf.set(share_sql.PROFILE_CONF, rec["profile"])
    try:
        run_statement(spark, "CREATE CATALOG pmount USING SHARE ref_share")
        # the mounted catalog is discoverable
        cats = {
            r["catalog"]
            for r in run_statement(spark, "SHOW CATALOGS").collect()
        }
        assert "pmount" in cats
        # DML reads resolve mounted names too (not just plain SELECT)
        t = LakeTable.create(
            spark,
            str(share_world[1] / "dml_target"),
            df=spark.createDataFrame([Row(region="XX", revenue=0.0)]),
        )
        sqldml.register_table(spark, "dml_target", t)
        run_statement(
            spark,
            "INSERT INTO dml_target SELECT region, revenue "
            "FROM pmount.s.keepme WHERE region = 'EU'",
        )
        assert t.to_df().count() == 2
        # provider removes one table; re-issuing the mount drops it
        run_statement(spark, "ALTER SHARE ref_share REMOVE TABLE s.dropme")
        run_statement(spark, "CREATE CATALOG pmount USING SHARE ref_share")
        with pytest.raises(Exception):
            run_statement(
                spark, "SELECT * FROM pmount.s.dropme"
            ).collect()
        assert (
            run_statement(spark, "SELECT count(*) AS n FROM pmount.s.keepme")
            .collect()[0]["n"]
            == 3
        )
    finally:
        spark.conf.unset(share_sql.PROFILE_CONF)
        share_sql._MOUNTS.clear()
        metasql._NAMESPACES.clear()
        sqldml._REGISTRY.pop((session_key(spark), "dml_target"), None)
        for v in ("pmount__s__keepme", "pmount__s__dropme"):
            try:
                spark.catalog.dropTempView(v)
            except Exception:
                pass
