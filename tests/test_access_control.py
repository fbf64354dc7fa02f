"""GRANT / REVOKE / SHOW GRANTS + hierarchical enforcement (X10
extension; reference governance/access_control.py:30-100): the
three-level namespace, downward inheritance, the USAGE two-key rule,
and opt-in statement-boundary enforcement."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from databricks_delta_lake_project_spark.functions.masking import (
    GROUPS_CONF_KEY,
)
from databricks_delta_lake_project_spark.governance import access_control as acl
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.tables import LakeTable, sqldml


@pytest.fixture()
def acl_world(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "gold_c360"),
        df=spark.createDataFrame([Row(id=1, v=10), Row(id=2, v=20)]),
        format="delta",
    )
    sqldml.register_table(spark, "cat.gold.c360", t)
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "alice")
    spark.conf.set(GROUPS_CONF_KEY, "analytics_team")
    yield t
    spark.conf.set(acl.ENABLED_CONF, "false")
    spark.conf.unset(acl.PRINCIPAL_CONF)
    spark.conf.unset(GROUPS_CONF_KEY)
    acl._GRANTS.clear()


def test_grant_show_revoke_statements(spark, acl_world):
    run_statement(
        spark, "GRANT USAGE ON CATALOG cat TO `analytics_team`"
    )
    run_statement(
        spark, "GRANT USAGE ON SCHEMA cat.gold TO `analytics_team`"
    )
    out = run_statement(
        spark, "GRANT SELECT ON SCHEMA cat.gold TO `analytics_team`"
    ).collect()
    assert ("analytics_team", "SELECT", "SCHEMA", "cat.gold") in {
        tuple(r) for r in out
    }
    allg = run_statement(spark, "SHOW GRANTS").collect()
    assert len(allg) == 3
    on_schema = run_statement(spark, "SHOW GRANTS ON SCHEMA cat.gold").collect()
    assert len(on_schema) == 2
    n = run_statement(
        spark, "REVOKE SELECT ON SCHEMA cat.gold FROM `analytics_team`"
    ).collect()[0]["revoked"]
    assert n == 1
    assert len(run_statement(spark, "SHOW GRANTS").collect()) == 2


def test_hierarchical_select_enforcement(spark, acl_world):
    # no grants: SELECT over the registered table refused
    with pytest.raises(PermissionError, match="SELECT"):
        run_statement(spark, "SELECT * FROM c360")
    # schema-level SELECT alone is NOT enough: USAGE on ancestors needed
    run_statement(spark, "GRANT SELECT ON SCHEMA cat.gold TO analytics_team")
    with pytest.raises(PermissionError):
        run_statement(spark, "SELECT * FROM c360")
    run_statement(spark, "GRANT USAGE ON CATALOG cat TO analytics_team")
    run_statement(spark, "GRANT USAGE ON SCHEMA cat.gold TO analytics_team")
    # the reference team-setup shape now authorizes reads...
    assert run_statement(spark, "SELECT count(*) AS n FROM c360").collect()[
        0
    ]["n"] == 2
    # ...but not writes
    with pytest.raises(PermissionError, match="MODIFY"):
        run_statement(spark, "DELETE FROM c360 WHERE id = 1")
    # catalog-level ALL PRIVILEGES opens everything (data_engineering_team)
    spark.conf.set(GROUPS_CONF_KEY, "data_engineering_team")
    run_statement(
        spark, "GRANT ALL PRIVILEGES ON CATALOG cat TO data_engineering_team"
    )
    out = run_statement(spark, "DELETE FROM c360 WHERE id = 1").collect()[0]
    assert out["numDeletedRows"] == 1


def test_enforcement_off_by_default(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "open_t"),
        df=spark.createDataFrame([Row(id=1)]),
        format="delta",
    )
    sqldml.register_table(spark, "open_t", t)
    # accessControl.enabled is false: no grants required
    assert (
        run_statement(spark, "SELECT count(*) AS n FROM open_t").collect()[0][
            "n"
        ]
        == 1
    )


def test_is_authorized_inheritance_unit(spark, acl_world):
    acl.grant(spark, "SELECT", "CATALOG", "cat", "alice")
    # catalog-level SELECT inherits down, and a bare catalog has no
    # ancestors to need USAGE on — but the table's chain does
    assert not acl.is_authorized(spark, "SELECT", "cat.gold.c360")
    acl.grant(spark, "USAGE", "CATALOG", "cat", "alice")
    # USAGE on the catalog also satisfies USAGE for the schema level
    assert acl.is_authorized(spark, "SELECT", "cat.gold.c360")
    assert not acl.is_authorized(spark, "MODIFY", "cat.gold.c360")
