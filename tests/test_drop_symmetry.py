"""DROP symmetry for engine DDL (reference pytest fixtures run
``DROP SCHEMA IF EXISTS {schema} CASCADE``,
``src/databricks_connect/local_testing.py:49``): every engine
CREATE/SHOW surface — namespaces, volumes, table registrations,
shares, recipients, SQL functions — has a DROP counterpart with
IF EXISTS idempotence, RESTRICT-by-default on non-empty namespaces,
and MANAGE-level ACL gating."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from databricks_delta_lake_project_spark.governance import (
    access_control as acl,
    share_sql,
)
from databricks_delta_lake_project_spark.queries.sqlpack import run_statement
from databricks_delta_lake_project_spark.session import session_key
from databricks_delta_lake_project_spark.tables import (
    LakeTable,
    metasql,
    sqldml,
)


def test_drop_volume_managed_removes_storage(spark, tmp_path):
    spark.conf.set(metasql.VOLUMES_ROOT_CONF, str(tmp_path / "vols"))
    try:
        out = run_statement(
            spark, "CREATE VOLUME dcat.land.zone"
        ).collect()[0]
        backing = out["path"]
        (
            spark.createDataFrame([Row(x=1)])
            .write.mode("overwrite")
            .parquet(f"{backing}/files")
        )
        assert os.path.exists(backing)
        dropped = run_statement(
            spark, "DROP VOLUME dcat.land.zone"
        ).collect()[0]
        assert dropped["dropped"]
        # managed volume: engine-owned storage goes with it
        assert not os.path.exists(backing)
        with pytest.raises(ValueError, match="no such volume"):
            metasql.volume_path(spark, "dcat.land.zone")
        # create -> drop -> recreate cycle works
        run_statement(spark, "CREATE VOLUME dcat.land.zone")
        assert metasql.volume_path(spark, "dcat.land.zone")
    finally:
        spark.conf.unset(metasql.VOLUMES_ROOT_CONF)


def test_drop_external_volume_keeps_location(spark, tmp_path):
    loc = tmp_path / "ext_data"
    loc.mkdir()
    (loc / "keep.txt").write_text("caller-owned")
    run_statement(
        spark,
        f"CREATE EXTERNAL VOLUME dcat.land.ext LOCATION '{loc}'",
    )
    assert run_statement(spark, "DROP VOLUME dcat.land.ext").collect()[0][
        "dropped"
    ]
    assert (loc / "keep.txt").exists()


def test_drop_volume_if_exists_idempotent(spark):
    out = run_statement(
        spark, "DROP VOLUME IF EXISTS ghost.s.v"
    ).collect()[0]
    assert not out["dropped"]
    with pytest.raises(ValueError, match="no such volume"):
        run_statement(spark, "DROP VOLUME ghost.s.v")


def test_drop_schema_restrict_then_cascade(spark, tmp_path):
    spark.conf.set(metasql.VOLUMES_ROOT_CONF, str(tmp_path / "vols"))
    try:
        run_statement(spark, "CREATE CATALOG dropcat")
        run_statement(spark, "CREATE SCHEMA dropcat.bronze")
        run_statement(spark, "CREATE VOLUME dropcat.bronze.landing")
        t = LakeTable.create(
            spark,
            str(tmp_path / "t1"),
            df=spark.createDataFrame([Row(a=1)]),
        )
        sqldml.register_table(spark, "dropcat.bronze.t1", t)
        # RESTRICT is the default: a non-empty schema refuses
        with pytest.raises(ValueError, match="not empty"):
            run_statement(spark, "DROP SCHEMA dropcat.bronze")
        out = run_statement(
            spark, "DROP SCHEMA dropcat.bronze CASCADE"
        ).collect()[0]
        assert out["dropped"]
        sid = session_key(spark)
        assert (sid, "dropcat.bronze.t1") not in sqldml._REGISTRY
        assert (
            "volume",
            "dropcat.bronze.landing",
        ) not in metasql._NAMESPACES.get(sid, {})
        # the table's DATA survives (external path-backed location)
        assert LakeTable.is_table(str(tmp_path / "t1"))
        # catalog is now empty: plain DROP CATALOG works
        assert run_statement(spark, "DROP CATALOG dropcat").collect()[0][
            "dropped"
        ]
    finally:
        spark.conf.unset(metasql.VOLUMES_ROOT_CONF)


def test_drop_catalog_cascade_subtree(spark, tmp_path):
    run_statement(spark, "CREATE CATALOG bigcat")
    run_statement(spark, "CREATE SCHEMA bigcat.s1")
    run_statement(spark, "CREATE SCHEMA bigcat.s2")
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), df=spark.createDataFrame([Row(a=1)])
    )
    sqldml.register_table(spark, "bigcat.s1.t2", t)
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP CATALOG bigcat")
    assert run_statement(spark, "DROP CATALOG bigcat CASCADE").collect()[
        0
    ]["dropped"]
    sid = session_key(spark)
    reg = metasql._NAMESPACES.get(sid, {})
    assert ("catalog", "bigcat") not in reg
    assert ("schema", "bigcat.s1") not in reg
    assert (sid, "bigcat.s1.t2") not in sqldml._REGISTRY
    # SHOW CATALOGS no longer lists it
    cats = {
        r["catalog"] for r in run_statement(spark, "SHOW CATALOGS").collect()
    }
    assert "bigcat" not in cats


def test_reference_fixture_drop_schema_shape(spark, tmp_path):
    """The reference's exact teardown statement over an engine schema
    with registered tables but no explicit CREATE SCHEMA."""
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), df=spark.createDataFrame([Row(a=1)])
    )
    sqldml.register_table(spark, "fixcat.testschema.t3", t)
    out = run_statement(
        spark, "DROP SCHEMA IF EXISTS fixcat.testschema CASCADE"
    ).collect()[0]
    assert out["dropped"]
    assert (
        session_key(spark),
        "fixcat.testschema.t3",
    ) not in sqldml._REGISTRY
    # idempotent re-drop
    out = run_statement(
        spark, "DROP SCHEMA IF EXISTS fixcat.testschema CASCADE"
    ).collect()[0]
    assert not out["dropped"]


def test_drop_table_unregisters_keeps_data(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "dt"),
        df=spark.createDataFrame([Row(a=1), Row(a=2)]),
    )
    sqldml.register_table(spark, "dropme", t)
    assert run_statement(spark, "SELECT COUNT(*) AS n FROM dropme").collect()[
        0
    ]["n"] == 2
    out = run_statement(spark, "DROP TABLE dropme").collect()[0]
    assert out["dropped"] and out["name"] == "dropme"
    assert (session_key(spark), "dropme") not in sqldml._REGISTRY
    assert LakeTable.is_table(str(tmp_path / "dt"))
    # native fallthrough: a non-engine name raises Spark's own error
    with pytest.raises(Exception, match="TABLE_OR_VIEW_NOT_FOUND|not found"):
        run_statement(spark, "DROP TABLE never_registered_anywhere")


def test_drop_namespace_requires_manage_under_enforcement(spark):
    run_statement(spark, "CREATE CATALOG aclcat")
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="DROP CATALOG"):
            run_statement(spark, "DROP CATALOG aclcat")
        spark.conf.set(acl.ADMINS_CONF, "intern")
        assert run_statement(spark, "DROP CATALOG aclcat").collect()[0][
            "dropped"
        ]
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)


def test_drop_share_and_recipient(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "shared_t"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "shcat.gold.shared_t", t)
    spark.conf.set(share_sql.ROOT_CONF, str(tmp_path / "root"))
    try:
        run_statement(spark, "CREATE SHARE s1")
        run_statement(
            spark, "ALTER SHARE s1 ADD TABLE shcat.gold.shared_t"
        )
        run_statement(spark, "CREATE RECIPIENT r1")
        run_statement(spark, "GRANT SELECT ON SHARE s1 TO RECIPIENT r1")
        profile = tmp_path / "root" / "recipients" / "r1.share"
        assert profile.exists()
        # drops clean the grant rows and the credential file
        assert run_statement(spark, "DROP RECIPIENT r1").collect()[0][
            "dropped"
        ]
        assert not profile.exists()
        assert run_statement(spark, "DROP SHARE s1").collect()[0]["dropped"]
        shares = run_statement(spark, "SHOW SHARES").collect()
        assert shares == []
        # IF EXISTS idempotence; loud refusal without it
        assert not run_statement(
            spark, "DROP SHARE IF EXISTS s1"
        ).collect()[0]["dropped"]
        with pytest.raises(ValueError, match="no such share"):
            run_statement(spark, "DROP SHARE s1")
        with pytest.raises(ValueError, match="no such recipient"):
            run_statement(spark, "DROP RECIPIENT r1")
        # create -> drop -> recreate: the recipient gets a FRESH token
        run_statement(spark, "CREATE RECIPIENT r1")
        assert profile.exists()
    finally:
        spark.conf.unset(share_sql.ROOT_CONF)


def test_drop_function_full_and_basename(spark):
    run_statement(
        spark,
        "CREATE FUNCTION fcat.gold.mask_ssn(s STRING) RETURNS STRING "
        "RETURN concat('***-**-', right(s, 4))",
    )
    row = run_statement(
        spark, "SELECT fcat.gold.mask_ssn('123-45-6789') AS m"
    ).collect()[0]
    assert row["m"] == "***-**-6789"
    out = run_statement(
        spark, "DROP FUNCTION fcat.gold.mask_ssn"
    ).collect()[0]
    assert out["dropped"]
    # the temp binding is gone AND the registry forgot the full name
    with pytest.raises(Exception):
        run_statement(spark, "SELECT fcat.gold.mask_ssn('x') AS m")
    # IF EXISTS idempotence for multi-part; loud refusal without
    assert not run_statement(
        spark, "DROP FUNCTION IF EXISTS fcat.gold.mask_ssn"
    ).collect()[0]["dropped"]
    with pytest.raises(ValueError, match="no such function"):
        run_statement(spark, "DROP FUNCTION fcat.gold.mask_ssn")
    # create -> drop -> recreate under the same basename works (the
    # basename-clash guard must have been cleared by the drop)
    run_statement(
        spark,
        "CREATE FUNCTION other.gold.mask_ssn(s STRING) RETURNS STRING "
        "RETURN 'redacted'",
    )
    assert (
        run_statement(
            spark, "SELECT other.gold.mask_ssn('x') AS m"
        ).collect()[0]["m"]
        == "redacted"
    )
    run_statement(spark, "DROP FUNCTION mask_ssn")  # basename form


def test_drop_mounted_share_catalog(spark, tmp_path):
    """DROP CATALOG over a share-mounted catalog unmounts the views
    and the namespace rows."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "mt"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "mcat.gold.mt", t)
    spark.conf.set(share_sql.ROOT_CONF, str(tmp_path / "root"))
    try:
        run_statement(spark, "CREATE SHARE ms")
        run_statement(spark, "ALTER SHARE ms ADD TABLE mcat.gold.mt")
        run_statement(spark, "CREATE RECIPIENT mr")
        run_statement(spark, "GRANT SELECT ON SHARE ms TO RECIPIENT mr")
        spark.conf.set(
            share_sql.PROFILE_CONF,
            str(tmp_path / "root" / "recipients" / "mr.share"),
        )
        run_statement(spark, "CREATE CATALOG partner_data USING SHARE ms")
        assert (
            run_statement(
                spark, "SELECT COUNT(*) AS n FROM partner_data.gold.mt"
            ).collect()[0]["n"]
            == 1
        )
        with pytest.raises(ValueError, match="not empty"):
            run_statement(spark, "DROP CATALOG partner_data")
        assert run_statement(
            spark, "DROP CATALOG partner_data CASCADE"
        ).collect()[0]["dropped"]
        sid = session_key(spark)
        assert not share_sql._MOUNTS.get(sid)
        cats = {
            r["catalog"]
            for r in run_statement(spark, "SHOW CATALOGS").collect()
        }
        assert "partner_data" not in cats
    finally:
        spark.conf.unset(share_sql.ROOT_CONF)
        spark.conf.unset(share_sql.PROFILE_CONF)


def test_drop_schema_name_equals_table_is_not_a_schema(spark, tmp_path):
    """A table registered AS ``sales.orders`` is a table: plain
    DROP SCHEMA sales.orders must not unregister it (that would
    bypass RESTRICT)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "so"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "sales.orders", t)
    out = run_statement(
        spark, "DROP SCHEMA IF EXISTS sales.orders"
    ).collect()[0]
    assert not out["dropped"]
    assert (session_key(spark), "sales.orders") in sqldml._REGISTRY
    with pytest.raises(ValueError, match="no such schema"):
        run_statement(spark, "DROP SCHEMA sales.orders")
    assert (session_key(spark), "sales.orders") in sqldml._REGISTRY


def test_drop_table_purges_grants(spark, tmp_path):
    """Re-creating a dropped name must not resurrect old privileges
    (UC deletes grants with the securable)."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "gp"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "gcat.gold.gp", t)
    acl.grant(spark, "SELECT", "TABLE", "gcat.gold.gp", "intern")
    assert acl.show_grants(spark, on="gcat.gold.gp").count() == 1
    run_statement(spark, "DROP TABLE gcat.gold.gp")
    assert acl.show_grants(spark, on="gcat.gold.gp").count() == 0
    # re-register the same name: the old grant must NOT come back
    sqldml.register_table(spark, "gcat.gold.gp", t)
    assert acl.show_grants(spark, on="gcat.gold.gp").count() == 0


def test_drop_catalog_cascade_purges_grants_and_functions(
    spark, tmp_path
):
    t = LakeTable.create(
        spark,
        str(tmp_path / "cf"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "fncat.gold.cf", t)
    acl.grant(spark, "SELECT", "TABLE", "fncat.gold.cf", "intern")
    acl.grant(spark, "USAGE", "CATALOG", "fncat", "intern")
    run_statement(
        spark,
        "CREATE FUNCTION fncat.gold.redact(s STRING) RETURNS STRING "
        "RETURN 'x'",
    )
    # the contained function blocks RESTRICT ...
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP CATALOG fncat")
    assert run_statement(
        spark, "DROP CATALOG fncat CASCADE"
    ).collect()[0]["dropped"]
    # ... and CASCADE removed it: the basename is free again
    run_statement(
        spark,
        "CREATE FUNCTION elsewhere.gold.redact(s STRING) RETURNS "
        "STRING RETURN 'y'",
    )
    run_statement(spark, "DROP FUNCTION elsewhere.gold.redact")
    # grants on the catalog AND on tables under it are gone
    assert acl.show_grants(spark, on="fncat").count() == 0
    assert acl.show_grants(spark, on="fncat.gold.cf").count() == 0


def test_drop_function_mixed_case_basename(spark):
    run_statement(
        spark,
        "CREATE FUNCTION fcat.gold.Mask_SSN(s STRING) RETURNS STRING "
        "RETURN 'm'",
    )
    out = run_statement(spark, "DROP FUNCTION Mask_SSN").collect()[0]
    assert out["dropped"]
    from databricks_delta_lake_project_spark.queries import sqlpack

    assert not sqlpack._FUNCS.get(session_key(spark))
    # the registry forgot the binding, so the basename is free
    run_statement(
        spark,
        "CREATE FUNCTION other.gold.mask_ssn(s STRING) RETURNS STRING "
        "RETURN 'n'",
    )
    run_statement(spark, "DROP FUNCTION other.gold.mask_ssn")


def test_drop_table_if_exists_engine_style_idempotent(spark, tmp_path):
    """Teardown scripts re-run: DROP TABLE IF EXISTS on a 3-part
    engine-style name that is not (or no longer) registered returns
    dropped=false instead of native CATALOG_NOT_FOUND."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "ie"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "ditcat.bronze.t1", t)
    run_statement(spark, "DROP SCHEMA ditcat.bronze CASCADE")
    out = run_statement(
        spark, "DROP TABLE IF EXISTS ditcat.bronze.t1"
    ).collect()[0]
    assert not out["dropped"]
    with pytest.raises(ValueError, match="no such table"):
        run_statement(spark, "DROP TABLE ditcat.bronze.t1")


def test_drop_gate_before_existence_no_oracle(spark):
    """Unprivileged principals get the SAME refusal whether the
    securable exists or not — DROP must not be an inventory probe."""
    run_statement(spark, "CREATE VOLUME ocat.land.real_vol")
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="DROP VOLUME"):
            run_statement(spark, "DROP VOLUME ocat.land.real_vol")
        with pytest.raises(PermissionError, match="DROP VOLUME"):
            run_statement(spark, "DROP VOLUME ocat.land.no_such_vol")
        # IF EXISTS doesn't leak either
        with pytest.raises(PermissionError, match="DROP VOLUME"):
            run_statement(
                spark, "DROP VOLUME IF EXISTS ocat.land.no_such_vol"
            )
        with pytest.raises(PermissionError, match="DROP CATALOG"):
            run_statement(spark, "DROP CATALOG IF EXISTS ocat")
        with pytest.raises(PermissionError, match="DROP CATALOG"):
            run_statement(spark, "DROP CATALOG IF EXISTS no_such_cat")
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
    run_statement(spark, "DROP CATALOG ocat CASCADE")


def test_drop_volume_does_not_fabricate_dirs(spark, tmp_path):
    """DROP VOLUME on a managed volume whose backing dir is already
    gone must not mkdir the tree it is about to remove."""
    root = tmp_path / "vols"
    spark.conf.set(metasql.VOLUMES_ROOT_CONF, str(root))
    try:
        out = run_statement(
            spark, "CREATE VOLUME fab.cat.v"
        ).collect()[0]
        import shutil

        shutil.rmtree(root)  # simulate external cleanup
        assert run_statement(spark, "DROP VOLUME fab.cat.v").collect()[
            0
        ]["dropped"]
        assert not root.exists()
    finally:
        spark.conf.unset(metasql.VOLUMES_ROOT_CONF)


def test_drop_table_ambiguous_basename_refused(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "amb"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "acat1.gold.ords", t)
    sqldml.register_table(spark, "acat2.gold.ords", t)
    with pytest.raises(ValueError, match="ambiguous"):
        run_statement(spark, "DROP TABLE ords")
    # both registrations intact
    sid = session_key(spark)
    assert (sid, "acat1.gold.ords") in sqldml._REGISTRY
    assert (sid, "acat2.gold.ords") in sqldml._REGISTRY


def test_drop_function_gated_and_no_oracle(spark):
    run_statement(
        spark,
        "CREATE FUNCTION gfcat.gold.gf(s STRING) RETURNS STRING "
        "RETURN 'x'",
    )
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        # same refusal whether the function exists or not
        with pytest.raises(PermissionError, match="DROP FUNCTION"):
            run_statement(spark, "DROP FUNCTION gfcat.gold.gf")
        with pytest.raises(PermissionError, match="DROP FUNCTION"):
            run_statement(
                spark, "DROP FUNCTION IF EXISTS gfcat.gold.nope"
            )
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
    assert run_statement(
        spark, "DROP FUNCTION gfcat.gold.gf"
    ).collect()[0]["dropped"]


def test_drop_function_two_part_native_fallthrough(spark):
    """2-part persistent functions are native Spark territory: the
    engine must not hijack their DROP with 'no such function'."""
    out = run_statement(
        spark, "DROP FUNCTION IF EXISTS default.never_bound_fn"
    )
    # native statement result, not the engine's dropped-report shape
    assert "dropped" not in out.columns


def test_drop_table_exact_only_keeps_extending_names(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "ex"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "exc.b", t)
    sqldml.register_table(spark, "exc.b.c", t)
    acl.grant(spark, "SELECT", "TABLE", "exc.b.c", "intern")
    run_statement(spark, "DROP TABLE exc.b")
    sid = session_key(spark)
    assert (sid, "exc.b") not in sqldml._REGISTRY
    # the dotted-extension registration is a DIFFERENT table
    assert (sid, "exc.b.c") in sqldml._REGISTRY
    assert acl.show_grants(spark, on="exc.b.c").count() == 1


def test_drop_catalog_cascade_function_only_namespace(spark):
    """A namespace holding ONLY SQL functions is still droppable —
    otherwise the basename-clash guard blocks re-creation forever."""
    run_statement(
        spark,
        "CREATE FUNCTION solo.gold.fonly(x INT) RETURNS INT RETURN x",
    )
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP CATALOG solo")
    assert run_statement(
        spark, "DROP CATALOG solo CASCADE"
    ).collect()[0]["dropped"]
    # basename freed
    run_statement(
        spark,
        "CREATE FUNCTION other.ns.fonly(x INT) RETURNS INT RETURN x",
    )
    run_statement(spark, "DROP FUNCTION other.ns.fonly")


def test_drop_table_ambiguous_gated_under_enforcement(spark, tmp_path):
    """Unprivileged principals get the uniform PermissionError, not
    the matches-list (inventory) of the ambiguity refusal."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "ag"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "agc1.gold.dupn", t)
    sqldml.register_table(spark, "agc2.gold.dupn", t)
    spark.conf.set(acl.ENABLED_CONF, "true")
    spark.conf.set(acl.PRINCIPAL_CONF, "intern")
    try:
        with pytest.raises(PermissionError, match="DROP TABLE"):
            run_statement(spark, "DROP TABLE dupn")
        # admins still get the helpful ambiguity refusal
        spark.conf.set(acl.ADMINS_CONF, "intern")
        with pytest.raises(ValueError, match="ambiguous"):
            run_statement(spark, "DROP TABLE dupn")
    finally:
        spark.conf.set(acl.ENABLED_CONF, "false")
        spark.conf.unset(acl.PRINCIPAL_CONF)
        spark.conf.unset(acl.ADMINS_CONF)


def test_drop_table_share_mounted_redirect(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "rmt"),
        df=spark.createDataFrame([Row(a=1)]),
    )
    sqldml.register_table(spark, "rcat.gold.rmt", t)
    spark.conf.set(share_sql.ROOT_CONF, str(tmp_path / "root"))
    try:
        run_statement(spark, "CREATE SHARE rs")
        run_statement(spark, "ALTER SHARE rs ADD TABLE rcat.gold.rmt")
        run_statement(spark, "CREATE RECIPIENT rr")
        run_statement(spark, "GRANT SELECT ON SHARE rs TO RECIPIENT rr")
        spark.conf.set(
            share_sql.PROFILE_CONF,
            str(tmp_path / "root" / "recipients" / "rr.share"),
        )
        run_statement(spark, "CREATE CATALOG partner_r USING SHARE rs")
        with pytest.raises(ValueError, match="share-mounted"):
            run_statement(spark, "DROP TABLE partner_r.gold.rmt")
        run_statement(spark, "DROP CATALOG partner_r CASCADE")
    finally:
        spark.conf.unset(share_sql.ROOT_CONF)
        spark.conf.unset(share_sql.PROFILE_CONF)


def test_drop_catalog_existing_only_via_schema(spark):
    """CREATE SCHEMA c.s never required CREATE CATALOG c, so DROP
    CATALOG c CASCADE must still find and drop that subtree."""
    run_statement(spark, "CREATE SCHEMA implied_cat.sales")
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP CATALOG implied_cat")
    assert run_statement(
        spark, "DROP CATALOG implied_cat CASCADE"
    ).collect()[0]["dropped"]
    assert "implied_cat.sales" not in metasql.declared_namespaces(
        spark, "schema"
    )
    # a catalog existing only via a layer tag is droppable too
    run_statement(spark, "ALTER CATALOG tag_only SET TAGS ('l' = 'x')")
    assert run_statement(
        spark, "DROP CATALOG tag_only CASCADE"
    ).collect()[0]["dropped"]
    from databricks_delta_lake_project_spark.governance import systables

    assert "tag_only" not in systables.layer_tags(spark, "catalog")


def test_drop_catalog_tagged_child_restricts(spark):
    """A tag on a child namespace is governed metadata: plain DROP
    refuses; CASCADE removes it; an UNSET-emptied tag dict is NOT
    existence evidence."""
    run_statement(
        spark, "ALTER SCHEMA tcat2.sales SET TAGS ('pii' = 'true')"
    )
    with pytest.raises(ValueError, match="not empty"):
        run_statement(spark, "DROP CATALOG tcat2")
    assert run_statement(
        spark, "DROP CATALOG tcat2 CASCADE"
    ).collect()[0]["dropped"]
    from databricks_delta_lake_project_spark.governance import systables

    assert "tcat2.sales" not in systables.layer_tags(spark, "schema")
    # unset-to-empty leaves no ghost catalog behind
    run_statement(spark, "ALTER CATALOG ghost SET TAGS ('a' = '1')")
    run_statement(spark, "ALTER CATALOG ghost UNSET TAGS ('a')")
    with pytest.raises(ValueError, match="no such catalog"):
        run_statement(spark, "DROP CATALOG ghost")
