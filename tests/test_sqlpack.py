"""SQL dialect entry path: normalize_sql string rules and the
session-bound ``VERSION AS OF`` / ``TIMESTAMP AS OF`` time-travel
rewrite (reference ``src/utils/delta_lake_features.py:103-108``)."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import Row

from databricks_delta_lake_project_spark.queries.sqlpack import (
    normalize_sql,
    rewrite_time_travel,
    run_sql,
)
from databricks_delta_lake_project_spark.tables import LakeTable

SF = "/root/testdata/sf0.001"


def test_normalize_sql_rules():
    assert (
        normalize_sql("SELECT DATEADD(DAY, -30, GETDATE())")
        == "SELECT timestampadd(DAY, -30, current_timestamp())"
    )
    assert "timestampdiff(DAY" in normalize_sql("SELECT DATEDIFF(DAY, a, b)")
    assert "engine_is_group_member(" in normalize_sql(
        "SELECT IS_ACCOUNT_GROUP_MEMBER('admins')"
    )
    assert "FROM t__history" in normalize_sql("SELECT * FROM (DESCRIBE HISTORY t)")


def _two_version_table(spark, tmp_path) -> LakeTable:
    path = str(tmp_path / "versioned")
    t = LakeTable.create(
        spark, path, df=spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")])
    )
    t.overwrite(spark.createDataFrame([Row(id=3, v="c")]))
    return t


def test_version_as_of_native(spark, tmp_path):
    t = _two_version_table(spark, tmp_path)
    old = run_sql(
        spark, SF, f"SELECT COUNT(*) AS n FROM delta.`{t.root}` VERSION AS OF 0"
    ).first()["n"]
    new = run_sql(
        spark, SF, f"SELECT COUNT(*) AS n FROM delta.`{t.root}` VERSION AS OF 1"
    ).first()["n"]
    assert (old, new) == (2, 1)


def test_timestamp_as_of_native(spark, tmp_path):
    t = _two_version_table(spark, tmp_path)
    ts0 = t.history().filter("version = 0").first()["timestamp_ms"]
    iso = datetime.fromtimestamp(ts0 / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f+00:00"
    )
    df = run_sql(
        spark, SF, f"SELECT id, v FROM `{t.root}` TIMESTAMP AS OF '{iso}'"
    )
    assert {r["id"] for r in df.collect()} == {1, 2}


def test_version_as_of_joins_current(spark, tmp_path):
    """Time-travel refs compose inside a bigger statement (self-join of
    two snapshots — the reference's audit-diff pattern)."""
    t = _two_version_table(spark, tmp_path)
    df = run_sql(
        spark,
        SF,
        f"""
        SELECT a.id FROM delta.`{t.root}` VERSION AS OF 0 a
        LEFT ANTI JOIN delta.`{t.root}` VERSION AS OF 1 b ON a.id = b.id
        """,
    )
    assert {r["id"] for r in df.collect()} == {1, 2}


def test_version_as_of_external_delta(spark, tmp_path):
    """The rewrite resolves through for_path, so an external Delta
    table (read-only interop) time-travels too."""
    root = tmp_path / "ext"
    data = root / "f0.parquet"
    spark.createDataFrame([Row(id=1)]).coalesce(1).write.parquet(str(root / "_t"))
    next((root / "_t").glob("part-*.parquet")).rename(
        data.parent.mkdir(parents=True, exist_ok=True) or data
    )
    log = root / "_delta_log"
    log.mkdir()
    schema = spark.createDataFrame([Row(id=1)]).schema.json()
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "x",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema,
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 1, "dataChange": True}},
    ]
    (log / f"{0:020d}.json").write_text("\n".join(json.dumps(a) for a in actions))
    out = run_sql(spark, SF, f"SELECT * FROM delta.`{root}` VERSION AS OF 0")
    assert out.collect() == [Row(id=1)]


def test_rewrite_leaves_plain_sql_alone(spark):
    sql = "SELECT COUNT(*) FROM orders WHERE o_custkey = 1"
    assert rewrite_time_travel(spark, sql) == sql


def test_qualify_rewrite(spark):
    """Databricks/Snowflake QUALIFY -> OSS Spark: the dedup idiom
    (`QUALIFY ROW_NUMBER() OVER ... = 1`) runs; predicates may
    reference select-list aliases inside their window (the retry path
    substitutes the defining expression); semantic-changing shapes
    (DISTINCT, set ops, subquery-level QUALIFY) bail untouched and
    surface Spark's own error."""
    from databricks_delta_lake_project_spark.queries.sqlpack import (
        _rewrite_qualify,
        run_statement,
    )

    out = run_statement(
        spark,
        "SELECT k, v FROM VALUES (1,'a'),(1,'b'),(2,'c') AS t(k,v) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1 "
        "ORDER BY k",
    )
    assert [tuple(r) for r in out.collect()] == [(1, "a"), (2, "c")]
    assert out.columns == ["k", "v"]
    # WHERE + GROUP BY + an ALIAS referenced inside the window (OSS
    # Spark refuses lateral aliases in windows; the retry substitutes)
    out = run_statement(
        spark,
        "SELECT k, count(*) AS n FROM "
        "VALUES (1,'a'),(1,'b'),(2,'c'),(3,'d') AS t(k,v) "
        "WHERE k < 3 GROUP BY k "
        "QUALIFY RANK() OVER (ORDER BY n DESC) = 1",
    )
    assert [tuple(r) for r in out.collect()] == [(1, 2)]
    # a CTE head attaches to the rewritten outer select
    out = run_statement(
        spark,
        "WITH w AS (SELECT 1 AS k UNION ALL SELECT 1) "
        "SELECT k FROM w QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1",
    )
    assert [tuple(r) for r in out.collect()] == [(1,)]
    # `* EXCEPT (c)` is star syntax, not a set op: still rewrites
    out = run_statement(
        spark,
        "SELECT * EXCEPT (v) FROM VALUES (1,'a'),(1,'b') AS t(k,v) "
        "QUALIFY ROW_NUMBER() OVER (ORDER BY k) = 1",
    )
    assert [tuple(r) for r in out.collect()] == [(1,)]
    # bail-outs stay textually untouched (loud native error beats a
    # silent misread)
    for sql in (
        "SELECT DISTINCT k FROM t QUALIFY f() = 1",
        "SELECT k FROM a QUALIFY f() = 1 UNION SELECT k FROM b",
        "SELECT * FROM (SELECT k FROM t QUALIFY f() = 1)",
    ):
        assert _rewrite_qualify(sql) == sql
    # a string literal containing QUALIFY never triggers the rewrite
    sql = "SELECT 'use QUALIFY here' AS tip FROM t"
    assert _rewrite_qualify(sql) == sql
