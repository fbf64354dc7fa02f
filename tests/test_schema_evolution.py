"""Schema-on-write enforcement vs evolution (§1.3: Delta rejects
unknown columns unless mergeSchema)."""

from __future__ import annotations

import pytest

from databricks_delta_lake_project_spark.tables import LakeTable


@pytest.fixture()
def tbl(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"),
        df=spark.createDataFrame([(1, "a")], "id long, v string"),
    )


def test_append_missing_column_null_fills(spark, tbl):
    tbl.append(spark.createDataFrame([(2,)], "id long"))
    got = {r["id"]: r["v"] for r in tbl.to_df().collect()}
    assert got == {1: "a", 2: None}


def test_append_extra_column_rejected(spark, tbl):
    bad = spark.createDataFrame([(2, "b", 9.5)], "id long, v string, score double")
    with pytest.raises(ValueError, match="schema enforcement"):
        tbl.append(bad)


def test_append_merge_schema_evolves(spark, tbl):
    evolved = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    )
    tbl.append(evolved, merge_schema=True)
    df = tbl.to_df()
    assert [f.name for f in df.schema.fields] == ["id", "v", "score"]
    got = {r["id"]: (r["v"], r["score"]) for r in df.collect()}
    # old rows null-fill the evolved column
    assert got == {1: ("a", None), 2: ("b", 9.5)}


def test_append_casts_compatible_types(spark, tbl):
    tbl.append(spark.createDataFrame([(3, 42)], "id long, v int"))  # int -> string
    got = {r["id"]: r["v"] for r in tbl.to_df().collect()}
    assert got[3] == "42"
