"""Mimics the driver's t2 gate: every catalog query with an oracle must
match DuckDB exactly (rows + schema + values) on the deterministic
testdata."""

from __future__ import annotations

import pytest

from databricks_delta_lake_project_spark.parity import run_parity
from databricks_delta_lake_project_spark.queries.catalog import QUERIES

from conftest import SF_SMALL

NAMES = sorted(QUERIES.keys())


@pytest.mark.parametrize("name", NAMES)
def test_parity(spark, name):
    res = run_parity(spark, SF_SMALL, name)
    if res.get("rows_only"):
        assert res["spark_rows"] >= 0
        return
    assert res["rows_match"], res
    assert res["schema_match"], res
    assert res["values_match"], res
