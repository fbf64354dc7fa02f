"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column-name set, and
order-insensitive cell values (exact — the driver hashes values, so
bit-level agreement is the target).
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb
from pyspark.sql import DataFrame, SparkSession

from .queries.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v: Any) -> Any:
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    try:  # pandas NaT/NaN passed through .to_dict paths
        import pandas as pd

        if v is pd.NaT:
            return None
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime().replace(tzinfo=None).isoformat()
    except Exception:
        pass
    import numpy as np

    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NaN" if math.isnan(f) else f
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


def _rows(cols: list[str], records: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in records]
    out.sort(key=lambda row: tuple((x is None, str(type(x)), str(x)) for x in row))
    return out


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> dict[str, Any]:
    s_cols = spark_df.columns
    s_records = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [d[0] for d in cur.description]
    d_records = cur.fetchall()

    result: dict[str, Any] = {
        "spark_rows": len(s_records),
        "oracle_rows": len(d_records),
        "rows_match": len(s_records) == len(d_records),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "spark_cols": sorted(s_cols),
        "oracle_cols": sorted(d_cols),
    }
    if result["rows_match"] and result["schema_match"]:
        sr = _rows(s_cols, s_records)
        dr = _rows(d_cols, d_records)
        result["values_match"] = sr == dr
        if not result["values_match"]:
            diffs = [
                (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
            ][:5]
            result["first_diffs"] = diffs
    else:
        result["values_match"] = False
    return result


def run_parity(spark: SparkSession, sf_dir: str, name: str) -> dict[str, Any]:
    from .queries.catalog import QUERIES

    fn, sql = QUERIES[name]
    if sql is None:
        df = fn(spark, sf_dir)
        return {"rows_only": True, "spark_rows": df.count(), "values_match": None}
    con = duckdb_connection(sf_dir)
    try:
        return compare(fn(spark, sf_dir), con, sql)
    finally:
        con.close()
