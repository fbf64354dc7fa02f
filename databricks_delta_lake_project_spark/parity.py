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
        # NaN -> None: a pandas-converted NULL float is NaN while Spark
        # collects None; the driver treats them as equal (q37 is green).
        if math.isnan(v):
            return None
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        # Dates widen to midnight timestamps so a Spark DateType cell
        # equals the datetime64 pandas produces for a DuckDB DATE.
        return _dt.datetime(v.year, v.month, v.day).isoformat()
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
        return None if math.isnan(f) else f
    if isinstance(v, (np.bool_,)):
        return bool(v)
    return v


def _strict(v: Any) -> Any:
    """Type-tag numerics so int vs float mismatches are caught.

    The driver hashes pandas-converted values, where DuckDB HUGEINT
    (any integer SUM) becomes float64; Python's ``150 == 150.0`` would
    hide that, so tag the type class into the comparison value.
    """
    import numpy as np

    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, dict):
        return tuple(sorted((k, _strict(x)) for k, x in v.items()))
    try:
        from pyspark.sql import Row

        if isinstance(v, Row):
            return tuple(sorted((k, _strict(x)) for k, x in v.asDict().items()))
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return tuple(_strict(x) for x in v)
    v = _canon(v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", v)
    return v


def _rows(cols: list[str], records: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_strict(r[i]) for i in order) for r in records]
    out.sort(key=lambda row: tuple((x is None, str(type(x)), str(x)) for x in row))
    return out


def compare(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, sql: str
) -> dict[str, Any]:
    s_cols = spark_df.columns
    s_records = [tuple(r) for r in spark_df.collect()]
    # Emulate the driver: DuckDB results go through pandas conversion,
    # where HUGEINT -> float64 while COUNT(*) stays int64. fetchall()
    # would hand back Python ints and hide that artifact.
    pdf = con.execute(sql).df()
    d_cols = list(pdf.columns)
    d_records = [tuple(r) for r in pdf.itertuples(index=False, name=None)]

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
