"""SCD Type 2 maintenance over a LakeTable.

Re-derives the reference's two-step SCD2
(``/root/reference/src/silver/transform_customers.py:220-287``: change
detection :246-262, close current :266-275, insert new :277-285) as one
change-detection pass + one MERGE + one append. Semantics match; the
staged-change pass removes the reference's race between close and
re-insert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import LakeTable

SCD_COLS = ("effective_start_ts", "effective_end_ts", "is_current")


def scd2_prepare_initial(source: DataFrame, ts_col: str) -> DataFrame:
    """Shape a source batch as the initial SCD2 state."""
    return (
        source.withColumn("effective_start_ts", F.col(ts_col))
        .withColumn("effective_end_ts", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    table: LakeTable,
    source: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str,
) -> dict[str, int]:
    """Apply a source batch to an SCD2 table.

    * rows whose tracked columns changed: current version closed
      (``effective_end_ts`` = source ts, ``is_current`` = false) and a
      new current version inserted;
    * brand-new keys: inserted as current;
    * unchanged rows: untouched.

    Change detection is null-safe (``<=>``), mirroring the reference's
    column-compare loop at ``transform_customers.py:252-259``.
    """
    current = table.to_df().filter(F.col("is_current"))

    diff = " OR ".join(f"NOT (s.{c} <=> t.{c})" for c in tracked)
    staged = (
        source.alias("s")
        .join(current.alias("t"), F.expr(f"s.{key} = t.{key}"), "left")
        .filter(F.expr(f"t.{key} IS NULL OR ({diff})"))
        .select("s.*")
        .persist()
    )
    n_staged = staged.count()
    if n_staged == 0:
        staged.unpersist()
        return {"closed": 0, "inserted": 0}

    # 1. close the versions being superseded
    m = (
        table.merge(staged, f"t.{key} = s.{key} AND t.is_current = true")
        .whenMatchedUpdate(
            set={
                "effective_end_ts": f"s.{ts_col}",
                "is_current": "false",
            }
        )
        .execute()
    )
    # 2. insert the new current versions
    table.append(scd2_prepare_initial(staged, ts_col))
    staged.unpersist()
    return {"closed": m["numTargetRowsUpdated"], "inserted": n_staged}
