"""CDC apply: land a change feed into a current-state table.

Reference: ``/root/reference/src/silver/transform_support_tickets.py:42-147``
(drop ``update_preimage`` :56-60, latest-op-per-key via row_number
:63-73, upsert/delete split :113-147) — collapsed here into ONE merge,
matching the single-MERGE SQL variant the reference documents at
``src/utils/delta_lake_features.py:311-323``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import LakeTable
from .dedup import deduplicate


def latest_changes(
    changes: DataFrame,
    key: str,
    ts_col: str = "cdc_timestamp",
    op_col: str = "cdc_operation",
) -> DataFrame:
    """Keep only the newest operation per key; pre-images are metadata,
    not state."""
    return deduplicate(
        changes.filter(F.col(op_col) != "update_preimage"),
        keys=[key],
        order_by=[F.col(ts_col).desc()],
    )


def cdc_apply(
    table: LakeTable,
    changes: DataFrame,
    key: str,
    ts_col: str = "cdc_timestamp",
    op_col: str = "cdc_operation",
    soft_delete: bool = False,
) -> dict[str, int]:
    """Apply insert/update/delete changes. ``soft_delete`` flips a
    ``status='deleted'`` marker instead of removing the row (the
    reference's support-ticket behavior,
    ``transform_support_tickets.py:131-140``)."""
    latest = latest_changes(changes, key, ts_col, op_col)
    data_cols = [c for c in latest.columns if c != op_col]
    src = latest.select(*data_cols, F.col(op_col).alias("__op"))

    m = table.merge(src, f"t.{key} = s.{key}")
    if soft_delete:
        m = m.whenMatchedUpdate(
            condition="s.__op = 'delete'", set={"status": "'deleted'"}
        )
    else:
        m = m.whenMatchedDelete(condition="s.__op = 'delete'")
    res = (
        m.whenMatchedUpdateAll()
        .whenNotMatchedInsertAll(condition="s.__op <> 'delete'")
        .execute()
    )
    return res
