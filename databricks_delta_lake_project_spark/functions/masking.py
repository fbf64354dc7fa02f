"""Masking + row/column-level security emulation (U1-U3, P15 in
SURVEY §2.3/§2.10; reference ``governance/access_control.py:77-143``).

Unity Catalog binds mask UDFs to columns and gates them on
``IS_ACCOUNT_GROUP_MEMBER``; OSS Spark has neither, so the engine
provides (per SURVEY §2.10 U2-U3):

* the same mask expressions as Catalyst columns,
* ``is_group_member`` reading the session-configured principal groups
  (``spark.conf`` key), and
* ``secured_view`` — creates a temp view applying masks/row filters
  unless the session principal is in the privileged group: the
  secured-VIEW pattern that replaces ``ALTER TABLE ... SET MASK``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GROUPS_CONF_KEY = "spark.databricks_delta_lake_project_spark.principal.groups"


def mask_email(email: Column) -> Column:
    """``CONCAT(LEFT(email,2), '***@', SPLIT(email,'@')[1])``
    (``access_control.py:111-121``)."""
    return F.when(
        email.isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.concat(
            F.substring(email, 1, 2), F.lit("***@"), F.split(email, "@").getItem(1)
        )
    )


def mask_phone(phone: Column) -> Column:
    """``'***-***-' || RIGHT(phone, 4)`` (``access_control.py:123-133``)."""
    return F.when(phone.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("***-***-"), F.substring(phone, -4, 4))
    )


def is_group_member(spark: SparkSession, group: str) -> bool:
    """Engine replacement for ``IS_ACCOUNT_GROUP_MEMBER`` (U3): the
    session's groups come from a conf key set by the operator."""
    raw = ""
    try:
        raw = spark.conf.get(GROUPS_CONF_KEY)
    except Exception:
        raw = ""
    return group in {g.strip() for g in (raw or "").split(",") if g.strip()}


def secured_view(
    spark: SparkSession,
    df: DataFrame,
    view_name: str,
    masks: dict[str, Column],
    privileged_group: str = "pii_readers",
    row_filter: Column | None = None,
) -> DataFrame:
    """Create a temp view where PII columns are masked and rows
    filtered unless the session principal is privileged (the RLS view
    shape of ``access_control.py:77-97``). Returns the view's frame."""
    privileged = is_group_member(spark, privileged_group)
    out = df
    if not privileged:
        out = out.select(
            *[
                masks[c].alias(c) if c in masks else F.col(c)
                for c in out.columns
            ]
        )
        if row_filter is not None:
            out = out.filter(row_filter)
    out.createOrReplaceTempView(view_name)
    return out
