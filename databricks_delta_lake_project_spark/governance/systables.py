"""Engine-owned system tables (X9/X11 SQL tail): the
``system.information_schema.table_tags / column_tags / catalog_tags /
schema_tags`` classification views and the ``system.access.audit``
access-event table the reference queries as plain SQL
(``governance/data_classification.py:279-300`` classification report,
``governance/compliance_policies.py:321-334,387-394`` access audit +
PII exposure, ``governance/lineage_and_audit.py:92-124`` audit/system
table tour).

Design: Unity Catalog materializes these in the managed control plane;
the engine serves the same query surface from its OWN metadata —
table/column tags live in each table's commit log
(``engine.tags.* / engine.coltags.*`` properties, durable), catalog/
schema tags live in a session registry (same scope as the ACL grants
registry), and audit events are recorded at the enforcement boundary
(``access_control.enforce``) whenever ``spark.engine.accessControl.
enabled`` is on. :func:`repoint` rewrites the ``system.*`` names in a
statement to engine temp views built on demand, so the reference's
report SQL runs verbatim through ``queries/sqlpack.run_statement``.

Columns carry BOTH the ``table_catalog/table_schema`` spellings the
reference's queries use and the ``catalog_name/schema_name`` spellings
the Databricks docs list, so either dialect of report SQL works.

Visibility: with ACL enforcement on, tag rows are filtered to
securables the session principal may list (``access_control.can_list``
— the same rule SHOW TABLES applies), and ``system.access.audit``
requires admin rights (``ADMINS_CONF`` membership or ALL PRIVILEGES on
the ``system`` catalog), mirroring UC's admin-gated system tables.

Scale notes: all views are O(registry)/O(events) driver-side metadata
turned into small DataFrames — no data files are read. The audit
buffer is capped (oldest dropped past ``_AUDIT_CAP``) so a long-lived
enforcing session cannot grow the driver without bound; deployments
needing a durable audit trail attach ``compliance.AuditLog``.
"""

from __future__ import annotations

import datetime as _dt
import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..session import session_key

__all__ = [
    "set_layer_tags",
    "layer_tags",
    "table_tags_df",
    "column_tags_df",
    "catalog_tags_df",
    "schema_tags_df",
    "record_access",
    "audit_df",
    "repoint",
]

# ---------------------------------------------------------------------------
# catalog / schema tags (session registry — tables carry their own tags
# in the commit log; catalogs/schemas have no log to ride)
# ---------------------------------------------------------------------------

# session -> (level, name) -> {tag: value}; level in {"catalog","schema"}
_LAYER_TAGS: dict[str, dict[tuple[str, str], dict[str, str]]] = {}


def set_layer_tags(
    spark: SparkSession,
    level: str,
    name: str,
    tags: dict[str, str],
    unset: bool = False,
) -> None:
    """``ALTER CATALOG|SCHEMA <name> SET/UNSET TAGS (...)`` (reference
    ``data_classification.py:39-48``). Session-scoped, like the ACL
    grants registry."""
    level = level.lower()
    if level not in ("catalog", "schema"):
        raise ValueError(f"unknown tag level {level!r}")
    reg = _LAYER_TAGS.setdefault(session_key(spark), {})
    cur = reg.setdefault((level, name.strip("`").lower()), {})
    if unset:
        for k in tags:
            cur.pop(k, None)
    else:
        cur.update({k: str(v) for k, v in tags.items()})


def layer_tags(
    spark: SparkSession, level: str
) -> dict[str, dict[str, str]]:
    """``{name: {tag: value}}`` for one level ('catalog'|'schema')."""
    reg = _LAYER_TAGS.get(session_key(spark), {})
    return {
        name: dict(tags)
        for (lvl, name), tags in reg.items()
        if lvl == level and tags
    }


# ---------------------------------------------------------------------------
# name resolution helpers
# ---------------------------------------------------------------------------


def _split_name(name: str) -> tuple[str, str, str]:
    """Registered name -> (catalog, schema, table); shorter names fill
    with Spark's defaults so WHERE table_catalog = ... filters behave."""
    bits = name.split(".")
    if len(bits) >= 3:
        return bits[0], bits[1], ".".join(bits[2:])
    if len(bits) == 2:
        return "spark_catalog", bits[0], bits[1]
    return "spark_catalog", "default", bits[0]


def _visible_tables(spark: SparkSession):
    """(full_name, LakeTable) pairs the session principal may see —
    the SHOW TABLES listing rule."""
    from ..tables import sqldml
    from . import access_control as acl

    sid = session_key(spark)
    enforcing = acl.enabled(spark)
    for (s, n), t in sorted(sqldml._REGISTRY.items()):
        if s != sid:
            continue
        if "/" in n:
            continue  # path-registered: no namespace to report under
        if enforcing and not acl.can_list(spark, n):
            continue
        yield n, t


# ---------------------------------------------------------------------------
# information_schema tag views
# ---------------------------------------------------------------------------

_TABLE_TAGS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "tag_name string, tag_value string, "
    "catalog_name string, schema_name string"
)
_COLUMN_TAGS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "column_name string, tag_name string, tag_value string, "
    "catalog_name string, schema_name string"
)


def table_tags_df(spark: SparkSession) -> DataFrame:
    rows = []
    for name, t in _visible_tables(spark):
        cat, sch, tbl = _split_name(name)
        for k, v in sorted(t.tags().items()):
            rows.append((cat, sch, tbl, k, v, cat, sch))
    return spark.createDataFrame(rows, _TABLE_TAGS_SCHEMA)


def column_tags_df(spark: SparkSession) -> DataFrame:
    rows = []
    for name, t in _visible_tables(spark):
        cat, sch, tbl = _split_name(name)
        for col, tags in sorted(t.column_tags().items()):
            for k, v in sorted(tags.items()):
                rows.append((cat, sch, tbl, col, k, v, cat, sch))
    return spark.createDataFrame(rows, _COLUMN_TAGS_SCHEMA)


def _layer_df(
    spark: SparkSession, level: str, name_col: str
) -> DataFrame:
    from . import access_control as acl

    enforcing = acl.enabled(spark)
    rows = []
    for name, tags in sorted(layer_tags(spark, level).items()):
        if enforcing and not acl.can_list(spark, name):
            continue
        for k, v in sorted(tags.items()):
            rows.append((name, k, v))
    return spark.createDataFrame(
        rows, f"{name_col} string, tag_name string, tag_value string"
    )


def catalog_tags_df(spark: SparkSession) -> DataFrame:
    return _layer_df(spark, "catalog", "catalog_name")


def schema_tags_df(spark: SparkSession) -> DataFrame:
    """Rows carry the full ``catalog.schema`` name split in two (the
    Databricks view has catalog_name + schema_name columns)."""
    from . import access_control as acl

    enforcing = acl.enabled(spark)
    rows = []
    for name, tags in sorted(layer_tags(spark, "schema").items()):
        if enforcing and not acl.can_list(spark, name):
            continue
        cat, _, sch = name.rpartition(".")
        for k, v in sorted(tags.items()):
            rows.append((cat or "spark_catalog", sch, k, v))
    return spark.createDataFrame(
        rows,
        "catalog_name string, schema_name string, "
        "tag_name string, tag_value string",
    )


# ---------------------------------------------------------------------------
# system.access.audit
# ---------------------------------------------------------------------------

# session -> list of event tuples (see _AUDIT_SCHEMA); capped FIFO
_AUDIT: dict[str, list[tuple]] = {}
_AUDIT_CAP = 50_000

_AUDIT_SCHEMA = (
    "event_time timestamp, timestamp timestamp, "
    "user_identity struct<email:string>, action_name string, "
    "request_params struct<full_name_arg:string>, "
    "response struct<status_code:int>"
)

# privilege checked at the boundary -> the UC audit action name the
# reference's queries filter on (compliance_policies.py:321-334 uses
# getTable/commandSubmit)
_PRIV_ACTION = {
    "SELECT": "getTable",
    "MODIFY": "commandSubmit",
    "CREATE": "createTable",
    "USAGE": "getCatalog",
    "ALL PRIVILEGES": "getTable",
}


def record_access(
    spark: SparkSession,
    privilege: str,
    securable: str,
    status_code: int,
    action: str | None = None,
) -> None:
    """Append one access event (called from ``access_control.enforce``
    and the GRANT/REVOKE SQL surface while enforcement is on)."""
    from . import access_control as acl

    principals = sorted(acl.current_principals(spark))
    email = principals[0] if principals else "anonymous"
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    buf = _AUDIT.setdefault(session_key(spark), [])
    buf.append(
        (
            now,
            now,
            (email,),
            action or _PRIV_ACTION.get(privilege.upper(), "commandSubmit"),
            (securable,),
            (status_code,),
        )
    )
    if len(buf) > _AUDIT_CAP:
        del buf[: len(buf) - _AUDIT_CAP]


def audit_df(spark: SparkSession) -> DataFrame:
    """The session's access events as ``system.access.audit``. Admin-
    gated while enforcement is on (UC system tables are admin-granted);
    wide open otherwise — the buffer is then empty anyway because
    recording only happens under enforcement."""
    from . import access_control as acl

    if acl.enabled(spark) and not acl.can_manage(spark, "system"):
        who = sorted(acl.current_principals(spark)) or ["<anonymous>"]
        raise PermissionError(
            f"principal {who} may not read system.access.audit: requires "
            f"{acl.ADMINS_CONF} membership or ALL PRIVILEGES on 'system'"
        )
    return spark.createDataFrame(
        _AUDIT.get(session_key(spark), []), _AUDIT_SCHEMA
    )


# ---------------------------------------------------------------------------
# SQL re-pointing
# ---------------------------------------------------------------------------

_SYS_TABLES: list[tuple[str, str, Callable[[SparkSession], DataFrame]]] = [
    (
        r"\bsystem\s*\.\s*information_schema\s*\.\s*table_tags\b",
        "engine_sys_table_tags",
        table_tags_df,
    ),
    (
        r"\bsystem\s*\.\s*information_schema\s*\.\s*column_tags\b",
        "engine_sys_column_tags",
        column_tags_df,
    ),
    (
        r"\bsystem\s*\.\s*information_schema\s*\.\s*catalog_tags\b",
        "engine_sys_catalog_tags",
        catalog_tags_df,
    ),
    (
        r"\bsystem\s*\.\s*information_schema\s*\.\s*schema_tags\b",
        "engine_sys_schema_tags",
        schema_tags_df,
    ),
    (
        r"\bsystem\s*\.\s*access\s*\.\s*audit\b",
        "engine_sys_access_audit",
        audit_df,
    ),
]


def repoint(spark: SparkSession, sql: str) -> str:
    """Rewrite ``system.*`` table references to engine temp views,
    refreshing each referenced view from live metadata first. Quote-
    aware: occurrences inside string literals are left alone."""
    from ..tables import sqldml

    out = sql
    for pattern, view, builder in _SYS_TABLES:
        mask = sqldml._mask(out)
        hits = [
            m
            for m in re.finditer(pattern, out, re.IGNORECASE)
            if not mask[m.start()][1]
        ]
        if not hits:
            continue
        builder(spark).createOrReplaceTempView(view)
        pieces, prev = [], 0
        for m in hits:
            pieces.append(out[prev : m.start()])
            pieces.append(view)
            prev = m.end()
        pieces.append(out[prev:])
        out = "".join(pieces)
    return out
