"""Durable governance registries (opt-in, one conf).

UC's metastore is durable: catalogs, schemas, volumes, tags and SQL
functions declared once resolve in every later session. The engine's
equivalents (`metasql._NAMESPACES`, `systables._LAYER_TAGS`,
`sqlpack._FUNCS`) are session-scoped dicts — good defaults for tests,
wrong for a deployment that declares its catalog tree in a setup
notebook (reference `unity_catalog_setup.py` runs CREATE CATALOG /
SCHEMA / VOLUME once and every later job assumes them).

Setting ``spark.engine.catalogRegistry.path`` to a LakeTable path
makes the declared tree write-through durable using the SAME
journal-merge discipline as the durable grants registry
(`access_control.PATH_CONF`): mutations journal unconditionally (so
objects declared BEFORE the conf was set still land on the first
persist after it is set), every persist RE-READS the on-disk rows and
applies this session's add/tombstone journal onto them (never a blind
overwrite from session memory — a rival session's DROP that landed
meanwhile must stay dropped), with a bounded retry on
optimistic-concurrency losses.

Rows are ``(kind, name, payload)`` with a JSON payload:

- ``catalog`` / ``schema`` / ``volume`` — the `_NAMESPACES` meta dict
  (comment/location).
- ``layer_tag`` — ONE ROW PER TAG, name ``<level>|<name>|<tag>`` and
  payload ``{"value": ...}``: rival sessions tagging the same catalog
  compose instead of clobbering each other's keys (the same
  row-per-grant granularity the grants registry uses).
- ``function`` — name is the lowered 3-part function name, payload
  ``{"base": ..., "sql": <original CREATE FUNCTION statement>}``. The
  ORIGINAL statement is stored (not any session-rewritten form, which
  can embed per-statement temp-view names) and replayed through the
  function-rewrite path on load. A row whose replay fails (basename
  collision from a two-session race, a body reading session state) is
  SKIPPED with a loud warning instead of failing the load: one broken
  function must not brick every statement of every later session.

- ``connection`` / ``foreign_catalog`` — the federation registries
  (UC connections are durable metastore objects). Secret references
  (``secret('scope','key')``) are stored UNRESOLVED and resolved at
  use, like the session registry; plaintext option values land
  verbatim — the registry table is the same credential trust
  boundary as the spark-defaults file that would otherwise carry
  them, and SHOW CONNECTIONS redacts either way.

Share MOUNTS and table registrations are deliberately NOT persisted:
a mount binds a recipient credential profile and session temp views,
and a table registration wraps a live LakeTable handle — both are
session constructions over durable storage that already exists
(the share registry file, the table's Delta log).
"""

from __future__ import annotations

import json
import threading
import warnings

from pyspark.sql import SparkSession

from ..session import session_key

PATH_CONF = "spark.engine.catalogRegistry.path"

_SCHEMA = "kind string, name string, payload string"
_COLS = ("kind", "name", "payload")

# session -> registry path already loaded
_LOADED: dict[str, str] = {}
# mutation journal since session start (mirrors access_control's
# _LOCAL_ADDS/_LOCAL_DELS): adds keep the latest payload per key,
# dels are exact-key tombstones, pdels are PREFIX tombstones (a
# namespace-CASCADE drop covers rows that exist only on disk without
# having to read the table to enumerate them)
_ADDS: dict[str, dict[tuple[str, str], str]] = {}
_DELS: dict[str, set[tuple[str, str]]] = {}
_PDELS: dict[str, set[str]] = {}
# sessions whose load is in flight (same-thread re-entry guard: row
# replay runs engine code that may call ensure_loaded again), plus a
# PER-SESSION lock so a second thread of the same session blocks
# until the load completes instead of proceeding against a
# half-populated registry — unrelated sessions load in parallel
_LOADING: set[str] = set()
_LOCKS: dict[str, threading.RLock] = {}
_LOCKS_GUARD = threading.Lock()


def _lock_for(sid: str) -> threading.RLock:
    with _LOCKS_GUARD:
        if sid not in _LOCKS:
            _LOCKS[sid] = threading.RLock()
        return _LOCKS[sid]

# replay order: rows apply dependency-first regardless of the table's
# physical row order (a function body may reference a foreign catalog;
# a foreign catalog references its connection; a drop+recreate cycle
# re-appends rows at the END of the table, so scan order proves
# nothing about creation order)
_KIND_ORDER = {
    "connection": 0,
    "foreign_catalog": 1,
    "catalog": 2,
    "schema": 3,
    "volume": 4,
    "layer_tag": 5,
    "function": 9,
    # views may read tables through foreign catalogs and call SQL
    # functions: replay them last
    "view": 10,
}


def _path(spark: SparkSession) -> str | None:
    try:
        return spark.conf.get(PATH_CONF) or None
    except Exception:  # noqa: BLE001
        return None


def _disk_rows(spark: SparkSession, path: str) -> list[dict[str, str]]:
    return _disk_rows_versioned(spark, path)[0]


def _disk_rows_versioned(
    spark: SparkSession, path: str
) -> tuple[list[dict[str, str]], int | None]:
    """Registry rows PLUS the table version they were read at. The
    persist loop threads that version into ``overwrite(expected_version=)``
    so a rival commit landing anywhere after this read — including the
    window between the read and the overwrite's own snapshot capture —
    raises ``ConcurrentModificationError`` and retries instead of being
    silently overwritten."""
    from ..tables import LakeTable

    if not LakeTable.is_table(path):
        return [], None
    tbl = LakeTable.for_path(spark, path)
    ver = tbl.version()
    return [
        {c: r[c] for c in _COLS}
        for r in tbl.to_df(version=ver).collect()
    ], ver


# kinds that live in the dotted catalog TREE — the only ones a
# namespace-CASCADE prefix tombstone may reach. Connections are a
# separate UC namespace: DROP CATALOG analytics CASCADE must never
# delete an unrelated connection that happens to share the name
_TREE_KINDS = frozenset(
    {"catalog", "schema", "volume", "layer_tag", "function", "view"}
)


def _plain_name(kind: str, name: str) -> str:
    """The namespace-tree name a row hangs under (layer-tag rows key
    by ``<level>|<name>|<tag>``)."""
    return name.split("|")[1] if kind == "layer_tag" else name


def _tombstoned(sid: str, kind: str, name: str) -> bool:
    if (kind, name) in _DELS.get(sid, set()):
        return True
    if kind not in _TREE_KINDS:
        return False
    plain = _plain_name(kind, name)
    return any(
        plain == p or plain.startswith(p + ".")
        for p in _PDELS.get(sid, set())
    )


def _apply_row(
    spark: SparkSession, kind: str, name: str, payload: dict
) -> None:
    """Materialize one durable row into the session registries.
    ``setdefault`` everywhere: rows declared IN this session are
    authoritative over the disk snapshot (write-through keeps them in
    sync anyway)."""
    sid = session_key(spark)
    if kind in ("catalog", "schema", "volume"):
        from ..tables import metasql

        metasql._NAMESPACES.setdefault(sid, {}).setdefault(
            (kind, name), payload
        )
    elif kind == "layer_tag":
        from . import systables

        level, tagged, tag = name.split("|", 2)
        systables._LAYER_TAGS.setdefault(sid, {}).setdefault(
            (level, tagged), {}
        ).setdefault(tag, str(payload["value"]))
    elif kind == "function":
        from ..queries import sqlpack

        fmap = sqlpack._FUNCS.setdefault(sid, {})
        if name in fmap:
            return
        # the body may call engine_is_group_member (the
        # IS_ACCOUNT_GROUP_MEMBER rewrite) — register it first, then
        # replay the ORIGINAL statement through the same rewrite path
        # CREATE FUNCTION took (binds the temp function + fmap entry)
        sqlpack._ensure_group_udf(spark)
        stmt = sqlpack._rewrite_functions(spark, payload["sql"])
        # NO mount/federation rewriting here: that would run ACL
        # enforcement and eager remote JDBC round-trips inside a
        # registry load (phantom audit rows, a down remote silently
        # dropping the function). A body whose references resolve
        # only through those rewrites warn-skips instead
        try:
            spark.sql(sqlpack.normalize_sql(stmt))
        except Exception:
            # _rewrite_functions registered the fmap binding before
            # the body ran: roll it back, or the phantom entry turns
            # CREATE FUNCTION IF NOT EXISTS into a silent no-op and
            # every call resolves to a temp function that was never
            # created
            fmap.pop(name, None)
            raise
    elif kind == "view":
        from ..tables import sqldml

        # definition only — the temp view materializes on the next
        # sync_views pass (no spark.sql during a registry load: a
        # body whose tables resolve later must not fail the load)
        sqldml._VIEW_DEFS.setdefault((sid, name), dict(payload))
        if "engine_is_group_member" in str(payload.get("sql", "")).lower():
            # a replayed group-membership view needs the engine UDF
            # registered before its first sync analysis — flag the
            # session exactly like CREATE VIEW does
            sqldml._MASKED_SESSIONS.add(sid)
    elif kind == "connection":
        from . import federation

        opts = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in payload["options"].items()
        }
        federation._CONNECTIONS.setdefault(sid, {}).setdefault(
            name, {"type": payload["type"], "options": opts}
        )
    elif kind == "foreign_catalog":
        from ..tables import metasql
        from . import federation

        federation._FOREIGN_CATALOGS.setdefault(sid, {}).setdefault(
            name, dict(payload)
        )
        # the mounted catalog is part of the namespace surface (SHOW
        # CATALOGS), mirroring the CREATE FOREIGN CATALOG path —
        # setdefault on the comment too: a session-declared catalog's
        # metadata must never be clobbered by the disk snapshot
        metasql._NAMESPACES.setdefault(sid, {}).setdefault(
            ("catalog", name), {}
        ).setdefault(
            "comment",
            f"foreign catalog using connection {payload['connection']}",
        )
    # unknown kinds from a NEWER engine version: ignored, preserved
    # on persist (the journal never tombstones keys it didn't touch)


def ensure_loaded(spark: SparkSession) -> None:
    """First-touch load of the durable registry into the session
    registries (no-op without the conf; once per (session, path)). An
    unreadable registry TABLE fails loudly — silently dropping the
    declared tree would break every later resolution — but a single
    function row whose replay fails is skipped with a warning (see
    module docstring)."""
    path = _path(spark)
    if not path:
        return
    sid = session_key(spark)
    if _LOADED.get(sid) == path:
        return
    with _lock_for(sid):
        if _LOADED.get(sid) == path or sid in _LOADING:
            # loaded by the thread we just waited on, or a same-thread
            # re-entry from inside row replay
            return
        _LOADING.add(sid)
        try:
            rows = sorted(
                _disk_rows(spark, path),
                key=lambda r: _KIND_ORDER.get(r["kind"], 6),
            )
            for row in rows:
                payload = json.loads(row["payload"])
                try:
                    _apply_row(spark, row["kind"], row["name"], payload)
                except Exception as e:  # noqa: BLE001
                    warnings.warn(
                        f"catalog registry: skipped {row['kind']} "
                        f"{row['name']!r} (replay failed: {e})",
                        stacklevel=2,
                    )
        finally:
            _LOADING.discard(sid)
        # mark loaded only AFTER the load succeeded (a transient read
        # failure must retry, not let a later persist clobber the
        # registry with partial state)
        _LOADED[sid] = path


def _persist(spark: SparkSession) -> None:
    """Journal-merge write-through with bounded OCC retry (same shape
    as access_control._persist_grants)."""
    path = _path(spark)
    if not path:
        return
    from ..tables.registry import persist_versioned

    sid = session_key(spark)
    adds = _ADDS.get(sid, {})

    def _merge(disk: list[dict[str, str]]):
        merged = [
            r
            for r in disk
            if not _tombstoned(sid, r["kind"], r["name"])
            and (r["kind"], r["name"]) not in adds
        ]
        merged += [
            {"kind": k, "name": n, "payload": p}
            for (k, n), p in adds.items()
        ]
        return spark.createDataFrame(
            [tuple(r[c] for c in _COLS) for r in merged], _SCHEMA
        )

    persist_versioned(
        spark,
        path,
        lambda: _disk_rows_versioned(spark, path),
        _merge,
    )
    adds.clear()
    _DELS.get(sid, set()).clear()
    _PDELS.get(sid, set()).clear()


def flush(spark: SparkSession) -> None:
    """Write the journal through when the registry conf is set (one
    table read+commit — callers batching several record/erase calls
    pass ``flush=False`` there and call this once)."""
    if _path(spark):
        ensure_loaded(spark)
        _persist(spark)


def record(
    spark: SparkSession,
    kind: str,
    name: str,
    payload: dict,
    *,
    flush_now: bool = True,
) -> None:
    """Journal one declared object; write through when the registry
    conf is set. Journaling is UNCONDITIONAL (like grants): objects
    declared before the conf was set land on the first persist after
    it is."""
    sid = session_key(spark)
    key = (kind, name)
    _DELS.setdefault(sid, set()).discard(key)
    _ADDS.setdefault(sid, {})[key] = json.dumps(payload, sort_keys=True)
    if flush_now:
        flush(spark)


def erase(
    spark: SparkSession,
    kind: str | None,
    name: str,
    *,
    prefix: bool = False,
    flush_now: bool = True,
) -> None:
    """Tombstone one dropped object — or, with ``prefix=True``, every
    row (any kind) under ``<name>.`` plus the exact row, the
    namespace-CASCADE shape. Prefix tombstones cover rows that exist
    ONLY on disk (declared by a rival session) without reading the
    table here — the persist's re-read applies them."""
    sid = session_key(spark)
    adds = _ADDS.setdefault(sid, {})
    if prefix:
        for key in [
            k
            for k in adds
            if k[0] in _TREE_KINDS
            and (
                _plain_name(*k) == name
                or _plain_name(*k).startswith(name + ".")
            )
        ]:
            adds.pop(key)
        _PDELS.setdefault(sid, set()).add(name)
    else:
        exact = [
            k
            for k in adds
            if k[1] == name and (kind is None or k[0] == kind)
        ] or ([(kind, name)] if kind is not None else [])
        dels = _DELS.setdefault(sid, set())
        for key in exact:
            adds.pop(key, None)
            dels.add(key)
    if flush_now:
        flush(spark)
