"""Unity-Catalog-style GRANT / REVOKE / SHOW GRANTS (X10 extension;
reference ``governance/access_control.py:30-100`` — catalog/schema/
table privileges granted to team principals, plus the secured-view
RLS/masking patterns already covered by ``functions/masking.py``).

Model (the UC subset the reference exercises):

* Securables form the three-level namespace: ``CATALOG c`` >
  ``SCHEMA c.s`` > ``TABLE/VIEW c.s.t`` (shorter names are allowed —
  a 1-part table simply has no ancestors).
* Privileges: ``USAGE``, ``SELECT``, ``MODIFY``, ``CREATE``,
  ``ALL PRIVILEGES``. A grant on an ancestor INHERITS downward
  (``GRANT SELECT ON SCHEMA g TO x`` covers every table in ``g``),
  and object access additionally requires ``USAGE`` (or ALL) on every
  ancestor — the UC two-key rule the reference's team setup encodes
  (USAGE on catalog + schema, SELECT on schema).
* Principals are opaque strings matched against the session identity:
  ``spark.engine.principal`` plus the group list the masking layer
  already uses (``functions/masking.py`` GROUPS_CONF_KEY).

Enforcement boundary: like the reference (UC enforces in the managed
control plane, not in user code), the engine checks at ITS statement
boundary — ``queries/sqlpack.run_statement`` — and only when the
operator opts in with ``spark.engine.accessControl.enabled=true``:
SELECT statements require SELECT on every referenced registered
table, DML requires MODIFY on its target. API-level DataFrame access
is the storage-credential trust boundary, same as the reference's
workspace.

Scale notes: the registry is O(grants) driver-side metadata; checks
are dict lookups. Nothing here touches data paths.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..functions.masking import GROUPS_CONF_KEY
from ..session import session_key

__all__ = [
    "grant",
    "revoke",
    "show_grants",
    "is_authorized",
    "enforce",
    "current_principals",
    "run_acl",
]

PRIVILEGES = {"USAGE", "SELECT", "MODIFY", "CREATE", "ALL PRIVILEGES"}
SECURABLE_TYPES = {"CATALOG", "SCHEMA", "TABLE", "VIEW"}

# (session_key) -> list of {privilege, securable_type, securable, principal}
_GRANTS: dict[str, list[dict[str, str]]] = {}

ENABLED_CONF = "spark.engine.accessControl.enabled"
PRINCIPAL_CONF = "spark.engine.principal"
# comma-separated principals allowed to GRANT/REVOKE through the SQL
# surface while enforcement is on (UC gates grants on ownership/MANAGE;
# the engine's equivalent is this conf OR ALL PRIVILEGES on the
# securable). The PYTHON grant()/revoke() API is not gated — it is the
# storage-credential trust boundary, same as DataFrame access.
ADMINS_CONF = "spark.engine.accessControl.admins"
# opt-in durable grants: a LakeTable path. When set, grants written in
# one session load in the next (UC grants are durable; the default
# in-memory registry is not) — the table is read once per (session,
# path), and every grant/revoke persists by RE-READING the registry
# and applying this session's mutation journal onto it (never a blind
# overwrite from session memory: a rival session's revoke that landed
# meanwhile must stay revoked, not be resurrected by stale state). A
# fail-closed deployment that relies on enforcement should set this.
PATH_CONF = "spark.engine.accessControl.path"

_GRANT_SCHEMA = (
    "privilege string, securable_type string, "
    "securable string, principal string"
)
_GRANT_COLS = ("privilege", "securable_type", "securable", "principal")

# session -> registry path already loaded into _GRANTS
_LOADED: dict[str, str] = {}

# session -> mutation journal since session start: grants added and
# revoked THROUGH this session. _persist_grants applies the journal
# onto a fresh read of the on-disk registry, so concurrent sessions
# compose: B's revoke of a row A never touched survives A's next
# persist, and rows granted here before PATH_CONF was set still land.
_LOCAL_ADDS: dict[str, list[dict[str, str]]] = {}
_LOCAL_DELS: dict[str, list[dict[str, str]]] = {}


def _registry_path(spark: SparkSession) -> str | None:
    try:
        return spark.conf.get(PATH_CONF) or None
    except Exception:  # noqa: BLE001
        return None


def _session_grants(spark: SparkSession) -> list[dict[str, str]]:
    sid = session_key(spark)
    g = _GRANTS.setdefault(sid, [])
    path = _registry_path(spark)
    if path and _LOADED.get(sid) != path:
        # merge durable rows under in-memory ones (first load only; the
        # registry is then write-through, so memory stays authoritative
        # for this session). A broken registry table must fail loudly —
        # silently dropping grants would lock every principal out (or,
        # worse for audit trust, forget a revoke).
        from ..tables import LakeTable

        if LakeTable.is_table(path):
            rows = LakeTable.for_path(spark, path).to_df().collect()
            for r in rows:
                entry = {c: r[c] for c in _GRANT_COLS}
                if entry not in g:
                    g.append(entry)
        # mark loaded only AFTER the load succeeded: a transient read
        # failure must retry on the next call, not leave a session that
        # thinks it loaded and then OVERWRITES the registry with its
        # partial in-memory state on the next grant/revoke
        _LOADED[sid] = path
    return g


def _disk_grant_rows(
    spark: SparkSession, path: str
) -> tuple[list[dict[str, str]], int | None]:
    """Durable grant rows PLUS the registry version they were read at
    (None when the registry table does not exist yet). The persist
    loop threads the version into ``overwrite(expected_version=)`` so
    a rival commit landing between this read and the write raises
    ``ConcurrentModificationError`` and retries — closing the
    read→pin lost-update window."""
    from ..tables import LakeTable

    if not LakeTable.is_table(path):
        return [], None
    tbl = LakeTable.for_path(spark, path)
    ver = tbl.version()
    return [
        {c: r[c] for c in _GRANT_COLS}
        for r in tbl.to_df(version=ver).collect()
    ], ver


def _persist_grants(spark: SparkSession) -> list[dict[str, str]]:
    """Write-through to the durable registry (no-op without
    PATH_CONF): RE-READ the on-disk rows, drop the ones this session
    revoked, append the ones it granted, write the result back, and
    adopt it as the session's in-memory view. The registry is tiny
    (O(grants) rows) and the commit is atomic, so a rival writer
    conflicts instead of interleaving; re-reading (instead of
    overwriting from session memory) means a rival session's revoke
    that landed since our load stays revoked. An OCC loser (a rival
    session persisting concurrently) retries the whole
    read-merge-write loop a bounded number of times — the journal
    composes with whatever the rival wrote, so a retry is always
    safe. Returns the disk rows this persist DROPPED (the tombstoned
    rows that existed on disk), so ``revoke`` can report a revoke
    that only existed in the durable registry."""
    path = _registry_path(spark)
    if not path:
        return []
    from ..tables.registry import persist_versioned

    sid = session_key(spark)
    adds = _LOCAL_ADDS.get(sid, [])
    dels = _LOCAL_DELS.get(sid, [])
    # the merge runs once per OCC attempt; `state` holds the WINNING
    # attempt's view when persist_versioned returns
    state: dict = {}

    def _merge(disk: list[dict[str, str]]):
        state["dropped"] = [e for e in disk if e in dels]
        merged = [e for e in disk if e not in dels]
        merged += [e for e in adds if e not in merged]
        state["merged"] = merged
        return spark.createDataFrame(
            [tuple(e[c] for c in _GRANT_COLS) for e in merged],
            _GRANT_SCHEMA,
        )

    persist_versioned(
        spark,
        path,
        lambda: _disk_grant_rows(spark, path),
        _merge,
    )
    # memory mirrors the registry it just wrote — rival sessions'
    # grants that landed since our load become visible here too
    g = _GRANTS.setdefault(sid, [])
    g[:] = state["merged"]
    _LOADED[sid] = path
    # the journal is now reflected on disk: clear it, or an old add
    # would re-resurrect a row a rival session revokes LATER (and an
    # old tombstone would keep deleting a row a rival re-grants)
    adds.clear()
    dels.clear()
    return state["dropped"]


def grant(
    spark: SparkSession,
    privilege: str,
    securable_type: str,
    securable: str,
    principal: str,
) -> None:
    privilege = privilege.upper()
    securable_type = securable_type.upper()
    if privilege not in PRIVILEGES:
        raise ValueError(f"unknown privilege {privilege!r}")
    if securable_type not in SECURABLE_TYPES:
        raise ValueError(f"unknown securable type {securable_type!r}")
    sec = securable.strip("`").lower()
    if securable_type in ("TABLE", "VIEW"):
        # grants written against the short name must authorize the
        # registered full name enforcement checks. NOTE: this mirrors
        # DML resolution — a dotted name whose last component uniquely
        # matches a registered table IS that table for every engine
        # statement, so the grant follows the same rule. Ambiguity is
        # an admin error, not a silent arbitrary pick.
        _raise_if_ambiguous(spark, sec)
        sec = canonical_name(spark, sec)
    entry = {
        "privilege": privilege,
        "securable_type": securable_type,
        "securable": sec,
        "principal": principal.strip("`"),
    }
    g = _session_grants(spark)
    sid = session_key(spark)
    dels = _LOCAL_DELS.setdefault(sid, [])
    dels[:] = [e for e in dels if e != entry]  # re-grant clears the tombstone
    adds = _LOCAL_ADDS.setdefault(sid, [])
    if entry not in adds:
        adds.append(entry)
    appended = entry not in g
    if appended:
        g.append(entry)
    # persist whenever a durable registry is configured, even when the
    # entry already sat in session memory: the disk row may have been
    # revoked by a rival session since our load, and a deliberate
    # re-grant must land the journaled add back on disk (mirrors
    # revoke's trigger)
    if appended or _registry_path(spark):
        _persist_grants(spark)


def revoke(
    spark: SparkSession,
    privilege: str,
    securable_type: str,
    securable: str,
    principal: str,
) -> int:
    privilege = privilege.upper()
    securable_type = securable_type.upper()
    sec = securable.strip("`").lower()
    if securable_type in ("TABLE", "VIEW"):
        _raise_if_ambiguous(spark, sec)
        sec = canonical_name(spark, sec)
    pr = principal.strip("`")
    entry = {
        "privilege": privilege,
        "securable_type": securable_type,
        "securable": sec,
        "principal": pr,
    }
    g = _session_grants(spark)
    sid = session_key(spark)
    adds = _LOCAL_ADDS.setdefault(sid, [])
    adds[:] = [e for e in adds if e != entry]
    dels = _LOCAL_DELS.setdefault(sid, [])
    if entry not in dels:
        # tombstoned even when absent from session memory: the row may
        # exist on disk (granted by a rival session) and must not
        # survive the next persist's re-read merge
        dels.append(entry)
    before = len(g)
    g[:] = [e for e in g if e != entry]
    session_removed = before - len(g)
    disk_removed = 0
    if session_removed or _registry_path(spark):
        # the revoked row may exist ONLY on disk (granted by a rival
        # session after this session's load): the tombstone removes it
        # during the persist's re-read merge, and the count must say so
        disk_removed = sum(
            1 for e in _persist_grants(spark) if e == entry
        )
    return 1 if (session_removed or disk_removed) else 0


def show_grants(
    spark: SparkSession,
    on: str | None = None,
    principal: str | None = None,
    on_type: str | None = None,
) -> DataFrame:
    sec = on.strip("`").lower() if on else None
    # the filter accepts the short name too — grants on tables are
    # stored under their canonical registered securable. An explicit
    # SCHEMA/CATALOG keyword suppresses table canonicalization so a
    # schema whose last component matches a table basename lists its
    # OWN grants only.
    if sec is None:
        secs = None
    elif on_type in ("CATALOG", "SCHEMA"):
        secs = {sec}
    else:
        secs = {sec, canonical_name(spark, sec)}
    rows = [
        (e["principal"], e["privilege"], e["securable_type"], e["securable"])
        for e in _session_grants(spark)
        if (secs is None or e["securable"] in secs)
        and (principal is None or e["principal"] == principal.strip("`"))
    ]
    return spark.createDataFrame(
        sorted(rows),
        "principal string, privilege string, "
        "securable_type string, securable string",
    )


def current_principals(spark: SparkSession) -> set[str]:
    """The session identity: the configured principal name plus its
    groups (same conf the masking/RLS layer reads)."""
    out: set[str] = set()
    for key in (PRINCIPAL_CONF, GROUPS_CONF_KEY):
        try:
            raw = spark.conf.get(key)
        except Exception:  # noqa: BLE001
            raw = None
        out.update(p.strip() for p in (raw or "").split(",") if p.strip())
    return out


def _ancestors(securable: str) -> list[str]:
    """Proper ancestors, outermost first: ``c.s.t`` -> [``c``, ``c.s``]."""
    bits = securable.split(".")
    return [".".join(bits[: i + 1]) for i in range(len(bits) - 1)]


def _has(
    grants: list[dict[str, str]],
    principals: set[str],
    privileges: set[str],
    securables: set[str],
) -> bool:
    return any(
        e["principal"] in principals
        and e["privilege"] in privileges
        and e["securable"] in securables
        for e in grants
    )


def is_authorized(
    spark: SparkSession, privilege: str, securable: str
) -> bool:
    """UC-style hierarchical check: ``privilege`` (or ALL) granted on
    the securable OR any ancestor, AND ``USAGE`` (or ALL) on every
    ancestor."""
    privilege = privilege.upper()
    sec = securable.strip("`").lower()
    grants = _session_grants(spark)
    principals = current_principals(spark)
    if not principals:
        return False
    chain = _ancestors(sec)
    if not _has(
        grants, principals, {privilege, "ALL PRIVILEGES"}, {sec, *chain}
    ):
        return False
    for anc in chain:
        # USAGE on an ancestor is satisfied by USAGE/ALL on it or on
        # ITS ancestors (catalog-level USAGE opens every schema)
        if not _has(
            grants,
            principals,
            {"USAGE", "ALL PRIVILEGES"},
            {anc, *_ancestors(anc)},
        ):
            return False
    return True


def enabled(spark: SparkSession) -> bool:
    try:
        return str(spark.conf.get(ENABLED_CONF)).lower() in ("true", "1")
    except Exception:  # noqa: BLE001
        return False


def _is_admin(spark: SparkSession) -> bool:
    try:
        raw = spark.conf.get(ADMINS_CONF)
    except Exception:  # noqa: BLE001
        raw = None
    admins = {a.strip() for a in (raw or "").split(",") if a.strip()}
    return bool(admins & current_principals(spark))


def can_manage(spark: SparkSession, securable: str) -> bool:
    """May the session principal administer grants on ``securable``?
    True when any session principal is listed in the admins conf, or
    holds ALL PRIVILEGES on the securable / an ancestor (with the usual
    USAGE chain)."""
    if _is_admin(spark):
        return True
    return is_authorized(spark, "ALL PRIVILEGES", securable)


def can_list(spark: SparkSession, securable: str) -> bool:
    """Should a listing verb (SHOW TABLES/SCHEMAS/CATALOGS) reveal this
    securable? UC lists an object when the principal holds ANY
    privilege on it, an ancestor, or anything inside it — so a USAGE
    grant on a catalog reveals the catalog, and a table grant reveals
    the table's schema and catalog."""
    if _is_admin(spark):
        # metastore-admin equivalent: sees every listing (UC admins do)
        return True
    sec = securable.strip("`").lower()
    principals = current_principals(spark)
    scope = {sec, *_ancestors(sec)}
    prefix = sec + "."
    return any(
        e["principal"] in principals
        and (e["securable"] in scope or e["securable"].startswith(prefix))
        for e in _session_grants(spark)
    )


def enforce(spark: SparkSession, privilege: str, securable: str) -> None:
    """Raise PermissionError when access control is enabled and the
    session principal lacks ``privilege`` on ``securable``. Every
    enforced check (allowed or denied) is recorded as a
    ``system.access.audit`` event — the enforcement boundary IS the
    audit boundary, like UC's control plane."""
    if not enabled(spark):
        return
    from . import systables

    ok = is_authorized(spark, privilege, securable)
    systables.record_access(
        spark, privilege, securable.strip("`").lower(), 200 if ok else 403
    )
    if not ok:
        who = sorted(current_principals(spark)) or ["<anonymous>"]
        raise PermissionError(
            f"principal {who} lacks {privilege.upper()} on "
            f"{securable.strip('`').lower()!r}"
        )


# ---------------------------------------------------------------------------
# SQL surface
# ---------------------------------------------------------------------------

_GRANT_RE = re.compile(
    r"^\s*GRANT\s+(?P<priv>ALL\s+PRIVILEGES|USAGE|SELECT|MODIFY|CREATE)\s+"
    r"ON\s+(?P<stype>CATALOG|SCHEMA|TABLE|VIEW)\s+"
    r"(?P<sec>`[^`]+`|[\w.]+)\s+TO\s+(?P<who>`[^`]+`|[\w.@-]+)\s*;?\s*$",
    re.IGNORECASE,
)
_REVOKE_RE = re.compile(
    r"^\s*REVOKE\s+(?P<priv>ALL\s+PRIVILEGES|USAGE|SELECT|MODIFY|CREATE)\s+"
    r"ON\s+(?P<stype>CATALOG|SCHEMA|TABLE|VIEW)\s+"
    r"(?P<sec>`[^`]+`|[\w.]+)\s+FROM\s+(?P<who>`[^`]+`|[\w.@-]+)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_RE = re.compile(
    r"^\s*SHOW\s+GRANTS?(?:\s+(?P<who>`[^`]+`|[\w.@-]+))?"
    r"(?:\s+ON\s+(?:(?P<stype>CATALOG|SCHEMA|TABLE|VIEW)\s+)?"
    r"(?P<sec>`[^`]+`|[\w.]+))?\s*;?\s*$",
    re.IGNORECASE,
)


def run_acl(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute one GRANT / REVOKE / SHOW GRANTS statement (reference
    ``governance/access_control.py:39-63,97``); None when ``sql`` is
    not an ACL statement."""
    m = _GRANT_RE.match(sql)
    if m:
        _require_manage(spark, m.group("sec"), m.group("stype"))
        grant(
            spark,
            re.sub(r"\s+", " ", m.group("priv")),
            m.group("stype"),
            m.group("sec"),
            m.group("who"),
        )
        _audit_acl(spark, "grantPermission", m.group("sec"))
        return show_grants(
            spark, on=m.group("sec"), on_type=m.group("stype").upper()
        )
    m = _REVOKE_RE.match(sql)
    if m:
        _require_manage(
            spark, m.group("sec"), m.group("stype"), action="revokePermission"
        )
        n = revoke(
            spark,
            re.sub(r"\s+", " ", m.group("priv")),
            m.group("stype"),
            m.group("sec"),
            m.group("who"),
        )
        # recorded AFTER the revoke (and its persist) succeeded — a
        # success event for a revoke that didn't happen would be an
        # audit-trail lie
        _audit_acl(spark, "revokePermission", m.group("sec"))
        return spark.createDataFrame([(n,)], "revoked long")
    m = _SHOW_RE.match(sql)
    if m:
        stype = (m.group("stype") or "").upper() or None
        return show_grants(
            spark, on=m.group("sec"), principal=m.group("who"), on_type=stype
        )
    return None


def _audit_acl(spark: SparkSession, action: str, securable: str) -> None:
    """Record a grant-administration event (enforcement on only)."""
    if not enabled(spark):
        return
    from . import systables

    systables.record_access(
        spark,
        "ALL PRIVILEGES",
        securable.strip("`").lower(),
        200,
        action=action,
    )


def _require_manage(
    spark: SparkSession,
    securable: str,
    securable_type: str,
    action: str = "grantPermission",
    verb: str = "GRANT/REVOKE on",
) -> None:
    """SQL-surface manage gate (GRANT/REVOKE, and — via ``verb`` —
    every DROP): with enforcement ON, the issuing principal must be an
    admin (ADMINS_CONF) or hold ALL PRIVILEGES on the securable —
    otherwise any session could escalate itself with
    ``GRANT ALL PRIVILEGES ... TO <self>`` through the very boundary
    the ACL guards. No-op when enforcement is off (the registry is
    then advisory metadata, like the reference's notebook setup)."""
    if not enabled(spark):
        return
    if securable_type.upper() in ("TABLE", "VIEW"):
        # the ALL-PRIVILEGES check must see the securable grants are
        # written against (SCHEMA/CATALOG names stay as-is)
        securable = canonical_name(spark, securable)
    if not can_manage(spark, securable):
        from . import systables

        systables.record_access(
            spark,
            "ALL PRIVILEGES",
            securable.strip("`").lower(),
            403,
            action=action,
        )
        who = sorted(current_principals(spark)) or ["<anonymous>"]
        raise PermissionError(
            f"principal {who} may not {verb} "
            f"{securable.strip('`').lower()!r}: requires membership in "
            f"{ADMINS_CONF} or ALL PRIVILEGES on the securable"
        )


def purge_grants(
    spark: SparkSession, securable: str, *, prefix: bool = False
) -> int:
    """DROP-securable grant cleanup: remove every grant ON the dropped
    securable (and, with ``prefix=True``, on securables under
    ``<securable>.`` — the namespace-CASCADE shape) from session
    memory AND, via journal tombstones, the durable registry. Without
    this, re-creating the same name would resurrect old privileges —
    UC deletes grants with the securable, and the share registry's
    ``delete_share``/``delete_recipient`` purge theirs the same way.
    Returns the number of grant rows removed."""
    sec = securable.strip("`").lower()

    def doomed(name: str) -> bool:
        return name == sec or (prefix and name.startswith(sec + "."))

    g = _session_grants(spark)
    sid = session_key(spark)
    victims = [e for e in g if doomed(e["securable"])]
    path = _registry_path(spark)
    if path:
        # tombstone disk rows too: a rival session may hold grants on
        # the dropped name that this session's memory never loaded
        from ..tables import LakeTable

        if LakeTable.is_table(path):
            for r in LakeTable.for_path(spark, path).to_df().collect():
                entry = {c: r[c] for c in _GRANT_COLS}
                if doomed(entry["securable"]) and entry not in victims:
                    victims.append(entry)
    if not victims:
        return 0
    adds = _LOCAL_ADDS.setdefault(sid, [])
    adds[:] = [e for e in adds if not doomed(e["securable"])]
    dels = _LOCAL_DELS.setdefault(sid, [])
    for e in victims:
        if e not in dels:
            dels.append(e)
    g[:] = [e for e in g if not doomed(e["securable"])]
    if path:
        _persist_grants(spark)
    return len(victims)


def _raise_if_ambiguous(spark: SparkSession, name: str) -> None:
    from ..tables import sqldml

    sid = session_key(spark)
    clean = name.strip("`").lower()
    names = [n for (s, n) in sqldml._REGISTRY if s == sid]
    if clean in names:
        return
    hits = [n for n in names if n.split(".")[-1] == clean.split(".")[-1]]
    if len(hits) > 1:
        raise ValueError(
            f"ambiguous securable {name!r}: matches {sorted(hits)}"
        )


def canonical_name(spark: SparkSession, name: str) -> str:
    """Resolve a statement's table reference to its REGISTERED full
    name (the securable grants are written against) using the same
    suffix rule sqldml resolution applies; unknown names pass
    through unchanged."""
    from ..tables import sqldml

    sid = session_key(spark)
    clean = name.strip("`").lower()
    names = [n for (s, n) in sqldml._REGISTRY if s == sid] + [
        n for (s, n) in sqldml._VIEW_DEFS if s == sid
    ]
    if clean in names:
        return clean
    hits = [n for n in names if n.split(".")[-1] == clean.split(".")[-1]]
    return hits[0] if len(hits) == 1 else clean


_DYNAMIC_SQL_RE = re.compile(
    r"\b(?:(IDENTIFIER)\s*\(|EXECUTE\s+IMMEDIATE\b)", re.IGNORECASE
)


def refuse_dynamic_sql(spark: SparkSession, sql: str) -> None:
    """Fail closed on constructs that build names at RUNTIME —
    ``IDENTIFIER(expr)`` and ``EXECUTE IMMEDIATE`` — while enforcement
    is on. The token scans enforcement relies on
    (``referenced_tables``, ``federation.enforce_internal_view_refs``)
    can only check names that appear in the statement text; a name
    assembled at evaluation time (``IDENTIFIER('fed' ||
    '__crm__public__t')``) would read a gated table with no SELECT
    check and no audit row. Refusing the construct outright is
    over-enforcement by design — the same contract as
    ``referenced_tables`` — and leaves the same 403 audit row a denied
    table read would. Occurrences inside string literals are data, not
    constructs, and pass."""
    from ..tables import sqldml
    from . import systables

    mask = sqldml._mask(sql)
    for m in _DYNAMIC_SQL_RE.finditer(sql):
        if mask[m.start()][1]:
            continue
        construct = (
            "IDENTIFIER()" if m.group(1) else "EXECUTE IMMEDIATE"
        )
        systables.record_access(spark, "SELECT", construct, 403)
        raise PermissionError(
            f"{construct} is refused while access-control enforcement "
            f"is on: it resolves names at runtime, which the "
            f"fail-closed identifier scan cannot check or audit — "
            f"write the table name literally instead"
        )


def referenced_tables(spark: SparkSession, sql: str) -> set[str]:
    """Registered table names the statement COULD read: every
    identifier token outside string literals (plus backtick-quoted
    identifiers) matched against the registry. Deliberately
    FAIL-CLOSED for a security check: comma joins, subqueries and
    per-part-quoted refs are all caught; the cost is that a column or
    alias that shares a registered table's name also requires the
    SELECT grant (over-enforcement, never under). String literals are
    excluded via the quote mask, so data values cannot trigger
    checks."""
    from ..tables import sqldml

    sid = session_key(spark)
    refs = sqldml.identifier_tokens(sql)
    lasts = {r.split(".")[-1] for r in refs}
    out: set[str] = set()
    for (s, n) in sqldml._REGISTRY:
        if s != sid:
            continue
        if n in refs or n.split(".")[-1] in lasts:
            out.add(n)
    # persistent VIEWS are securables in their own right (UC's
    # owner's-rights model: querying a view needs SELECT on the VIEW;
    # the body's tables were checked against the CREATOR at
    # definition). Their names never appear in _REGISTRY, so they need
    # their own pass.
    for (s, n) in sqldml._VIEW_DEFS:
        if s != sid:
            continue
        if n in refs or n.split(".")[-1] in lasts:
            out.add(n)
    return out
