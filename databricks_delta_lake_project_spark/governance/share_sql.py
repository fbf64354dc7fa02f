"""Delta-Sharing DDL as SQL (S9/X10 SQL tail): routes the provider
notebook's statement sequence (reference
``src/delta_sharing/delta_sharing_provider.py:41-106``) —

* ``CREATE SHARE [IF NOT EXISTS] name [COMMENT '...']``
* ``ALTER SHARE s ADD TABLE t [PARTITION (col = 'v', ...)]
  [AS schema.table] [COMMENT '...']``
* ``ALTER SHARE s REMOVE TABLE alias``
* ``CREATE RECIPIENT [IF NOT EXISTS] name [USING ID '...']
  [COMMENT '...']``
* ``GRANT SELECT ON SHARE s TO RECIPIENT r`` / ``REVOKE ... FROM``
* ``SHOW SHARES`` / ``SHOW RECIPIENTS`` / ``SHOW ALL IN SHARE s``

— onto :class:`..governance.sharing.ShareProvider`. The provider root
comes from ``spark.engine.sharing.root`` (a directory; the share
registry and recipient profile files live under it). Recipient
profiles are written to ``<root>/recipients/<name>.share`` — the
activation-link artifact a recipient's :class:`SharingClient` loads.

Dispatch contract mirrors ``acl.run_acl``: :func:`run_share_sql`
returns a DataFrame for statements it owns, None otherwise.

Governance: with ACL enforcement on, share administration requires
admin rights (``access_control.ADMINS_CONF`` membership or ALL
PRIVILEGES on the share-name securable — UC gates CREATE SHARE on the
metastore), and ``ADD TABLE`` additionally requires SELECT on the
table being shared (you cannot share what you cannot read).

Scale notes: all verbs are O(registry) driver-side JSON writes; no
data is read. Reads by recipients go through ``SharingClient`` (token
check + partition filter pushed into the scan).
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from .sharing import ShareProvider, _load_registry

__all__ = ["run_share_sql", "rewrite_mounts", "ROOT_CONF", "PROFILE_CONF"]

ROOT_CONF = "spark.engine.sharing.root"
# recipient-side: path to the provider-issued profile file, used by
# CREATE CATALOG ... USING SHARE (the D2D mount,
# delta_sharing_recipient.py:35-39)
PROFILE_CONF = "spark.engine.sharing.profile"

# session -> {mounted_full_name_lower: temp_view_name}: SELECTs over
# `partner_data.schema.table` re-point to the mounted view
# (sqlpack rewrites via rewrite_mounts)
_MOUNTS: dict[str, dict[str, str]] = {}

_NAME = r"(`[^`]+`|[\w.]+)"
_COMMENT = r"(?:\s+COMMENT\s+'(?P<comment>(?:[^']|'')*)')?"

_CREATE_SHARE_RE = re.compile(
    rf"^\s*CREATE\s+SHARE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>{_NAME})"
    rf"{_COMMENT}\s*;?\s*$",
    re.IGNORECASE,
)
_ADD_TABLE_RE = re.compile(
    rf"^\s*ALTER\s+SHARE\s+(?P<share>{_NAME})\s+ADD\s+TABLE\s+"
    rf"(?P<table>{_NAME})"
    r"(?:\s+PARTITION\s*\((?P<part>[^)]*)\))?"
    rf"(?:\s+AS\s+(?P<alias>{_NAME}))?"
    rf"{_COMMENT}\s*;?\s*$",
    re.IGNORECASE,
)
_REMOVE_TABLE_RE = re.compile(
    rf"^\s*ALTER\s+SHARE\s+(?P<share>{_NAME})\s+REMOVE\s+TABLE\s+"
    rf"(?P<alias>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)
_CREATE_RECIPIENT_RE = re.compile(
    rf"^\s*CREATE\s+RECIPIENT\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<name>{_NAME})"
    r"(?:\s+USING\s+ID\s+'(?P<id>[^']*)')?"
    rf"{_COMMENT}\s*;?\s*$",
    re.IGNORECASE,
)
_GRANT_SHARE_RE = re.compile(
    rf"^\s*GRANT\s+SELECT\s+ON\s+SHARE\s+(?P<share>{_NAME})\s+TO\s+"
    rf"RECIPIENT\s+(?P<who>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)
_REVOKE_SHARE_RE = re.compile(
    rf"^\s*REVOKE\s+SELECT\s+ON\s+SHARE\s+(?P<share>{_NAME})\s+FROM\s+"
    rf"RECIPIENT\s+(?P<who>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_SHARE_RE = re.compile(
    rf"^\s*DROP\s+SHARE\s+(?P<ie>IF\s+EXISTS\s+)?(?P<name>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_RECIPIENT_RE = re.compile(
    rf"^\s*DROP\s+RECIPIENT\s+(?P<ie>IF\s+EXISTS\s+)?"
    rf"(?P<name>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_SHARES_RE = re.compile(r"^\s*SHOW\s+SHARES\s*;?\s*$", re.IGNORECASE)
_SHOW_RECIPIENTS_RE = re.compile(
    r"^\s*SHOW\s+RECIPIENTS\s*;?\s*$", re.IGNORECASE
)
_SHOW_IN_SHARE_RE = re.compile(
    rf"^\s*SHOW\s+ALL\s+IN\s+SHARE\s+(?P<share>{_NAME})\s*;?\s*$",
    re.IGNORECASE,
)

_SHARE_VERB_RE = re.compile(
    r"^\s*(?:CREATE\s+SHARE|ALTER\s+SHARE|CREATE\s+RECIPIENT"
    r"|DROP\s+SHARE|DROP\s+RECIPIENT"
    r"|GRANT\s+SELECT\s+ON\s+SHARE|REVOKE\s+SELECT\s+ON\s+SHARE"
    r"|SHOW\s+SHARES|SHOW\s+RECIPIENTS|SHOW\s+ALL\s+IN\s+SHARE"
    r"|CREATE\s+CATALOG\b)\b",
    re.IGNORECASE,
)

_MOUNT_RE = re.compile(
    rf"^\s*CREATE\s+CATALOG\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<cat>{_NAME})\s+USING\s+SHARE\s+"
    r"(?P<ref>(?:`[^`]+`|\w+)(?:\s*\.\s*(?:`[^`]+`|\w+))*)"
    rf"{_COMMENT}\s*;?\s*$",
    re.IGNORECASE,
)


def _clean(s: str | None) -> str:
    return (s or "").strip("`")


def _comment(m: re.Match) -> str:
    return (m.group("comment") or "").replace("''", "'")


def _provider(spark: SparkSession) -> ShareProvider:
    try:
        root = spark.conf.get(ROOT_CONF)
    except Exception:  # noqa: BLE001
        root = None
    if not root:
        raise ValueError(
            f"share DDL needs a provider root: set {ROOT_CONF} to a "
            "directory (the share registry and recipient profiles live "
            "under it)"
        )
    return ShareProvider(root)


def _require_share_admin(spark: SparkSession, share: str) -> None:
    from . import access_control as acl

    if not acl.enabled(spark):
        return
    if not acl.can_manage(spark, share.lower()):
        who = sorted(acl.current_principals(spark)) or ["<anonymous>"]
        raise PermissionError(
            f"principal {who} may not administer share {share!r}: "
            f"requires {acl.ADMINS_CONF} membership or ALL PRIVILEGES"
        )


def _partition_filter(part: str | None) -> str | None:
    """``PARTITION (region = 'US', year = 2024)`` -> a conjunctive SQL
    predicate the provider applies on every recipient read."""
    if not part or not part.strip():
        return None
    clauses = []
    for item in part.split(","):
        m = re.match(
            r"\s*(`?)(\w+)\1\s*=\s*('(?:[^']|'')*'|[\w.+-]+)\s*$", item
        )
        if not m:
            raise ValueError(f"cannot parse PARTITION clause item {item!r}")
        clauses.append(f"{m.group(2)} = {m.group(3)}")
    return " AND ".join(clauses)


def _mount_share_catalog(spark: SparkSession, m: re.Match) -> DataFrame:
    """``CREATE CATALOG <cat> USING SHARE <provider>.<share>`` — the
    Databricks-to-Databricks consumption form
    (``delta_sharing_recipient.py:35-39``): every table the share
    exposes becomes queryable as ``<cat>.<schema>.<table>``. The
    engine's transport is the provider-issued profile file
    (``spark.engine.sharing.profile``); each shared table mounts as a
    temp view (token auth + partition filter applied by the client)
    and later SELECTs over the 3-part names re-point via
    :func:`rewrite_mounts`. Views snapshot the share at mount time —
    re-issue the statement to refresh."""
    from ..session import session_key
    from .sharing import SharingClient

    cat = _clean(m.group("cat")).lower()
    if not re.fullmatch(r"\w+", cat):
        raise ValueError(f"CREATE CATALOG: invalid catalog name {cat!r}")
    _require_share_admin(spark, cat)
    # the provider-account prefix is transport routing metadata; the
    # profile already pins the provider, so the share name is the last
    # component
    share = re.split(r"\s*\.\s*", m.group("ref"))[-1].strip("`")
    try:
        profile = spark.conf.get(PROFILE_CONF)
    except Exception:  # noqa: BLE001
        profile = None
    if not profile:
        raise ValueError(
            f"CREATE CATALOG ... USING SHARE needs {PROFILE_CONF} set to "
            "the provider-issued profile file"
        )
    client = SharingClient(profile)
    if share not in client.list_shares():
        raise PermissionError(
            f"share {share!r} is not granted to this recipient"
        )
    mounts = _MOUNTS.setdefault(session_key(spark), {})
    # re-issuing the statement is the refresh path: drop entries (and
    # views) for tables the share no longer exposes, or stale data
    # would keep serving under the mounted name
    for full in [f for f in mounts if f.startswith(cat + ".")]:
        try:
            spark.catalog.dropTempView(mounts.pop(full))
        except Exception:  # noqa: BLE001
            pass
    rows = []
    schemas = set()
    for tbl in client.list_tables(share):
        view = f"{cat}__{tbl.replace('.', '__')}"
        client.load_table(spark, f"{share}.{tbl}").createOrReplaceTempView(
            view
        )
        mounts[f"{cat}.{tbl}".lower()] = view
        schemas.add(tbl.rpartition(".")[0])
        rows.append((f"{cat}.{tbl}", view))
    # the mounted catalog is part of the namespace surface: SHOW
    # CATALOGS/SCHEMAS must list it like Databricks lists a share-
    # backed catalog
    from ..tables import metasql

    reg = metasql._NAMESPACES.setdefault(session_key(spark), {})
    reg.setdefault(("catalog", cat), {})["comment"] = _comment(m) or (
        f"mounted from share {share}"
    )
    for sch in schemas:
        reg.setdefault(("schema", f"{cat}.{sch}"), {})
    return spark.createDataFrame(
        rows, "table string, mounted_view string"
    )


def rewrite_mounts(spark: SparkSession, sql: str) -> str:
    """Re-point mounted 3-part names (``partner_data.schema.table``)
    at their mounted views; quote-aware (via sqldml's shared
    replace-outside-quotes helper). A cheap substring pre-check keeps
    the cost zero for statements that reference no mount."""
    from ..session import session_key
    from ..tables import sqldml

    mounts = _MOUNTS.get(session_key(spark))
    if not mounts:
        return sql
    low = sql.lower()
    for full, view in mounts.items():
        if full not in low:
            continue
        sql = sqldml._replace_outside_quotes(
            sql, r"\b" + re.escape(full) + r"\b", view
        )
        low = sql.lower()
    return sql


def run_share_sql(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute one share-DDL statement; None when ``sql`` is not one.
    An unparseable statement that still starts with a share verb raises
    (loud refusal) rather than falling through to spark.sql."""
    if not _SHARE_VERB_RE.match(sql):
        return None

    if re.match(r"^\s*CREATE\s+CATALOG\b", sql, re.IGNORECASE):
        m = _MOUNT_RE.match(sql)
        if m is None:
            # plain CREATE CATALOG (no USING SHARE) is namespace DDL —
            # tables/metasql owns it
            return None
        return _mount_share_catalog(spark, m)

    m = _CREATE_SHARE_RE.match(sql)
    if m:
        name = _clean(m.group("name"))
        _require_share_admin(spark, name)
        provider = _provider(spark)
        if name in _load_registry(provider.root)["shares"] and not m.group(
            "ine"
        ):
            raise ValueError(
                f"share already exists: {name} "
                "(use CREATE SHARE IF NOT EXISTS to keep it)"
            )
        provider.create_share(name, comment=_comment(m))
        return spark.createDataFrame(
            [("CREATE SHARE", name)], "operation string, share string"
        )

    m = _ADD_TABLE_RE.match(sql)
    if m:
        share = _clean(m.group("share"))
        tname = _clean(m.group("table"))
        _require_share_admin(spark, share)
        from ..tables import sqldml
        from . import access_control as acl

        table = sqldml.resolve_table(spark, tname)
        # sharing is a read grant to outsiders: the issuer must itself
        # be able to read the table
        if acl.enabled(spark):
            acl.enforce(spark, "SELECT", acl.canonical_name(spark, tname))
        alias = _clean(m.group("alias"))
        if not alias:
            bits = tname.split(".")
            alias = (
                ".".join(bits[-2:]) if len(bits) >= 2 else f"default.{tname}"
            )
        _provider(spark).add_table(
            share,
            table.root,
            alias,
            partition_filter=_partition_filter(m.group("part")),
            comment=_comment(m),
        )
        return spark.createDataFrame(
            [("ADD TABLE", share, alias)],
            "operation string, share string, alias string",
        )

    m = _REMOVE_TABLE_RE.match(sql)
    if m:
        share = _clean(m.group("share"))
        _require_share_admin(spark, share)
        _provider(spark).remove_table(share, _clean(m.group("alias")))
        return spark.createDataFrame(
            [("REMOVE TABLE", share)], "operation string, share string"
        )

    m = _CREATE_RECIPIENT_RE.match(sql)
    if m:
        name = _clean(m.group("name"))
        # the name becomes a filesystem path component (the profile
        # file): block traversal/separators, keep Databricks-legal
        # hyphens and dots
        if (
            not re.fullmatch(r"[\w.-]+", name)
            or ".." in name
            or name.startswith(".")
        ):
            raise ValueError(
                f"CREATE RECIPIENT: invalid recipient name {name!r}"
            )
        _require_share_admin(spark, name)
        provider = _provider(spark)
        profile = str(Path(provider.root) / "recipients" / f"{name}.share")
        reg = _load_registry(provider.root)
        if name in reg["recipients"]:
            # the parsed clause, NOT a statement-wide re-scan (the
            # phrase inside a COMMENT literal must not count)
            if m.group("ine"):
                return spark.createDataFrame(
                    [("CREATE RECIPIENT", name, profile, True)],
                    "operation string, recipient string, "
                    "profile string, already_exists boolean",
                )
            # a silent re-create would rotate the bearer token and
            # break the profile already distributed to the recipient
            raise ValueError(
                f"recipient already exists: {name} "
                "(use CREATE RECIPIENT IF NOT EXISTS to keep it)"
            )
        Path(profile).parent.mkdir(parents=True, exist_ok=True)
        provider.create_recipient(name, profile, comment=_comment(m))
        # the USING ID clause identifies a Databricks-to-Databricks
        # recipient; the filesystem emulation records it as metadata
        if m.group("id"):
            reg = _load_registry(provider.root)
            reg["recipients"][name]["sharing_id"] = m.group("id")
            provider._save(reg)
        return spark.createDataFrame(
            [("CREATE RECIPIENT", name, profile, False)],
            "operation string, recipient string, "
            "profile string, already_exists boolean",
        )

    m = _DROP_SHARE_RE.match(sql)
    if m:
        name = _clean(m.group("name"))
        _require_share_admin(spark, name)
        provider = _provider(spark)
        exists = name in _load_registry(provider.root)["shares"]
        if not exists and not m.group("ie"):
            raise ValueError(
                f"no such share: {name} (use DROP SHARE IF EXISTS)"
            )
        if exists:
            provider.delete_share(name)
        return spark.createDataFrame(
            [("DROP SHARE", name, exists)],
            "operation string, share string, dropped boolean",
        )

    m = _DROP_RECIPIENT_RE.match(sql)
    if m:
        name = _clean(m.group("name"))
        _require_share_admin(spark, name)
        provider = _provider(spark)
        exists = name in _load_registry(provider.root)["recipients"]
        if not exists and not m.group("ie"):
            raise ValueError(
                f"no such recipient: {name} (use DROP RECIPIENT IF EXISTS)"
            )
        if exists:
            provider.delete_recipient(name)
        return spark.createDataFrame(
            [("DROP RECIPIENT", name, exists)],
            "operation string, recipient string, dropped boolean",
        )

    m = _GRANT_SHARE_RE.match(sql)
    if m:
        share = _clean(m.group("share"))
        _require_share_admin(spark, share)
        _provider(spark).grant(share, _clean(m.group("who")))
        return spark.createDataFrame(
            [("GRANT", share, _clean(m.group("who")))],
            "operation string, share string, recipient string",
        )

    m = _REVOKE_SHARE_RE.match(sql)
    if m:
        share = _clean(m.group("share"))
        _require_share_admin(spark, share)
        _provider(spark).revoke(share, _clean(m.group("who")))
        return spark.createDataFrame(
            [("REVOKE", share, _clean(m.group("who")))],
            "operation string, share string, recipient string",
        )

    if _SHOW_SHARES_RE.match(sql):
        reg = _load_registry(_provider(spark).root)
        rows = [
            (name, s.get("comment", ""), len(s.get("tables", {})))
            for name, s in sorted(reg["shares"].items())
        ]
        return spark.createDataFrame(
            rows, "name string, comment string, num_tables int"
        )

    if _SHOW_RECIPIENTS_RE.match(sql):
        reg = _load_registry(_provider(spark).root)
        rows = [
            (name, r.get("comment", ""), r.get("sharing_id"))
            for name, r in sorted(reg["recipients"].items())
        ]
        return spark.createDataFrame(
            rows, "name string, comment string, sharing_id string"
        )

    m = _SHOW_IN_SHARE_RE.match(sql)
    if m:
        share = _clean(m.group("share"))
        reg = _load_registry(_provider(spark).root)
        if share not in reg["shares"]:
            raise ValueError(f"no such share: {share}")
        rows = [
            (alias, e["path"], e.get("filter"), e.get("comment", ""))
            for alias, e in sorted(reg["shares"][share]["tables"].items())
        ]
        return spark.createDataFrame(
            rows,
            "name string, location string, "
            "partition_filter string, comment string",
        )

    raise ValueError(f"cannot parse share DDL statement: {sql[:100]!r}")
