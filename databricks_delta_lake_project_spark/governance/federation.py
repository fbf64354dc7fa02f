"""Lakehouse-Federation SQL DDL (S10 SQL tail; reference
``src/delta_sharing/lakehouse_federation.py:45-106``):

* ``CREATE CONNECTION [IF NOT EXISTS] <name> TYPE <type>
  OPTIONS (host '...', port '...', user secret('scope','key'), ...)``
* ``CREATE FOREIGN CATALOG [IF NOT EXISTS] <cat>
  USING CONNECTION <conn> [OPTIONS (database '...')]``
* ``SHOW CONNECTIONS`` (secret-valued / password options redacted)
* ``DROP CONNECTION [IF EXISTS] <name>`` /
  ``DROP FOREIGN CATALOG [IF EXISTS] <cat>``
* ``SHOW SCHEMAS IN <foreign-cat>`` / ``SHOW TABLES IN
  <foreign-cat>.<schema>`` — live JDBC metadata queries against the
  remote engine's system catalog (``lakehouse_federation.py:119-123``)

Foreign tables then resolve by 3-part name (``crm_postgres.public.
customers``) in any engine SQL statement: :func:`rewrite_foreign_tables`
re-points each reference at a lazily-created temp view over
``sources/jdbc.read_federated`` — the view wraps the UNMATERIALIZED
JDBC relation, so Catalyst still pushes filters and column pruning
into the remote SQL (the notebook's "predicate pushdown happens
automatically"). Nothing is copied until an action runs; repeated-use
mirroring goes through :func:`mirror_table`
(``lakehouse_federation.py:268-292``).

Secrets: ``secret('scope','key')`` literals resolve at CONNECTION USE
time (never stored resolved) from session conf
``spark.engine.secrets.<scope>.<key>`` — the OSS stand-in for
Databricks secret scopes. A missing secret refuses loudly at query
time, not silently at DDL time, matching how Databricks validates
connections lazily.

Governance: with ACL enforcement on, CREATE/DROP CONNECTION and
CREATE/DROP FOREIGN CATALOG require admin rights (UC gates these on
metastore privileges); reading a foreign table requires SELECT on the
``cat.schema.table`` securable with the usual USAGE inheritance — the
notebook's ``GRANT USAGE ON CATALOG crm_postgres`` /
``GRANT SELECT ON SCHEMA crm_postgres.public`` flow works unchanged,
and every enforced read lands in ``system.access.audit``.

Scale notes: registries are O(connections) driver-side metadata. The
data path is Spark's JDBC source — pushdown + ``partitionColumn``
range splitting (``sources/jdbc.py``) keep remote scans parallel and
narrow; metadata SHOW queries read a handful of system-catalog rows.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import session_key

__all__ = [
    "run_federation_sql",
    "rewrite_foreign_tables",
    "foreign_table",
    "mirror_table",
    "resolve_secret",
    "SECRET_CONF_PREFIX",
]

SECRET_CONF_PREFIX = "spark.engine.secrets."

# session -> {connection_name: {"type": str, "options": {k: v}}}; a
# secret-ref option value is stored as ("secret", scope, key) and
# resolved only when the connection is used
_CONNECTIONS: dict[str, dict[str, dict]] = {}
# session -> {catalog_name: {"connection": str, "database": str|None,
#             "comment": str|None}}
_FOREIGN_CATALOGS: dict[str, dict[str, dict]] = {}
# session -> {temp_view_name: full_3part_name} for the views
# rewrite_foreign_tables materializes. The views are ordinary session
# temp views, so a principal who knows the internal naming scheme can
# name one DIRECTLY after a privileged principal materialized it —
# enforce_internal_view_refs closes that hole by applying the same
# SELECT check + audit row the 3-part name gets, and DROP FOREIGN
# CATALOG drops the views so a dropped catalog stops serving data
_FED_VIEWS: dict[str, dict[str, str]] = {}

# option keys consumed by URL construction; everything else (user,
# password, driver, ssl...) passes through as JDBC reader options
_URL_KEYS = frozenset({"host", "port", "path", "url", "warehouse"})
# option keys whose values SHOW CONNECTIONS must never print
_REDACT_KEYS = frozenset({"password", "token", "private_key"})

_DEFAULT_PORTS = {"postgresql": 5432, "mysql": 3306, "sqlserver": 1433}


def resolve_secret(spark: SparkSession, scope: str, key: str) -> str:
    """``secret('scope','key')`` -> session conf
    ``spark.engine.secrets.<scope>.<key>``; loud refusal when unset."""
    conf_key = f"{SECRET_CONF_PREFIX}{scope}.{key}"
    try:
        val = spark.conf.get(conf_key)
    except Exception:  # noqa: BLE001
        val = None
    if val is None:
        raise ValueError(
            f"secret({scope!r}, {key!r}) is not defined: set "
            f"{conf_key} in the session conf"
        )
    return val


def _resolved_options(spark: SparkSession, conn: dict) -> dict[str, str]:
    out: dict[str, str] = {}
    for k, v in conn["options"].items():
        if isinstance(v, tuple) and v and v[0] == "secret":
            out[k] = resolve_secret(spark, v[1], v[2])
        else:
            out[k] = v
    return out


def _build_url(
    ctype: str, opts: dict[str, str], database: str | None
) -> str:
    """JDBC URL for a connection type; an explicit ``url`` option wins
    (the escape hatch that makes ANY JDBC engine reachable).

    TEST-COVERAGE NOTE: only the ``derby`` dialect runs end-to-end in
    this repo's test environment (embedded engine, driver ships inside
    Spark). The postgresql / mysql / sqlserver / snowflake branches
    are URL-construction-tested only — their URL shapes follow each
    vendor's published JDBC documentation, and the metadata queries
    below assume an ANSI ``information_schema`` (true for all four);
    validate against a live engine before relying on them in
    production."""
    if opts.get("url"):
        return opts["url"]
    host = opts.get("host")
    port = opts.get("port") or _DEFAULT_PORTS.get(ctype)
    if ctype == "postgresql":
        return f"jdbc:postgresql://{host}:{port}/{database or ''}"
    if ctype == "mysql":
        return f"jdbc:mysql://{host}:{port}/{database or ''}"
    if ctype == "sqlserver":
        return (
            f"jdbc:sqlserver://{host}:{port};databaseName={database or ''}"
        )
    if ctype == "snowflake":
        url = f"jdbc:snowflake://{host}/?db={database or ''}"
        if opts.get("warehouse"):
            url += f"&warehouse={opts['warehouse']}"
        return url
    if ctype == "derby":
        # embedded test engine (driver ships inside Spark): the DB is a
        # directory; a foreign catalog's `database` selects a subdir
        base = opts.get("path")
        if not base:
            raise ValueError(
                "connection TYPE DERBY needs OPTIONS (path '<dir>')"
            )
        return f"jdbc:derby:{base}/{database}" if database else (
            f"jdbc:derby:{base}"
        )
    raise ValueError(
        f"unsupported connection type {ctype!r}: supported are "
        "postgresql, mysql, sqlserver, snowflake, derby, or pass "
        "OPTIONS (url 'jdbc:...') for any other JDBC engine"
    )


def _connection(spark: SparkSession, name: str) -> dict:
    conns = _CONNECTIONS.get(session_key(spark), {})
    if name not in conns:
        raise ValueError(
            f"no such connection {name!r}; declared connections: "
            f"{sorted(conns)} (CREATE CONNECTION first)"
        )
    return conns[name]


def _jdbc_target(
    spark: SparkSession, cat: str
) -> tuple[str, str, dict[str, str]]:
    """(connection type, url, passthrough options) for a foreign
    catalog — secrets resolved here, at use time."""
    fcats = _FOREIGN_CATALOGS.get(session_key(spark), {})
    if cat not in fcats:
        raise ValueError(
            f"no such foreign catalog {cat!r}; declared: {sorted(fcats)}"
        )
    fc = fcats[cat]
    conn = _connection(spark, fc["connection"])
    opts = _resolved_options(spark, conn)
    url = _build_url(conn["type"], opts, fc.get("database"))
    passthrough = {k: v for k, v in opts.items() if k not in _URL_KEYS}
    return conn["type"], url, passthrough


def foreign_table(spark: SparkSession, full_name: str) -> DataFrame:
    """Lazy DataFrame over ``<foreign-cat>.<schema>.<table>`` — a
    pushdown-enabled JDBC scan (``sources/jdbc.read_federated``); the
    remote engine sees ``schema.table``."""
    from . import catalog_registry

    catalog_registry.ensure_loaded(spark)
    if "`" in full_name.strip("`"):
        # a dot-split would mis-parse `cat.`my.schema`.tbl` (the dot
        # inside the quoted part reads as a separator) — refuse loudly
        # instead of resolving the wrong table
        raise ValueError(
            "foreign_table: backtick-quoted name parts are not "
            f"supported, got {full_name!r}; pass the plain "
            "catalog.schema.table spelling"
        )
    bits = full_name.strip("`").split(".")
    if len(bits) != 3:
        raise ValueError(
            f"foreign table reference needs catalog.schema.table, got "
            f"{full_name!r}"
        )
    from ..sources.jdbc import read_federated

    _, url, opts = _jdbc_target(spark, bits[0].lower())
    return read_federated(spark, url, f"{bits[1]}.{bits[2]}", options=opts)


def mirror_table(
    spark: SparkSession,
    full_name: str,
    path: str,
    key: str | None = None,
):
    """Delta mirror of a federated table for repeated local joins
    (reference ``create_mirror_table``, ``lakehouse_federation.py:
    268-292``): full overwrite, or MERGE refresh when ``key`` is
    given; rows are stamped ``_mirror_timestamp`` like the
    reference's."""
    from ..sources.jdbc import mirror_to_lake

    src = foreign_table(spark, full_name).withColumn(
        "_mirror_timestamp", F.current_timestamp()
    )
    return mirror_to_lake(spark, src, path, key=key)


# ---------------------------------------------------------------------------
# SQL surface
# ---------------------------------------------------------------------------

_NAMEPAT = r"(`[^`]+`|\w+)"
_FED_VERB_RE = re.compile(
    r"^\s*(?:CREATE\s+CONNECTION|CREATE\s+FOREIGN\s+CATALOG"
    r"|SHOW\s+CONNECTIONS|DROP\s+CONNECTION|DROP\s+FOREIGN\s+CATALOG)\b",
    re.IGNORECASE,
)
_CREATE_CONN_RE = re.compile(
    rf"^\s*CREATE\s+CONNECTION\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<name>{_NAMEPAT})\s+TYPE\s+(?P<type>\w+)\s+"
    r"OPTIONS\s*\((?P<opts>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_FCAT_RE = re.compile(
    rf"^\s*CREATE\s+FOREIGN\s+CATALOG\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    rf"(?P<name>{_NAMEPAT})\s+USING\s+CONNECTION\s+(?P<conn>{_NAMEPAT})"
    r"(?:\s+OPTIONS\s*\((?P<opts>.*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DROP_CONN_RE = re.compile(
    rf"^\s*DROP\s+CONNECTION\s+(?P<ie>IF\s+EXISTS\s+)?"
    rf"(?P<name>{_NAMEPAT})\s*;?\s*$",
    re.IGNORECASE,
)
_DROP_FCAT_RE = re.compile(
    rf"^\s*DROP\s+FOREIGN\s+CATALOG\s+(?P<ie>IF\s+EXISTS\s+)?"
    rf"(?P<name>{_NAMEPAT})\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_CONNS_RE = re.compile(
    r"^\s*SHOW\s+CONNECTIONS\s*;?\s*$", re.IGNORECASE
)
_SHOW_SCHEMAS_RE = re.compile(
    r"^\s*SHOW\s+(?:SCHEMAS|DATABASES)\s+IN\s+(?P<cat>[\w.`]+)\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TABLES_RE = re.compile(
    r"^\s*SHOW\s+TABLES\s+IN\s+(?P<ns>[\w.`]+)\s*;?\s*$", re.IGNORECASE
)
# one OPTIONS item: key 'literal' | key "literal" | key secret('s','k')
_OPT_ITEM_RE = re.compile(
    r"\s*(?P<key>\w+)\s+(?:"
    r"secret\s*\(\s*'(?P<scope>[^']*)'\s*,\s*'(?P<skey>[^']*)'\s*\)"
    r"|'(?P<sq>(?:[^']|'')*)'"
    r"|\"(?P<dq>(?:[^\"]|\"\")*)\""
    r")\s*$"
)


def _parse_options(raw: str | None) -> dict:
    out: dict = {}
    raw = (raw or "").strip()
    if not raw:
        return out
    # split on commas outside quotes/parens (secret(...) holds a comma)
    items, depth, in_q, start = [], 0, None, 0
    for i, ch in enumerate(raw):
        if in_q:
            if ch == in_q:
                in_q = None
            continue
        if ch in ("'", '"'):
            in_q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(raw[start:i])
            start = i + 1
    items.append(raw[start:])
    for item in items:
        if not item.strip():
            continue
        m = _OPT_ITEM_RE.match(item)
        if not m:
            raise ValueError(f"cannot parse OPTIONS item {item!r}")
        key = m.group("key").lower()
        if m.group("scope") is not None:
            out[key] = ("secret", m.group("scope"), m.group("skey"))
        elif m.group("sq") is not None:
            out[key] = m.group("sq").replace("''", "'")
        else:
            out[key] = m.group("dq").replace('""', '"')
    return out


def _require_fed_admin(spark: SparkSession, securable: str, verb: str) -> None:
    """CONNECTION verbs are ADMIN-ONLY: connections live in their own
    securable namespace with no GRANT grammar, so keying on the flat
    catalog/table grant space would let ALL PRIVILEGES on a SAME-NAMED
    catalog create or drop an unrelated connection. Foreign-CATALOG
    verbs stay in the catalog namespace, where can_manage is the
    right check."""
    from . import access_control as acl

    if not acl.enabled(spark):
        return
    conn_verb = "CONNECTION" in verb.upper()
    if conn_verb:
        allowed = acl._is_admin(spark)
    else:
        allowed = acl.can_manage(spark, securable.lower())
    if not allowed:
        # denied federation DDL leaves an audit row like every other
        # manage-gated refusal — a credential-touching verb with no
        # trail would be the worst place to go dark
        from . import systables

        systables.record_access(
            spark, "ALL PRIVILEGES", securable.lower(), 403, action=verb
        )
        who = sorted(acl.current_principals(spark)) or ["<anonymous>"]
        raise PermissionError(
            f"principal {who} may not {verb} {securable!r}: requires "
            f"{acl.ADMINS_CONF} membership"
            + ("" if conn_verb else " or ALL PRIVILEGES")
            + " (UC gates federation DDL on metastore privileges)"
        )


# remote system-catalog queries per connection type; {schema} is the
# literal schema-name filter (pre-escaped). information_schema is the
# ANSI default; Derby exposes SYS.* instead. TEST-COVERAGE NOTE: the
# 'default' (information_schema) branch is exercised only against the
# documented ANSI shape, not a live postgres/mysql/sqlserver/snowflake
# engine (none runs in this sandbox) — Derby is the end-to-end-tested
# path.
_SCHEMAS_QUERY = {
    "derby": (
        "SELECT schemaname AS ns FROM sys.sysschemas "
        "WHERE schemaname NOT LIKE 'SYS%' "
        "AND schemaname NOT IN ('SQLJ', 'NULLID')"
    ),
    "default": "SELECT schema_name AS ns FROM information_schema.schemata",
}
_TABLES_QUERY = {
    "derby": (
        "SELECT s.schemaname AS ns, t.tablename AS tbl "
        "FROM sys.systables t "
        "JOIN sys.sysschemas s ON t.schemaid = s.schemaid "
        "WHERE t.tabletype = 'T' AND UPPER(s.schemaname) = '{schema}'"
    ),
    "default": (
        "SELECT table_schema AS ns, table_name AS tbl "
        "FROM information_schema.tables "
        "WHERE UPPER(table_schema) = '{schema}'"
    ),
}


def _meta_df(
    spark: SparkSession, ctype: str, url: str, opts: dict, query: str
) -> DataFrame:
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({query}) engine_meta")
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def rewrite_foreign_tables(spark: SparkSession, sql: str) -> str:
    """Re-point ``<foreign-cat>.<schema>.<table>`` references at lazy
    temp views over the JDBC scan; quote-aware, zero cost when the
    statement names no foreign catalog. With enforcement on, each
    referenced foreign table needs SELECT (+ USAGE chain) — and the
    check lands in system.access.audit like any table read."""
    from . import catalog_registry

    catalog_registry.ensure_loaded(spark)
    sid = session_key(spark)
    fcats = _FOREIGN_CATALOGS.get(sid)
    if not fcats:
        return sql
    from ..tables import sqldml
    from . import access_control as acl

    # a mutation/CTAS statement whose TARGET resolves into a foreign
    # catalog must refuse up front: splicing in (or resolving against)
    # the read-only temp view would fail downstream with a confusing
    # "no such table fed__..." — or, worse for CTAS, silently create a
    # LOCAL table under the spliced view name. Federated tables are
    # read-only through this engine (mirror + write back via the
    # remote's own tooling instead). The check matches a 3-PART name
    # in TARGET POSITION with the SAME spelling latitude as the
    # rewrite pattern below (backticked parts, spaced dots, leading
    # comments) — anything the rewriter would splice, the guard must
    # refuse first; 1-/2-part targets resolve locally (a local table
    # whose first component merely collides with a foreign-catalog
    # name keeps working).
    mt = re.match(
        # the verb inventory is SHARED with statement_target (plus
        # the creation verbs it deliberately excludes): TRUNCATE /
        # ALTER / OPTIMIZE / VACUUM / RESTORE refuse here too
        rf"\s*(?:{sqldml.TARGET_VERBS}|{sqldml.CREATE_VERBS})\s*"
        r"(`[^`]+`|\w+)\s*\.\s*(`[^`]+`|\w+)\s*\.\s*(`[^`]+`|\w+)"
        r"(?![\w`.])",
        sqldml._strip_comments(sql),
        re.IGNORECASE,
    )
    if mt:
        tcat = mt.group(1).strip("`").lower()
        if tcat in fcats:
            tgt = ".".join(
                mt.group(i).strip("`") for i in (1, 2, 3)
            ).lower()
            raise ValueError(
                f"foreign tables are read-only: {tgt!r} resolves into "
                f"foreign catalog {tcat!r}; mirror_table() copies it "
                "into a writable lake table"
            )

    for cat in fcats:
        if cat not in sql.lower():
            continue
        # spaced dots and backticked parts are legal identifier syntax
        # (`crm` . public . customers, crm.`public`.customers) — the
        # pattern accepts them, and the string-literal check anchors
        # on the SEPARATOR DOT: the quote mask marks backtick
        # identifier spans as quoted (a fully-backticked catalog part
        # would otherwise be skipped like a string), but the dot
        # between parts is never inside backticks, and a whole ref
        # inside a '...' literal puts the dot in-quote as it should
        pat = re.compile(
            # the boundary lookbehind guards BOTH spellings: without
            # it a qualified `c1.`cat`.x.y` would be hijacked
            r"(?<![\w.`])(?:`" + re.escape(cat) + r"`|"
            + re.escape(cat)
            + r")\s*(?P<d1>\.)\s*(`[^`]+`|\w+)\s*\.\s*"
            r"(`[^`]+`|\w+)(?![\w`])",
            re.IGNORECASE,
        )
        mask = sqldml._mask(sql)
        parts: list[str] = []
        pos = 0
        seen: dict[tuple[str, str], str] = {}
        for m in pat.finditer(sql):
            if mask[m.start("d1")][1]:
                continue
            schema = m.group(2).strip("`").lower()
            table = m.group(3).strip("`").lower()
            # parts that NEED backticks (spaces, dots) are left alone —
            # a splice of such a name into a temp-view identifier
            # would be invalid SQL; they fall through natively
            if not (
                re.fullmatch(r"\w+", schema)
                and re.fullmatch(r"\w+", table)
            ):
                continue
            view = seen.get((schema, table))
            if view is None:
                # first occurrence pays the check + eager remote
                # schema fetch ONCE; a self-join reuses the view
                full = f"{cat}.{schema}.{table}"
                if acl.enabled(spark):
                    acl.enforce(spark, "SELECT", full)
                if "__" in schema or "__" in table:
                    # '__' is the view-name separator: (s__x, t) and
                    # (s, x__t) would build the SAME readable name and
                    # silently swap tables — such parts get a
                    # deterministic digest name instead (boundaries
                    # hashed, so no collision; still fed__<cat>__
                    # prefixed for the DROP sweep and the view guard)
                    # sha256, not md5: md5() raises on FIPS-enforcing
                    # builds even for non-cryptographic name-mangling
                    digest = hashlib.sha256(
                        full.encode()
                    ).hexdigest()[:12]
                    view = f"fed__{cat}__h{digest}"
                else:
                    view = f"fed__{cat}__{schema}__{table}"
                foreign_table(spark, full).createOrReplaceTempView(view)
                _FED_VIEWS.setdefault(sid, {})[view] = full
                seen[(schema, table)] = view
            parts.append(sql[pos : m.start()])
            parts.append(view)
            pos = m.end()
        parts.append(sql[pos:])
        sql = "".join(parts)
    return sql


def enforce_internal_view_refs(spark: SparkSession, sql: str) -> None:
    """SELECT-check + audit a statement that names an engine-internal
    ``fed__<cat>__<schema>__<table>`` view DIRECTLY. The views
    rewrite_foreign_tables materializes are ordinary session temp
    views; once a privileged principal materializes one, a later
    statement can resolve it natively, bypassing the rewrite-time
    check — which would break the "every foreign read lands in
    system.access.audit" contract. Callers pass the PRE-rewrite
    statement so legitimately spliced view names (already enforced at
    splice time) are not double-audited. Shares the fail-closed token
    scan with ``acl.referenced_tables``
    (``sqldml.identifier_tokens``)."""
    views = _FED_VIEWS.get(session_key(spark))
    if not views:
        return
    from ..tables import sqldml
    from . import access_control as acl

    refs = sqldml.identifier_tokens(sql)
    for view, full in views.items():
        if view in refs:
            acl.enforce(spark, "SELECT", full)


def run_federation_sql(spark: SparkSession, sql: str) -> DataFrame | None:
    """Execute one federation DDL/metadata statement; None when ``sql``
    is not one (the caller falls through). Unparseable statements that
    still start with a federation verb refuse loudly."""
    from . import catalog_registry

    catalog_registry.ensure_loaded(spark)
    sid = session_key(spark)

    m = _SHOW_SCHEMAS_RE.match(sql)
    if m:
        cat = m.group("cat").strip("`").lower()
        if cat not in _FOREIGN_CATALOGS.get(sid, {}):
            return None  # not ours: metasql / native handles it
        from . import access_control as acl

        # listing remote inventory spends the stored credentials: gate
        # like every native SHOW verb (UC: USE CATALOG) — admins pass
        # like they do through can_list but still leave an audit row
        # (a credential-spending read with no trail would be worse
        # for the MOST privileged principal, not better)
        if acl.enabled(spark):
            if acl._is_admin(spark):
                from . import systables

                systables.record_access(spark, "USAGE", cat, 200)
            else:
                acl.enforce(spark, "USAGE", cat)
        ctype, url, opts = _jdbc_target(spark, cat)
        q = _SCHEMAS_QUERY.get(ctype, _SCHEMAS_QUERY["default"])
        df = _meta_df(spark, ctype, url, opts, q)
        return df.select(
            F.lower(F.col(df.columns[0])).alias("namespace")
        ).orderBy("namespace")

    m = _SHOW_TABLES_RE.match(sql)
    if m:
        ns = m.group("ns").strip("`").lower()
        cat, _, schema = ns.partition(".")
        if not schema or cat not in _FOREIGN_CATALOGS.get(sid, {}):
            return None
        from . import access_control as acl

        if acl.enabled(spark):
            if acl._is_admin(spark):
                from . import systables

                systables.record_access(spark, "USAGE", cat, 200)
            else:
                acl.enforce(spark, "USAGE", cat)
        ctype, url, opts = _jdbc_target(spark, cat)
        q = _TABLES_QUERY.get(ctype, _TABLES_QUERY["default"]).format(
            schema=schema.upper().replace("'", "''")
        )
        df = _meta_df(spark, ctype, url, opts, q)
        return df.select(
            F.lower(F.col(df.columns[0])).alias("namespace"),
            F.lower(F.col(df.columns[1])).alias("tableName"),
            F.lit(False).alias("isTemporary"),
        ).orderBy("tableName")

    if not _FED_VERB_RE.match(sql):
        return None

    m = _CREATE_CONN_RE.match(sql)
    if m:
        name = m.group("name").strip("`").lower()
        _require_fed_admin(spark, name, "CREATE CONNECTION")
        conns = _CONNECTIONS.setdefault(sid, {})
        if name in conns:
            if m.group("ine"):
                return spark.createDataFrame(
                    [("CREATE CONNECTION", name, True)],
                    "operation string, name string, already_exists boolean",
                )
            raise ValueError(
                f"connection already exists: {name} "
                "(use CREATE CONNECTION IF NOT EXISTS to keep it)"
            )
        ctype = m.group("type").lower()
        conns[name] = {
            "type": ctype,
            "options": _parse_options(m.group("opts")),
        }
        catalog_registry.record(
            spark,
            "connection",
            name,
            # json.dumps serializes the secret tuples as arrays;
            # _apply_row restores them to tuples on load
            {"type": ctype, "options": conns[name]["options"]},
        )
        return spark.createDataFrame(
            [("CREATE CONNECTION", name, False)],
            "operation string, name string, already_exists boolean",
        )

    m = _CREATE_FCAT_RE.match(sql)
    if m:
        name = m.group("name").strip("`").lower()
        # the name becomes both a rewrite key and a temp-view name
        # segment (fed__<cat>__...): spaces/dots allowed by the
        # backtick grammar would build an invalid view identifier and
        # fail obscurely at first query — refuse at DDL time instead.
        # Double underscores are refused too: '__' is the view-name
        # SEPARATOR, so catalogs 'a' and 'a__b' would collide view
        # names (swapping data) and DROP's fed__<cat>__ prefix sweep
        # would cross catalog boundaries
        if not re.fullmatch(r"\w+", name) or "__" in name:
            raise ValueError(
                f"CREATE FOREIGN CATALOG: invalid catalog name {name!r} "
                "(letters, digits and single underscores only)"
            )
        _require_fed_admin(spark, name, "CREATE FOREIGN CATALOG")
        conn_name = m.group("conn").strip("`").lower()
        _connection(spark, conn_name)  # loud refusal before registering
        fcats = _FOREIGN_CATALOGS.setdefault(sid, {})
        if name in fcats:
            if m.group("ine"):
                return spark.createDataFrame(
                    [("CREATE FOREIGN CATALOG", name, True)],
                    "operation string, name string, already_exists boolean",
                )
            raise ValueError(
                f"foreign catalog already exists: {name} "
                "(use CREATE FOREIGN CATALOG IF NOT EXISTS to keep it)"
            )
        opts = _parse_options(m.group("opts"))
        db = opts.get("database")
        if isinstance(db, tuple):
            raise ValueError(
                "FOREIGN CATALOG OPTIONS (database ...) cannot be a secret"
            )
        fcats[name] = {"connection": conn_name, "database": db}
        # the foreign catalog is part of the namespace surface: SHOW
        # CATALOGS lists it like Databricks lists a federated catalog
        from ..tables import metasql

        reg = metasql._NAMESPACES.setdefault(sid, {})
        reg.setdefault(("catalog", name), {})["comment"] = (
            f"foreign catalog using connection {conn_name}"
        )
        catalog_registry.record(
            spark, "foreign_catalog", name, dict(fcats[name])
        )
        return spark.createDataFrame(
            [("CREATE FOREIGN CATALOG", name, False)],
            "operation string, name string, already_exists boolean",
        )

    if _SHOW_CONNS_RE.match(sql):
        from . import access_control as acl

        # admin-only under enforcement: connections are a separate
        # securable namespace with no GRANT grammar of their own, and
        # keying on the flat catalog/table grant space would reveal a
        # connection to a SAME-NAMED catalog's grantees (UC gates
        # connection listing on connection-level privileges)
        rows = []
        if not acl.enabled(spark) or acl._is_admin(spark):
            rows_src = sorted(_CONNECTIONS.get(sid, {}).items())
        else:
            rows_src = []
        for name, conn in rows_src:
            shown = []
            for k, v in sorted(conn["options"].items()):
                if isinstance(v, tuple) and v and v[0] == "secret":
                    shown.append(f"{k}=secret('{v[1]}','{v[2]}')")
                elif k in _REDACT_KEYS:
                    shown.append(f"{k}=<redacted>")
                else:
                    shown.append(f"{k}={v}")
            rows.append((name, conn["type"], ", ".join(shown)))
        return spark.createDataFrame(
            rows, "name string, connection_type string, options string"
        )

    m = _DROP_CONN_RE.match(sql)
    if m:
        name = m.group("name").strip("`").lower()
        _require_fed_admin(spark, name, "DROP CONNECTION")
        conns = _CONNECTIONS.get(sid, {})
        if name not in conns:
            if m.group("ie"):
                return spark.createDataFrame(
                    [("DROP CONNECTION", name, False)],
                    "operation string, name string, dropped boolean",
                )
            raise ValueError(f"no such connection: {name}")
        users = sorted(
            c
            for c, fc in _FOREIGN_CATALOGS.get(sid, {}).items()
            if fc["connection"] == name
        )
        if users:
            # a dangling foreign catalog would fail at first use with a
            # confusing missing-connection error — refuse up front
            raise ValueError(
                f"connection {name!r} is used by foreign catalog(s) "
                f"{users}: DROP FOREIGN CATALOG first"
            )
        del conns[name]
        catalog_registry.erase(spark, "connection", name)
        return spark.createDataFrame(
            [("DROP CONNECTION", name, True)],
            "operation string, name string, dropped boolean",
        )

    m = _DROP_FCAT_RE.match(sql)
    if m:
        name = m.group("name").strip("`").lower()
        _require_fed_admin(spark, name, "DROP FOREIGN CATALOG")
        fcats = _FOREIGN_CATALOGS.get(sid, {})
        if name not in fcats:
            if m.group("ie"):
                return spark.createDataFrame(
                    [("DROP FOREIGN CATALOG", name, False)],
                    "operation string, name string, dropped boolean",
                )
            raise ValueError(f"no such foreign catalog: {name}")
        del fcats[name]
        # drop the materialized fed__ views for this catalog: they
        # wrap live JDBC relations and would keep serving remote data
        # (with the dropped catalog's credentials) after the drop
        fviews = _FED_VIEWS.get(sid, {})
        for view in [v for v in fviews if v.startswith(f"fed__{name}__")]:
            fviews.pop(view, None)
            try:
                spark.catalog.dropTempView(view)
            except Exception:  # noqa: BLE001
                pass
        from ..tables import metasql

        metasql._NAMESPACES.get(sid, {}).pop(("catalog", name), None)
        # grants on the foreign catalog (and mounted names under it)
        # die with it — a recreate against a DIFFERENT remote must not
        # inherit the old catalog's privileges, durably or otherwise
        from . import access_control as _acl

        _acl.purge_grants(spark, name, prefix=True)
        catalog_registry.erase(spark, "foreign_catalog", name)
        return spark.createDataFrame(
            [("DROP FOREIGN CATALOG", name, True)],
            "operation string, name string, dropped boolean",
        )

    raise ValueError(f"cannot parse federation statement: {sql[:100]!r}")
