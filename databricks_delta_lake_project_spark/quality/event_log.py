"""Pipeline event log + the ``event_log()`` TVF emulation.

Databricks stores declarative-pipeline run events — flow progress and
expectation metrics — in an event log queryable as a table-valued
function::

    SELECT * FROM event_log(TABLE(catalog.schema.tbl))
    WHERE event_type = 'flow_progress'

(reference ``src/dlt_pipelines/dlt_bronze_to_silver.py:234`` and the
expectation-metrics form with ``details:flow_progress.data_quality.
expectations`` at ``src/quality/quality_monitoring.py:142``).

The engine's pipeline runner (`plans/pipeline.py`) emits one
``flow_progress`` event per materialized table into a session event
buffer; ``repoint`` rewrites ``event_log(TABLE(<name>))`` references
in a statement to a temp view over that buffer filtered to the named
flow, so both documented queries run verbatim. The ``details`` column
is a JSON string in the DLT ``flow_progress`` shape (status, row
metrics, ``data_quality.dropped_records`` and per-expectation
pass/fail counts); the Databricks ``details:<path>`` extraction
operator is normalized to ``get_json_object`` by the sqlpack dialect
rules. Driver-side O(events) metadata, like the audit buffer — no
query-path cost.
"""

from __future__ import annotations

import json
import re
import uuid
import warnings
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..session import session_key

# sid -> ordered flow_progress event rows (dicts matching _SCHEMA,
# plus a hidden "path" key holding the materialized table's path for
# exact-flow matching); FIFO-trimmed at the cap like the audit buffer
# (systables._AUDIT) so a long-lived session running pipelines on a
# schedule cannot grow driver memory without bound
_EVENTS: dict[str, list[dict]] = {}
_EVENT_CAP = 50_000

# opt-in durability (DLT's event log survives restarts): with this
# conf set to a LakeTable path, every flow_progress event is ALSO
# appended to that table, and event_log() serves buffer ∪ table — a
# fresh session can query a prior session's pipeline history. Appends
# are conflict-free commits, so concurrent pipeline runs never race
# the way the overwrite-based registries do.
PATH_CONF = "spark.engine.eventLog.path"

_SCHEMA = (
    "id string, sequence bigint, flow_name string, timestamp timestamp, "
    "event_type string, message string, level string, details string"
)
_COLS = (
    "id",
    "sequence",
    "flow_name",
    "timestamp",
    "event_type",
    "message",
    "level",
    "details",
)
# the durable table carries the materialized path as a real column
# (the buffer keeps it as a hidden key so the TVF schema stays the
# documented 8 columns)
_DUR_SCHEMA = _SCHEMA + ", path string"
_DUR_COLS = _COLS + ("path",)


def _durable_path(spark: SparkSession) -> str | None:
    try:
        return spark.conf.get(PATH_CONF) or None
    except Exception:  # noqa: BLE001
        return None


def record_flow_progress(
    spark: SparkSession,
    flow_name: str,
    *,
    action: str,
    rows: int,
    results: list,
    path: str | None = None,
) -> None:
    """One ``flow_progress`` event per materialized pipeline table
    (called by the runner after each node commits). ``results`` are
    the node's ExpectationResult records (empty when the table has no
    rules). ``path`` is the materialized table's storage path — the
    disambiguator ``events_df`` prefers over the basename when the
    TVF's table reference resolves to a registered table."""
    from .expectations import Action

    sid = session_key(spark)
    buf = _EVENTS.setdefault(sid, [])
    dropped = sum(
        r.n_fail
        for r in results
        if r.rule.action in (Action.DROP, Action.QUARANTINE)
    )
    details = {
        "flow_progress": {
            "status": "COMPLETED",
            "metrics": {"num_output_rows": rows},
            "data_quality": {
                "dropped_records": dropped,
                "expectations": [
                    {
                        "name": r.rule.name,
                        "dataset": flow_name,
                        "passed_records": r.n_pass,
                        "failed_records": r.n_fail,
                    }
                    for r in results
                ],
            },
        }
    }
    ev = {
        "id": str(uuid.uuid4()),
        # monotonic even across FIFO trims (len(buf) would reuse
        # sequence numbers after a trim)
        "sequence": (buf[-1]["sequence"] + 1) if buf else 0,
        "flow_name": flow_name.lower(),
        # naive UTC (systables.record_access convention): the durable
        # round-trip hands back naive timestamps, and the merge sort
        # in events_df must never compare aware against naive. The
        # instant is correct under the engine's UTC-pinned sessions
        # (session.py pins spark.sql.session.timeZone); a foreign
        # non-UTC session would skew it by its offset
        "timestamp": datetime.now(timezone.utc).replace(tzinfo=None),
        "event_type": "flow_progress",
        "message": (
            f"Flow '{flow_name}' has COMPLETED ({action}, "
            f"{rows} rows)"
        ),
        "level": "INFO",
        "details": json.dumps(details, sort_keys=True),
        "path": str(Path(path)) if path else None,
    }
    buf.append(ev)
    if len(buf) > _EVENT_CAP:
        del buf[: len(buf) - _EVENT_CAP]
    dur = _durable_path(spark)
    if dur:
        # observability write-through must never fail the pipeline run
        # it describes — warn and keep the session buffer as source
        try:
            _persist_event(spark, dur, ev)
        except Exception as e:  # noqa: BLE001
            warnings.warn(
                f"event log: could not persist flow_progress for "
                f"{flow_name!r} to {dur} ({e})",
                stacklevel=2,
            )


def _persist_event(spark: SparkSession, path: str, ev: dict) -> None:
    from ..governance.systables import _append_or_create

    _append_or_create(
        spark,
        path,
        spark.createDataFrame(
            [tuple(ev.get(c) for c in _DUR_COLS)], _DUR_SCHEMA
        ),
    )


def _esc(s: str) -> str:
    # Spark's default lexer escapes with BACKSLASH ('' is two
    # adjacent literals that concatenate, silently eating the
    # quote): double backslashes, then backslash-escape quotes —
    # either wrong and rows with such paths under-match silently
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _durable_events(spark: SparkSession, cond: str) -> list[dict]:
    """Rows from the durable event table matching one probe (empty
    without the conf): the probe is pushed into ``read_where`` so a
    years-old event table never collects WHOLE into the driver — only
    the matching candidate rows do (``events_df`` applies the exact
    rule after the merge). An unreadable table fails LOUDLY here —
    the read path is a user query, and silently serving partial
    history would misreport a pipeline's quality record."""
    path = _durable_path(spark)
    if not path:
        return []
    from ..tables import LakeTable

    if not LakeTable.is_table(path):
        return []
    return [
        {c: r[c] for c in _DUR_COLS}
        for r in LakeTable.for_path(spark, path).read_where(cond).collect()
    ]


def events_df(spark: SparkSession, table_ref: str) -> DataFrame:
    """Event rows for one flow: session buffer ∪ durable table (when
    ``PATH_CONF`` is set), deduplicated by event id.

    Matching prefers EXACT identity: when the TVF's table reference
    resolves to a registered table, events recorded for that table's
    storage path win — two pipelines whose nodes share a basename in
    different schemas keep separate histories. Only when the
    reference doesn't resolve (or no event carries its path) does the
    match fall back to the basename, the same suffix rule the
    engine's table-name resolution applies."""
    root: str | None = None
    try:
        from ..tables import sqldml

        root = str(Path(sqldml.resolve_table(spark, table_ref).root))
    except Exception:  # noqa: BLE001
        root = None
    base = table_ref.strip("`").lower().split(".")[-1]
    buf = list(_EVENTS.get(session_key(spark), []))
    have = {e["id"] for e in buf}
    # two-step probe, path identity first: `path = <root>` is a single
    # equality file-level stats CAN prune, and when it (or the session
    # buffer) hits, the basename probe — whose OR-of-LIKE shape defeats
    # pruning and would scan every file — never runs. The fallback
    # probe only fires for references that don't resolve to a storage
    # path (or whose events never carried one), mirroring exactly the
    # exact-rule preference applied to the merged rows below.
    dur: list[dict] = []
    if root is not None:
        dur = _durable_events(spark, f"path = '{_esc(root)}'")
    if not dur and not (
        root is not None
        and any(
            e.get("path") and str(Path(e["path"])) == root for e in buf
        )
    ):
        # LIKE's _ wildcard over-matches on underscored names:
        # harmless, the exact rule below re-applies
        dur = _durable_events(
            spark,
            f"flow_name = '{_esc(base)}' "
            f"OR flow_name LIKE '%.{_esc(base)}'",
        )
    evs = buf + [e for e in dur if e["id"] not in have]
    matched: list[dict] = []
    if root is not None:
        matched = [
            e
            for e in evs
            if e.get("path") and str(Path(e["path"])) == root
        ]
    if not matched:
        matched = [
            e for e in evs if e["flow_name"].split(".")[-1] == base
        ]
    # cross-session sequences collide; timestamp-then-sequence gives a
    # stable, meaningful order for ORDER BY-less consumers
    matched.sort(key=lambda e: (e["timestamp"], e["sequence"]))
    rows = [tuple(e[c] for c in _COLS) for e in matched]
    return spark.createDataFrame(rows, _SCHEMA)


_TVF_RE = re.compile(
    r"\bevent_log\s*\(\s*TABLE\s*\(\s*(?P<name>`[^`]+`|[\w.]+)\s*\)\s*\)",
    re.IGNORECASE,
)


def repoint(
    spark: SparkSession, sql: str
) -> tuple[str, list[str]]:
    """Rewrite ``event_log(TABLE(<name>))`` to temp views over the
    session event buffer — quote-aware, the same statement-scoped
    view pattern as ``systables.repoint``; the caller drops the
    returned views (via ``systables.drop_views``) after the statement
    executes."""
    from ..tables.sqldml import _mask

    views: list[str] = []
    mask = _mask(sql)
    parts, pos = [], 0
    for m in _TVF_RE.finditer(sql):
        if mask[m.start()][1]:
            continue  # inside a string literal: leave it alone
        view = f"engine_event_log_{len(views)}"
        events_df(spark, m.group("name")).createOrReplaceTempView(view)
        views.append(view)
        parts.append(sql[pos : m.start()])
        parts.append(view)
        pos = m.end()
    parts.append(sql[pos:])
    return "".join(parts), views
