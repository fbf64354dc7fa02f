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
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from ..session import session_key

# sid -> ordered flow_progress event rows (dicts matching _SCHEMA);
# FIFO-trimmed at the cap like the audit buffer (systables._AUDIT) so
# a long-lived session running pipelines on a schedule cannot grow
# driver memory without bound
_EVENTS: dict[str, list[dict]] = {}
_EVENT_CAP = 50_000

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


def record_flow_progress(
    spark: SparkSession,
    flow_name: str,
    *,
    action: str,
    rows: int,
    results: list,
) -> None:
    """One ``flow_progress`` event per materialized pipeline table
    (called by the runner after each node commits). ``results`` are
    the node's ExpectationResult records (empty when the table has no
    rules)."""
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
    buf.append(
        {
            "id": str(uuid.uuid4()),
            # monotonic even across FIFO trims (len(buf) would reuse
            # sequence numbers after a trim)
            "sequence": (buf[-1]["sequence"] + 1) if buf else 0,
            "flow_name": flow_name.lower(),
            "timestamp": datetime.now(timezone.utc),
            "event_type": "flow_progress",
            "message": (
                f"Flow '{flow_name}' has COMPLETED ({action}, "
                f"{rows} rows)"
            ),
            "level": "INFO",
            "details": json.dumps(details, sort_keys=True),
        }
    )
    if len(buf) > _EVENT_CAP:
        del buf[: len(buf) - _EVENT_CAP]


def events_df(spark: SparkSession, table_ref: str) -> DataFrame:
    """Event rows for one flow. The TVF takes a TABLE reference
    (``cat.schema.tbl``); pipeline flows are named by basename, so the
    match is on the last component — the same resolution the engine's
    suffix rule applies to table names."""
    base = table_ref.strip("`").lower().split(".")[-1]
    rows = [
        tuple(e[c] for c in _COLS)
        for e in _EVENTS.get(session_key(spark), [])
        if e["flow_name"].split(".")[-1] == base
    ]
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
