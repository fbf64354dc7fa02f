"""Declarative pipeline DAG (Q1-Q2 in SURVEY §2.9): the engine's
DLT-equivalent.

The reference declares tables with ``@dlt.table`` and reads upstream
nodes with ``dlt.read``/``dlt.read_stream``; DLT infers the DAG and
runs it (``dlt_customer_360_complete.py:57-123,296-312``). Here:

* ``@pipeline.table(name=...)`` registers a node; the function body
  calls ``ctx.read("upstream")`` which both records the dependency
  edge and returns the upstream DataFrame.
* ``Pipeline.run`` resolves the DAG dynamically (worklist): a node
  whose ``ctx.read`` hits an upstream not yet materialized this run is
  deferred and retried after others progress — no pre-declared edges
  needed, cycles are detected when a full sweep makes no progress.
  This is the same dependency-inference contract DLT provides, done
  at execution time instead of parse time.
* Each node materializes into a LakeTable under the pipeline root:
  - materialized view (default): full recompute, overwrite — DLT MV
    semantics (``INTERVIEW_GUIDE.md:222-227``);
  - incremental table (``incremental=True`` + ``key``): MERGE upsert
    by key — the batch equivalent of a DLT streaming-table refresh.
* ``expectations=[...]`` attaches quality rules evaluated through the
  single-pass QualityEngine before the write; DROP/QUARANTINE/FAIL
  act per SURVEY §2.9 Q3-Q6.

The topo order mirrors the reference's 4-stage orchestration DAG
(``orchestration/workflow_definitions.json:25-176``) without an
external scheduler; independent nodes could be dispatched from
threads (Spark schedules jobs from separate threads fine) — kept
sequential here for deterministic tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from ..quality.expectations import QualityEngine, QualityRule
from ..tables import LakeTable


@dataclass
class _Node:
    name: str
    fn: Callable[["_Context"], DataFrame]
    incremental: bool = False
    key: str | None = None
    expectations: list[QualityRule] = field(default_factory=list)
    comment: str = ""
    deps: set[str] = field(default_factory=set)


class _Deferred(Exception):
    """Raised by ctx.read when the upstream hasn't run yet this sweep."""


class _Context:
    """Passed to node functions; ``read`` records dependency edges and
    defers the node when an upstream isn't materialized yet."""

    def __init__(
        self, pipeline: "Pipeline", node: _Node, spark: SparkSession,
        pending: set[str],
    ):
        self._p = pipeline
        self._node = node
        self.spark = spark
        self._pending = pending

    def read(self, name: str) -> DataFrame:
        if name not in self._p._nodes:
            raise KeyError(f"unknown upstream table: {name}")
        self._node.deps.add(name)
        if name in self._pending:
            raise _Deferred(name)
        return LakeTable.for_path(
            self.spark, self._p._table_path(name)
        ).to_df()


@dataclass
class PipelineResult:
    order: list[str]
    metrics: dict[str, dict[str, Any]]


class Pipeline:
    """A named DAG of table definitions materialized under ``root``."""

    def __init__(self, root: str, quality: QualityEngine | None = None):
        self.root = str(Path(root))
        self._nodes: dict[str, _Node] = {}
        self.quality = quality or QualityEngine()

    # -- declaration -------------------------------------------------------

    def table(
        self,
        name: str | None = None,
        incremental: bool = False,
        key: str | None = None,
        expectations: list[QualityRule] | None = None,
        comment: str = "",
    ) -> Callable[[Callable], Callable]:
        """Decorator mirroring ``@dlt.table`` (Q1)."""

        def deco(fn: Callable) -> Callable:
            node_name = name or fn.__name__
            if incremental and not key:
                raise ValueError(f"incremental table {node_name} needs a key")
            self._nodes[node_name] = _Node(
                node_name, fn, incremental, key, list(expectations or []), comment
            )
            return fn

        return deco

    # -- execution ---------------------------------------------------------

    def _table_path(self, name: str) -> str:
        return str(Path(self.root) / name)

    def table_df(self, spark: SparkSession, name: str) -> DataFrame:
        return LakeTable.for_path(spark, self._table_path(name)).to_df()

    def run(self, spark: SparkSession) -> PipelineResult:
        pending = set(self._nodes)
        order: list[str] = []
        metrics: dict[str, dict[str, Any]] = {}
        while pending:
            progressed = False
            for name in sorted(pending):
                node = self._nodes[name]
                node.deps = set()
                ctx = _Context(self, node, spark, pending)
                try:
                    df = node.fn(ctx)
                except _Deferred:
                    continue
                metrics[name] = self._materialize(spark, node, df)
                # the inferred DAG edges feed the engine's
                # system.lineage.table_lineage view (reference
                # lineage_and_audit.py:115-124 derives the same edges
                # in the UC control plane)
                from ..governance import systables

                for dep in sorted(node.deps):
                    systables.record_lineage(spark, dep, name)
                order.append(name)
                pending.discard(name)
                progressed = True
            if not progressed:
                raise ValueError(f"dependency cycle among: {sorted(pending)}")
        return PipelineResult(order, metrics)

    def _materialize(
        self, spark: SparkSession, node: _Node, df: DataFrame
    ) -> dict[str, Any]:
        results: list = []
        if node.expectations:
            df, results = self.quality.apply(df, node.expectations, node.name)
            rule_metrics = {
                r.rule.name: {"n_pass": r.n_pass, "n_fail": r.n_fail}
                for r in results
            }
        else:
            rule_metrics = {}
        path = self._table_path(node.name)
        if not LakeTable.is_table(path):
            LakeTable.create(spark, path, df=df)
            action = "create"
        elif node.incremental:
            t = LakeTable.for_path(spark, path)
            (
                t.merge(df, f"t.{node.key} = s.{node.key}")
                .whenMatchedUpdateAll()
                .whenNotMatchedInsertAll()
                .execute()
            )
            action = "merge"
        else:
            LakeTable.for_path(spark, path).overwrite(df)
            action = "overwrite"
        n_rows = LakeTable.for_path(spark, path).to_df().count()
        # one DLT-shaped flow_progress event per materialized table —
        # the event_log(TABLE(t)) TVF queries these
        from ..quality import event_log

        event_log.record_flow_progress(
            spark,
            node.name,
            action=action,
            rows=n_rows,
            results=results,
            path=path,
        )
        return {"action": action, "rows": n_rows, "expectations": rule_metrics}


def table(pipeline: Pipeline, **kwargs: Any) -> Callable[[Callable], Callable]:
    """Functional alias: ``@table(pipeline, name=...)``."""
    return pipeline.table(**kwargs)
