"""Data-quality expectations engine (Q3-Q7 in SURVEY §2.9).

Re-implements the reference's rule engine
(``/root/reference/src/quality/expectations.py:41-242``) and the DLT
expectation actions (``dlt_bronze_to_silver.py:104-177``):

* WARN       -> log metric, pass rows through (``@dlt.expect``)
* DROP       -> filter failing rows            (``@dlt.expect_or_drop``)
* FAIL       -> abort the pipeline             (``@dlt.expect_or_fail``)
* QUARANTINE -> route failing rows to a quarantine table with
                ``_quarantine_*`` audit columns (``expectations.py:34-48``)

Scale design: the reference evaluates rules in a driver loop of
``count()`` actions — one job per rule (``expectations.py:162-212``).
Here ALL rule metrics come from ONE conditional aggregation over a
single pass (SURVEY §4 scale note on A11), and the row routing is a
single filter each for the kept/rejected sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import LakeTable


class Action(str, Enum):
    WARN = "warn"
    DROP = "drop"
    FAIL = "fail"
    QUARANTINE = "quarantine"


@dataclass(frozen=True)
class QualityRule:
    """Mirror of the reference rule record (``expectations.py:41-48``):
    a named SQL predicate that passing rows must satisfy."""

    name: str
    condition: str  # SQL predicate; True = row passes
    action: Action = Action.WARN
    description: str = ""
    column: str | None = None

    def expr(self) -> Column:
        return F.expr(self.condition)


@dataclass
class ExpectationResult:
    rule: QualityRule
    n_total: int
    n_pass: int

    @property
    def n_fail(self) -> int:
        return self.n_total - self.n_pass

    @property
    def pass_rate(self) -> float:
        return self.n_pass / self.n_total if self.n_total else 1.0


class QualityViolation(RuntimeError):
    """Raised for Action.FAIL rules (``@dlt.expect_or_fail``)."""


class QualityEngine:
    """Applies a rule pack to a DataFrame in one pass.

    ``apply`` returns (kept_rows, results); DROP/QUARANTINE/FAIL rows
    are removed from the kept side, quarantined rows are appended to
    ``quarantine_table`` with audit columns, metrics are appended to
    ``metrics_table`` (reference ``expectations.py:202-242``).
    """

    def __init__(
        self,
        quarantine_table: LakeTable | None = None,
        metrics_table: LakeTable | None = None,
    ):
        self.quarantine_table = quarantine_table
        self.metrics_table = metrics_table

    def measure(
        self, df: DataFrame, rules: list[QualityRule]
    ) -> list[ExpectationResult]:
        """All rule metrics in ONE aggregation job (single-pass rewrite
        of the reference's per-rule count() loop)."""
        aggs = [F.count(F.lit(1)).alias("__total")] + [
            F.sum(F.when(r.expr(), 1).otherwise(0)).alias(f"__pass_{i}")
            for i, r in enumerate(rules)
        ]
        row = df.agg(*aggs).collect()[0]
        total = row["__total"]
        return [
            ExpectationResult(r, total, row[f"__pass_{i}"] or 0)
            for i, r in enumerate(rules)
        ]

    def apply(
        self,
        df: DataFrame,
        rules: list[QualityRule],
        source_name: str = "unknown",
    ) -> tuple[DataFrame, list[ExpectationResult]]:
        results = self.measure(df, rules)

        for res in results:
            if res.rule.action == Action.FAIL and res.n_fail > 0:
                self._record(results, source_name)
                raise QualityViolation(
                    f"rule '{res.rule.name}' failed for {res.n_fail} rows"
                )

        removing = [
            r for r in rules if r.action in (Action.DROP, Action.QUARANTINE)
        ]
        kept = df
        if removing:
            combined = removing[0].expr()
            for r in removing[1:]:
                combined = combined & r.expr()
            # null predicate results count as failures (dlt drop semantics)
            kept = df.filter(F.coalesce(combined, F.lit(False)))

        quarantined = [r for r in removing if r.action == Action.QUARANTINE]
        if quarantined and self.quarantine_table is not None:
            for r in quarantined:
                bad = df.filter(~F.coalesce(r.expr(), F.lit(False)))
                self.quarantine_table.append(
                    bad.withColumn("_quarantine_rule", F.lit(r.name))
                    .withColumn("_quarantine_source", F.lit(source_name))
                    .withColumn("_quarantine_at", F.current_timestamp())
                )
        self._record(results, source_name)
        return kept, results

    def _record(
        self, results: list[ExpectationResult], source_name: str
    ) -> None:
        if self.metrics_table is None or not results:
            return
        spark = SparkSession.getActiveSession()
        rows = [
            (
                source_name,
                res.rule.name,
                res.rule.action.value,
                res.n_total,
                res.n_pass,
                res.n_fail,
                float(res.pass_rate),
            )
            for res in results
        ]
        self.metrics_table.append(
            spark.createDataFrame(
                rows,
                "source string, rule string, action string, n_total long, "
                "n_pass long, n_fail long, pass_rate double",
            ).withColumn("measured_at", F.current_timestamp())
        )


# ---------------------------------------------------------------------------
# predefined rule packs (reference ``expectations.py:58-126``)
# ---------------------------------------------------------------------------


def customer_rules() -> list[QualityRule]:
    return [
        QualityRule(
            "valid_customer_id", "customer_id IS NOT NULL", Action.DROP,
            "primary key present",
        ),
        QualityRule(
            "valid_email",
            "email IS NULL OR email RLIKE '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}$'",
            Action.WARN,
            "email shape",
        ),
        QualityRule(
            "known_tier",
            "loyalty_tier IN ('bronze', 'silver', 'gold', 'platinum', 'unknown')",
            Action.WARN,
            "loyalty tier domain",
        ),
    ]


def transaction_rules(max_amount: float = 100_000.0) -> list[QualityRule]:
    return [
        QualityRule(
            "valid_transaction_id", "transaction_id IS NOT NULL", Action.DROP,
        ),
        QualityRule(
            "valid_customer_fk", "customer_id IS NOT NULL", Action.DROP,
        ),
        QualityRule(
            "positive_amount", "amount IS NOT NULL AND amount > 0", Action.DROP,
        ),
        QualityRule(
            "amount_below_cap",
            f"amount < {max_amount}",
            Action.QUARANTINE,
            "suspiciously large amounts reviewed, not dropped",
        ),
    ]


def required_metrics_schema() -> str:
    return (
        "source string, rule string, action string, n_total long, "
        "n_pass long, n_fail long, pass_rate double, measured_at timestamp"
    )
