"""The engine's flagship assembled flow: Bronze -> Silver -> Gold
Customer-360 medallion pipeline (reference architecture
``docs/ARCHITECTURE.md:5-53``, DAG
``orchestration/workflow_definitions.json:25-176``, DLT form
``src/dlt_pipelines/dlt_customer_360_complete.py``).

Declared on the engine's own primitives:

* Pipeline DAG with dependency inference (plans.pipeline — Q1/Q2)
* quality expectations at the silver gates (quality.expectations — Q3-Q6)
* row_number dedup, star joins, conditional aggregation, RFM scoring
  (operators + the same shapes the oracle-checked catalog queries pin)
* LakeTable materialization: bronze append-only semantics, silver/gold
  recomputed as MVs (incremental MERGE is exercised by pipeline tests)

Config mirrors ``config/pipeline_config.py`` (paths, thresholds,
cluster map).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..plans import Pipeline, PipelineResult
from ..quality.expectations import Action, QualityEngine, QualityRule
from ..queries.catalog import _dec, load


@dataclass
class Customer360Config:
    """Engine mirror of ``config/pipeline_config.py:32-128``."""

    root: str
    sf_dir: str
    churn_ref_date: str = "2001-09-01"
    null_rate_max: float = 0.05
    freshness_hours_max: float = 24.0
    cluster_map: dict[str, list[str]] = field(
        default_factory=lambda: {
            "silver_orders": ["o_custkey", "o_orderdate"],
            "gold_customer_360": ["customer_id"],
        }
    )


def build_customer360(cfg: Customer360Config) -> Pipeline:
    p = Pipeline(cfg.root, quality=QualityEngine())

    # -- bronze: raw, append-only shape -----------------------------------

    @p.table(name="bronze_orders", comment="raw orders feed")
    def bronze_orders(ctx):
        return load(ctx.spark, cfg.sf_dir, "orders")

    @p.table(name="bronze_events", comment="raw clickstream feed")
    def bronze_events(ctx):
        return load(ctx.spark, cfg.sf_dir, "events")

    @p.table(name="bronze_customers", comment="raw CRM feed")
    def bronze_customers(ctx):
        return load(ctx.spark, cfg.sf_dir, "customer")

    # -- silver: dedup + clean + quality gates ----------------------------

    @p.table(
        name="silver_orders",
        expectations=[
            QualityRule("valid_order_key", "o_orderkey IS NOT NULL", Action.DROP),
            QualityRule("valid_cust_fk", "o_custkey IS NOT NULL", Action.DROP),
            QualityRule("positive_amount", "o_totalprice > 0", Action.DROP),
            QualityRule(
                "known_status", "o_orderstatus IN ('O','F','P')", Action.WARN
            ),
        ],
    )
    def silver_orders(ctx):
        o = ctx.read("bronze_orders")
        w = Window.partitionBy("o_orderkey").orderBy(
            F.col("o_orderdate").desc(), F.col("o_custkey").desc()
        )
        return (
            o.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("order_date", F.col("o_orderdate").cast("date"))
        )

    @p.table(
        name="silver_events",
        expectations=[
            QualityRule("valid_event_id", "event_id IS NOT NULL", Action.DROP),
            QualityRule(
                "known_event_type",
                "event_type IN ('view','click','purchase','error')",
                Action.WARN,
            ),
        ],
    )
    def silver_events(ctx):
        e = ctx.read("bronze_events")
        w = Window.partitionBy("event_id").orderBy(F.col("ts").desc())
        return (
            e.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn("event_date", F.col("ts").cast("date"))
        )

    # -- gold: star join, rollup, segments --------------------------------

    @p.table(name="gold_customer_360", comment="unified customer profile")
    def gold_customer_360(ctx):
        c = ctx.read("bronze_customers")
        o = ctx.read("silver_orders")
        e = ctx.read("silver_events")
        order_agg = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
            F.count(F.lit(1)).alias("order_count"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"),
            F.max("order_date").alias("last_order_date"),
        )
        event_agg = e.groupBy(F.col("user_id").alias("customer_id")).agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("purchase_events"),
        )
        tier = (
            F.when(F.col("total_spent") > 400000, "platinum")
            .when(F.col("total_spent") > 200000, "gold")
            .when(F.col("total_spent") > 50000, "silver")
            .otherwise("bronze")
        )
        return (
            c.withColumnRenamed("c_custkey", "customer_id")
            .join(order_agg, "customer_id", "left")
            .join(event_agg, "customer_id", "left")
            .na.fill(
                {
                    "order_count": 0,
                    "total_spent": 0.0,
                    "event_count": 0,
                    "purchase_events": 0,
                }
            )
            .withColumn("value_tier", tier)
        )

    @p.table(name="gold_revenue_daily", comment="daily revenue rollup")
    def gold_revenue_daily(ctx):
        o = ctx.read("silver_orders")
        daily = o.groupBy("order_date").agg(
            F.sum(_dec("o_totalprice")).alias("_rev"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        w = Window.orderBy("order_date").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            daily.withColumn("revenue", F.col("_rev").cast("double"))
            .withColumn("cum_revenue", F.sum("_rev").over(w).cast("double"))
            .drop("_rev")
        )

    @p.table(name="gold_rfm_segments", comment="RFM quintile segments")
    def gold_rfm_segments(ctx):
        o = ctx.read("silver_orders")
        ref = F.lit(cfg.churn_ref_date).cast("date")
        per_cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
            F.datediff(ref, F.max("order_date")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(_dec("o_totalprice")).cast("double").alias("monetary"),
        )
        scored = (
            per_cust.withColumn(
                "r_score",
                F.lit(6)
                - F.ntile(5).over(
                    Window.orderBy(
                        F.col("recency_days").asc(), F.col("customer_id").asc()
                    )
                ),
            )
            .withColumn(
                "f_score",
                F.ntile(5).over(
                    Window.orderBy(
                        F.col("frequency").asc(), F.col("customer_id").asc()
                    )
                ),
            )
            .withColumn(
                "m_score",
                F.ntile(5).over(
                    Window.orderBy(
                        F.col("monetary").asc(), F.col("customer_id").asc()
                    )
                ),
            )
        )
        total = F.col("r_score") + F.col("f_score") + F.col("m_score")
        return scored.withColumn(
            "segment",
            F.when(total >= 13, "champion")
            .when(total >= 10, "loyal")
            .when(total >= 7, "potential")
            .when(total >= 5, "at_risk")
            .otherwise("hibernating"),
        )

    return p


def run_customer360(
    spark: SparkSession, sf_dir: str, root: str
) -> PipelineResult:
    cfg = Customer360Config(root=root, sf_dir=sf_dir)
    return build_customer360(cfg).run(spark)
