"""ML operations layer (U5/J9 in SURVEY §2.10/§2.4; reference
``src/gold/churn_features.py``, ``src/ml_operations/feature_store.py``,
``mlflow_experiment_tracking.py:57-130``):

* churn feature engineering with guarded ratios (P10),
* leakage-safe point-in-time feature lookup (the FeatureLookup
  ``timestamp_lookup_key`` semantic),
* a pyspark.ml GBT churn pipeline (VectorAssembler -> GBTClassifier ->
  BinaryClassificationEvaluator). MLflow tracking is a platform
  service, not query semantics — metrics are returned to the caller.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.catalog import _dec, load

CHURN_REF_DATE = "2001-09-01"
CHURN_DAYS = 180


def churn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer churn features (reference
    ``churn_features.py:45-89``): recency/frequency/monetary, order
    cadence, and a churn label = no order in the last CHURN_DAYS.

    Ratios carry ``greatest(..., 1)`` guards exactly like the
    reference — ANSI mode (Spark 4 default) turns div-by-zero into an
    error, so the guards are load-bearing here.
    """
    o = load(spark, sf_dir, "orders")
    ref = F.lit(CHURN_REF_DATE).cast("date")
    per_cust = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count(F.lit(1)).alias("order_count"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
    )
    tenure = F.datediff(F.col("last_order"), F.col("first_order"))
    recency = F.datediff(ref, F.col("last_order"))
    return per_cust.select(
        "customer_id",
        "order_count",
        "total_spent",
        recency.alias("recency_days"),
        tenure.alias("tenure_days"),
        (
            F.col("total_spent") / F.col("order_count").cast("double")
        ).alias("avg_order_value"),
        (
            F.col("order_count").cast("double")
            / F.greatest(tenure, F.lit(1)).cast("double")
            * 30.0
        ).alias("orders_per_month"),
        (recency > CHURN_DAYS).cast("int").alias("is_churned"),
    )


def as_of_features(
    features: DataFrame,
    labels: DataFrame,
    key: str,
    feature_ts: str,
    label_ts: str,
) -> DataFrame:
    """Point-in-time join (J9): for each label row, the newest feature
    row with ``feature_ts <= label_ts`` — never a future feature
    (leakage-safe, the FeatureStore ``timestamp_lookup_key`` contract,
    ``feature_store.py:186-201``).

    Window form: range join on the key + per-label row_number. The
    join shuffles once on the entity key; per-entity history depth
    bounds the multiply. (Same plan shape as queries.relational
    q23_asof_join, which carries the DuckDB oracle for this operator.)
    """
    f = features.select(
        F.col(key).alias("__k"), F.col(feature_ts).alias("__fts"),
        *[c for c in features.columns if c not in (key, feature_ts)],
    )
    # the as-of predicate lives in the JOIN condition so a label row
    # with only future features still survives (as a null-feature row)
    j = labels.join(
        f,
        (labels[key] == f["__k"]) & (f["__fts"] <= labels[label_ts]),
        "left",
    )
    w = Window.partitionBy(*labels.columns).orderBy(
        F.col("__fts").desc_nulls_last()
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fts", "__k")
    )


FEATURE_COLS = [
    "order_count",
    "total_spent",
    "recency_days",
    "tenure_days",
    "avg_order_value",
    "orders_per_month",
]


def train_churn_model(
    features: DataFrame, seed: int = 42, max_iter: int = 10
) -> dict[str, Any]:
    """GBT churn classifier (``mlflow_experiment_tracking.py:57-130``):
    assemble -> 80/20 split -> fit -> AUC. Returns model + metrics."""
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.evaluation import BinaryClassificationEvaluator
    from pyspark.ml.feature import VectorAssembler

    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features", handleInvalid="skip"
    )
    data = assembler.transform(
        features.withColumn("label", F.col("is_churned").cast("double"))
    )
    train, test = data.randomSplit([0.8, 0.2], seed=seed)
    model = GBTClassifier(
        featuresCol="features", labelCol="label", maxIter=max_iter, seed=seed
    ).fit(train)
    preds = model.transform(test)
    auc = BinaryClassificationEvaluator(
        labelCol="label", metricName="areaUnderROC"
    ).evaluate(preds)
    return {
        "model": model,
        "auc": float(auc),
        "n_train": train.count(),
        "n_test": test.count(),
        "feature_cols": FEATURE_COLS,
    }
