"""ML layer: churn features, leakage-safe as-of feature lookup, GBT
training pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.ml import (
    as_of_features,
    churn_features,
    train_churn_model,
)

from conftest import SF_SMALL


def test_churn_features_shape(spark):
    feats = churn_features(spark, SF_SMALL)
    rows = feats.collect()
    assert len(rows) > 0
    r = rows[0]
    assert r["avg_order_value"] > 0
    assert r["orders_per_month"] >= 0
    labels = {r["is_churned"] for r in rows}
    assert labels <= {0, 1}
    # guard works for single-order customers (tenure 0)
    single = feats.filter("order_count = 1").collect()
    for s in single:
        assert s["orders_per_month"] == 30.0  # 1 order / max(0,1) day * 30


def test_as_of_features_no_leakage(spark):
    features = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-02-01 00:00:00", 20.0),
            (1, "2024-03-01 00:00:00", 30.0),
            (2, "2024-01-15 00:00:00", 5.0),
        ],
        "customer_id long, fts string, score double",
    ).select("customer_id", F.col("fts").cast("timestamp").alias("feature_ts"), "score")
    labels = spark.createDataFrame(
        [
            (1, "2024-02-15 00:00:00", 1),
            (2, "2024-01-01 00:00:00", 0),  # before any feature row
        ],
        "customer_id long, lts string, label int",
    ).select("customer_id", F.col("lts").cast("timestamp").alias("label_ts"), "label")

    out = as_of_features(features, labels, "customer_id", "feature_ts", "label_ts")
    got = {r["customer_id"]: r["score"] for r in out.collect()}
    # customer 1: Feb 1 feature (not the future Mar 1); customer 2: none
    assert got == {1: 20.0, 2: None}
    assert out.count() == 2  # every label row survives


def test_train_churn_model(spark):
    feats = churn_features(spark, SF_SMALL)
    res = train_churn_model(feats, max_iter=5)
    assert 0.0 <= res["auc"] <= 1.0
    assert res["n_train"] > 0 and res["n_test"] > 0
    preds = res["model"].transform(
        __import__(
            "pyspark.ml.feature", fromlist=["VectorAssembler"]
        ).VectorAssembler(
            inputCols=res["feature_cols"], outputCol="features",
            handleInvalid="skip",
        ).transform(feats)
    )
    assert {r["prediction"] for r in preds.select("prediction").distinct().collect()} <= {0.0, 1.0}
