"""Business scoring expressions (U1, P4/P10 in SURVEY §2; reference
SQL UDFs ``feature_store.py:128-162`` and the health-score CASE in
``src/gold/customer_360_view.py:222-234``). Pure Catalyst columns."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def age_bucket(age: Column) -> Column:
    """SQL UDF ``age_bucket`` (``feature_store.py:128-145``)."""
    return (
        F.when(age < 25, "18-24")
        .when(age < 35, "25-34")
        .when(age < 50, "35-49")
        .when(age < 65, "50-64")
        .otherwise("65+")
    )


def engagement_score(
    sessions_30d: Column, purchases_90d: Column, tickets_open: Column
) -> Column:
    """LEAST/GREATEST bounded arithmetic score
    (``feature_store.py:147-162``)."""
    raw = sessions_30d * 2 + purchases_90d * 10 - tickets_open * 5
    return F.greatest(F.least(raw, F.lit(100)), F.lit(0))


def health_score(
    recency_days: Column, order_count: Column, support_tickets: Column
) -> Column:
    """Customer-health CASE ladder (``customer_360_view.py:222-234``)."""
    return (
        F.when((recency_days <= 30) & (order_count >= 5), "excellent")
        .when(recency_days <= 90, "good")
        .when(recency_days <= 180, "at_risk")
        .otherwise("churned")
    )
