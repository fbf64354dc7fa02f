from .expectations import (
    Action,
    ExpectationResult,
    QualityEngine,
    QualityRule,
    customer_rules,
    transaction_rules,
)
from .monitors import AlertDefinition, evaluate_alerts, freshness, volume_anomaly

__all__ = [
    "Action",
    "ExpectationResult",
    "QualityEngine",
    "QualityRule",
    "customer_rules",
    "transaction_rules",
    "AlertDefinition",
    "evaluate_alerts",
    "freshness",
    "volume_anomaly",
]
