from .churn import as_of_features, churn_features, train_churn_model

__all__ = ["as_of_features", "churn_features", "train_churn_model"]
