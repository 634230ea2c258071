from .churn import churn_labels, customer_features, training_snapshot

__all__ = ["customer_features", "churn_labels", "training_snapshot"]
