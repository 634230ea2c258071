from .train import (
    FEATURE_COLS,
    TrainedModel,
    train_churn_model,
    train_churn_model_distributed,
)

__all__ = [
    "FEATURE_COLS",
    "train_churn_model",
    "train_churn_model_distributed",
    "TrainedModel",
]
