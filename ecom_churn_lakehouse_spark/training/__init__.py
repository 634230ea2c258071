from .lineage import TrainingRun, load_model_meta, log_training_run
from .train import (
    FEATURE_COLS,
    TrainedModel,
    train_churn_model,
    train_churn_model_distributed,
)

__all__ = [
    "FEATURE_COLS",
    "TrainedModel",
    "TrainingRun",
    "load_model_meta",
    "log_training_run",
    "train_churn_model",
    "train_churn_model_distributed",
]
