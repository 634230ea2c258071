from .train import TrainedModel, train_churn_model

__all__ = ["train_churn_model", "TrainedModel"]
