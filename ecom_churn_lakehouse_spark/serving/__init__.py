from .api import ChurnApi, require_api_key
from .feature_store import (
    ApprovalMismatch,
    LatestFeaturesClient,
    ModelStore,
    PredictionService,
)

__all__ = [
    "ApprovalMismatch",
    "ChurnApi",
    "LatestFeaturesClient",
    "ModelStore",
    "PredictionService",
    "require_api_key",
]
