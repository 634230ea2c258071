from .api import ChurnApi, require_api_key
from .feature_store import LatestFeaturesClient, PredictionService

__all__ = [
    "ChurnApi",
    "LatestFeaturesClient",
    "PredictionService",
    "require_api_key",
]
