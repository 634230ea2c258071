from .feature_store import LatestFeaturesClient, PredictionService

__all__ = ["LatestFeaturesClient", "PredictionService"]
