from .medallion import (
    bronze_ingest,
    gold_features,
    label_snapshot,
    latest_features_export,
    silver_publish,
    training_snapshot_publish,
)

__all__ = [
    "bronze_ingest",
    "silver_publish",
    "gold_features",
    "label_snapshot",
    "training_snapshot_publish",
    "latest_features_export",
]
