"""Serving path: latest-features lookup + prediction (no Spark at
request time — reference ``services/api/app`` architecture).

The reference serves from a pandas dict-of-records loaded from the
latest-features parquet export
(``feature_client/local_latest_features.py:29-92``), with a
feature-version compatibility gate before predicting
(``routers/predict.py:97-106``). Same design here:

- :class:`LatestFeaturesClient` — loads the export once, O(1) lookups.
- :class:`PredictionService` — version gate + model scoring; returns
  the versioned response envelope.

HTTP is optional: ``build_fastapi_app`` constructs the API app when
fastapi is importable (it is not in this container), so the serving
logic stays testable in-process either way.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow.parquet as pq

from ecom_churn_lakehouse_spark.training.train import TrainedModel

__all__ = [
    "ApprovalMismatch",
    "LatestFeaturesClient",
    "ModelStore",
    "PredictionService",
    "build_fastapi_app",
]


class LatestFeaturesClient:
    """Dict-of-records feature lookup over the parquet export."""

    def __init__(self, export_path: str, key_col: str = "customer_id"):
        table = pq.read_table(export_path)
        self._cols = table.column_names
        records = table.to_pylist()
        self._by_key: dict[Any, dict[str, Any]] = {r[key_col]: r for r in records}

    def get(self, customer_id: Any) -> dict[str, Any] | None:
        return self._by_key.get(customer_id)

    def __len__(self) -> int:
        return len(self._by_key)


class VersionMismatch(RuntimeError):
    """Feature version of the export differs from the model's."""


@dataclass
class PredictionService:
    client: LatestFeaturesClient
    model: TrainedModel
    expected_feature_version: str | None = None

    def predict(self, customer_id: Any) -> dict[str, Any] | None:
        feats = self.client.get(customer_id)
        if feats is None:
            return None
        if self.expected_feature_version is not None:
            actual = feats.get("_feature_version")
            if actual != self.expected_feature_version:
                raise VersionMismatch(
                    f"export feature version {actual!r} != model's "
                    f"{self.expected_feature_version!r}"
                )
        proba = self.model.predict_proba(feats)
        return {
            "customer_id": customer_id,
            "churn_probability": round(proba, 6),
            "churn_prediction": int(proba >= 0.5),
            "feature_version": feats.get("_feature_version"),
            "as_of_date": str(feats.get("as_of_date")),
        }


def build_fastapi_app(service: PredictionService):
    """Optional HTTP surface (reference FastAPI parity); requires
    fastapi, absent in this container."""
    try:
        from fastapi import FastAPI, HTTPException  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "fastapi is not installed in this environment; use "
            "PredictionService directly"
        ) from e

    app = FastAPI()  # pragma: no cover

    @app.get("/predict/{customer_id}")  # pragma: no cover
    def predict(customer_id: int):
        out = service.predict(customer_id)
        if out is None:
            raise HTTPException(status_code=404, detail="unknown customer")
        return out

    return app  # pragma: no cover


class ApprovalMismatch(RuntimeError):
    """Loaded model version is not the approved one."""


class ModelStore:
    """Model + metadata + approval gate — reference
    ``services/api/app/inference/model_loader.py:11-88`` parity over
    the lineage layout ``training/lineage.py`` writes.

    Loads lazily; refuses to serve a model whose content-hashed
    ``model_version`` differs from ``approved_model_version.json``
    (the promotion gate: training writes candidates, a separate
    approval step pins the one serving may load).
    """

    def __init__(self, lineage_root: str):
        import os

        self.root = lineage_root
        self._meta_path = os.path.join(lineage_root, "model_meta.json")
        self._approved_path = os.path.join(
            lineage_root, "approved_model_version.json"
        )
        self._model: TrainedModel | None = None
        self._meta: dict[str, Any] | None = None

    def _load_if_needed(self) -> None:
        import json

        if self._model is not None:
            return
        with open(self._meta_path) as f:
            meta = json.load(f)
        required = {
            "model_name",
            "model_version",
            "feature_columns",
            "feature_version",
            "model_artifact",
        }
        missing = required - set(meta)
        if missing:
            raise RuntimeError(
                f"model meta missing required keys: {sorted(missing)}"
            )
        try:
            with open(self._approved_path) as f:
                approved = json.load(f).get("approved_model_version")
        except FileNotFoundError:
            approved = None
        if approved and approved != meta["model_version"]:
            raise ApprovalMismatch(
                "Loaded model_version does not match approved_model_version. "
                f"loaded={meta['model_version']}, approved={approved}"
            )
        self._model = TrainedModel.load(meta["model_artifact"])
        self._meta = meta

    def is_ready(self) -> bool:
        try:
            self._load_if_needed()
            return True
        except Exception:
            return False

    def model(self) -> TrainedModel:
        self._load_if_needed()
        assert self._model is not None
        return self._model

    def model_version(self) -> str:
        self._load_if_needed()
        assert self._meta is not None
        return str(self._meta["model_version"])

    def feature_version(self) -> str | None:
        self._load_if_needed()
        assert self._meta is not None
        return self._meta.get("feature_version")

    def build_service(self, client: LatestFeaturesClient) -> PredictionService:
        """Wire the approved model to a feature client, gating predict
        on the model's feature version (routers/predict.py:97-106)."""
        return PredictionService(
            client, self.model(), expected_feature_version=self.feature_version()
        )
