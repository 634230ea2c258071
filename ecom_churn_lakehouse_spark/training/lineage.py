"""Training lineage: params/metrics/model artifacts in an
MLflow-compatible layout, with no mlflow dependency.

The reference logs every training run to MLflow — params, metrics,
tags, the model artifact, and sidecar JSONs
(``src/training/train_stub.py:108-122`` CLI contract; ``:233-310``
writes ``approved_model_version.json`` and ``model_meta.json`` keyed
by a content-hashed ``model_version``). mlflow is not installed here,
so this module writes the SAME information as plain files in the
MLflow *file-store* directory convention::

    <root>/mlruns/<experiment_id>/<run_id>/
        meta.yaml                 # run metadata (mlflow file-store format)
        params/<name>             # one file per param, raw string value
        metrics/<name>            # lines of "<ts_ms> <value> <step>"
        tags/mlflow.runName
        artifacts/model.json      # the TrainedModel artifact
    <root>/model_meta.json            # reference model-meta payload
    <root>/approved_model_version.json

An actual MLflow client pointed at ``file:<root>/mlruns`` can read the
run; the serving layer reads ``model_meta.json`` exactly like the
reference's model store (``services/api/app/inference/model_loader.py``).
"""

from __future__ import annotations

import hashlib
import json
import time
import uuid
from pathlib import Path
from typing import Any

from ecom_churn_lakehouse_spark.training.train import TrainedModel

__all__ = ["TrainingRun", "log_training_run", "load_model_meta"]

_ALGORITHM = "logistic_regression_gd"


def _canonical_json(obj: Any) -> bytes:
    return json.dumps(obj, sort_keys=True, separators=(",", ":")).encode("utf-8")


def _hash_obj(obj: Any) -> str:
    """16-hex content hash (reference ``train_stub.py:40-41``)."""
    return hashlib.sha256(_canonical_json(obj)).hexdigest()[:16]


def _write_json(path: Path, payload: dict[str, Any]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(payload, indent=2, sort_keys=True), encoding="utf-8")


class TrainingRun:
    """Paths + identifiers of one logged training run."""

    def __init__(self, root: str, run_id: str, model_version: str):
        self.root = Path(root)
        self.run_id = run_id
        self.model_version = model_version
        self.run_dir = self.root / "mlruns" / "0" / run_id
        self.model_meta_path = self.root / "model_meta.json"
        self.approved_path = self.root / "approved_model_version.json"
        self.model_artifact_path = self.run_dir / "artifacts" / "model.json"


def log_training_run(
    model: TrainedModel,
    root: str,
    model_name: str = "ecomm-churn",
    data_snapshot_id: str | None = None,
    feature_version: str | None = None,
    label_version: str | None = None,
    run_id: str | None = None,
    extra_metrics: dict[str, float] | None = None,
) -> TrainingRun:
    """Write the full lineage record for a trained model.

    ``model_version`` is a content hash over the identifying inputs —
    the reference's convention (``train_stub.py:242-253``): same data +
    features + hyperparameters → same version, so re-runs are
    idempotent and an approval file naming a version pins an exact
    model. ``run_id`` defaults to a fresh 32-hex id (mlflow format).
    """
    run_id = run_id or uuid.uuid4().hex
    model_version = _hash_obj(
        {
            "model_name": model_name,
            "algorithm": _ALGORITHM,
            "data_snapshot_id": data_snapshot_id,
            "feature_version": feature_version,
            "label_version": label_version,
            "feature_columns": model.feature_cols,
            "n_rows": model.n_rows,
            "version": 1,
        }
    )
    run = TrainingRun(root, run_id, model_version)
    now_ms = int(time.time() * 1000)

    # -- MLflow file-store layout --------------------------------------
    run.run_dir.mkdir(parents=True, exist_ok=True)
    (run.run_dir / "meta.yaml").write_text(
        "\n".join(
            [
                f"artifact_uri: {run.run_dir / 'artifacts'}",
                "end_time: null",
                "entry_point_name: ''",
                "experiment_id: '0'",
                "lifecycle_stage: active",
                f"run_id: {run_id}",
                f"run_name: {model_name}-{model_version}",
                f"run_uuid: {run_id}",
                "source_name: ''",
                "source_type: 4",
                "source_version: ''",
                f"start_time: {now_ms}",
                "status: 3",
                "tags: []",
                "user_id: ''",
            ]
        )
        + "\n",
        encoding="utf-8",
    )
    params = {
        "model_name": model_name,
        "algorithm": _ALGORITHM,
        "feature_columns": ",".join(model.feature_cols),
        "feature_version": str(feature_version),
        "label_version": str(label_version),
        "data_snapshot_id": str(data_snapshot_id),
        "n_features": str(len(model.feature_cols)),
    }
    pdir = run.run_dir / "params"
    pdir.mkdir(exist_ok=True)
    for k, v in params.items():
        (pdir / k).write_text(str(v), encoding="utf-8")
    metrics: dict[str, float] = {
        "train_accuracy": model.train_accuracy,
        "train_row_count": float(model.n_rows),
        **(extra_metrics or {}),
    }
    mdir = run.run_dir / "metrics"
    mdir.mkdir(exist_ok=True)
    for k, v in metrics.items():
        (mdir / k).write_text(f"{now_ms} {v} 0\n", encoding="utf-8")
    tdir = run.run_dir / "tags"
    tdir.mkdir(exist_ok=True)
    (tdir / "mlflow.runName").write_text(
        f"{model_name}-{model_version}", encoding="utf-8"
    )
    run.model_artifact_path.parent.mkdir(exist_ok=True)
    model.save(str(run.model_artifact_path))

    # -- reference sidecar payloads ------------------------------------
    _write_json(
        run.approved_path,
        {
            "approved_model_version": model_version,
            "model_name": model_name,
            "data_snapshot_id": data_snapshot_id,
            "feature_version": feature_version,
            "label_version": label_version,
            "mlflow_run_id": run_id,
        },
    )
    _write_json(
        run.model_meta_path,
        {
            "model_name": model_name,
            "model_version": model_version,
            "approved_model_version": model_version,
            "algorithm": _ALGORITHM,
            "feature_columns": model.feature_cols,
            "feature_version": feature_version,
            "label_version": label_version,
            "data_snapshot_id": data_snapshot_id,
            "train_row_count": model.n_rows,
            "coefficients": model.coef,
            "intercept": model.intercept,
            "standardization": {"mean": model.mean, "std": model.std},
            "mlflow_run_id": run_id,
            "model_artifact": str(run.model_artifact_path),
            "metrics": metrics,
        },
    )
    return run


def load_model_meta(root: str) -> dict[str, Any]:
    with open(Path(root) / "model_meta.json") as f:
        return json.load(f)
