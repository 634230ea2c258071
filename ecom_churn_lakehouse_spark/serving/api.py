"""Framework-free serving API layer: auth, request context, error
envelope — reference ``services/api/app`` parity without FastAPI.

The reference API wraps prediction in three cross-cutting concerns:

- constant-time API-key auth
  (``services/api/app/auth/api_key.py:17-27``),
- a request-id context propagated through structured log events and
  metrics counters
  (``services/api/app/observability/logging.py:57-111``),
- a typed error envelope — every non-2xx body carries ``detail``,
  ``request_id`` and an ``errors`` list
  (``services/api/tests/test_predict_validation.py``: the 422 body is
  ``{"detail": "Invalid request payload.", "request_id": ..,
  "errors": [..]}``).

fastapi is not installed in this container, so this module implements
the same semantics as plain Python: :class:`ChurnApi` takes a request
dict + headers and returns ``(status_code, body)`` — directly testable
in-process, and trivially mountable behind any HTTP framework later
(the handler body IS the framework-independent part of the reference
router ``services/api/app/routers/predict.py:64-130``).
"""

from __future__ import annotations

import contextvars
import hashlib
import json
import logging
import os
import secrets
import time
import uuid
from collections import Counter
from dataclasses import dataclass
from threading import Lock
from typing import Any

from ecom_churn_lakehouse_spark.serving.feature_store import (
    PredictionService,
    VersionMismatch,
)

__all__ = [
    "API_KEY_HEADER",
    "REQUEST_ID_HEADER",
    "ApiError",
    "ChurnApi",
    "get_request_id",
    "hash_identifier",
    "increment_counter",
    "log_event",
    "require_api_key",
    "snapshot_counters",
]

API_KEY_HEADER = "X-API-Key"
REQUEST_ID_HEADER = "X-Request-ID"

_request_id_ctx: contextvars.ContextVar[str] = contextvars.ContextVar(
    "request_id", default=""
)

_metrics: Counter = Counter()
_metrics_lock = Lock()


def get_request_id() -> str:
    return _request_id_ctx.get() or ""


def hash_identifier(value: str) -> str:
    """Log-safe identifier: sha256 prefix, never the raw customer id
    (reference ``observability/logging.py:33-34``)."""
    return hashlib.sha256(str(value).encode("utf-8")).hexdigest()[:12]


def increment_counter(name: str, value: float = 1.0) -> None:
    with _metrics_lock:
        _metrics[name] += value


def snapshot_counters() -> dict[str, float]:
    with _metrics_lock:
        return dict(_metrics)


def log_event(logger: logging.Logger, level: int, event: str, **fields: Any) -> None:
    """One-line JSON log record carrying the ambient request id."""
    payload = {
        "event": event,
        "request_id": get_request_id() or fields.pop("request_id", None),
        **fields,
    }
    logger.log(level, json.dumps(payload, default=str, sort_keys=True))


class ApiError(Exception):
    """Error with an HTTP-style status; rendered as the envelope
    ``{"detail", "request_id", "errors"}``."""

    def __init__(self, status_code: int, detail: str, errors: list | None = None):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail
        self.errors = errors or []

    def envelope(self) -> dict[str, Any]:
        return {
            "detail": self.detail,
            "request_id": get_request_id(),
            "errors": self.errors,
        }


def get_expected_api_key() -> str:
    return os.getenv("API_KEY", "dev-api-key")


def require_api_key(provided: str | None, expected: str | None = None) -> str:
    """Constant-time API-key check (``auth/api_key.py:17-27``):
    ``secrets.compare_digest`` so the comparison cost does not leak a
    prefix-match length; missing and wrong keys are indistinguishable
    in both timing and response."""
    want = expected if expected is not None else get_expected_api_key()
    if provided is None or not secrets.compare_digest(provided, want):
        raise ApiError(401, "Invalid or missing API key.")
    return provided


@dataclass
class ChurnApi:
    """In-process equivalent of the reference predict router.

    ``predict(payload, headers)`` returns ``(status_code, body)``:
    200 with the prediction response, or 401/404/422/503 with the
    error envelope — the exact status mapping of
    ``routers/predict.py``: 401 bad key, 422 invalid payload, 404
    unknown customer, 503 feature-version mismatch / store not ready.
    """

    service: PredictionService
    api_key: str | None = None  # None → $API_KEY / "dev-api-key"

    def predict(
        self, payload: Any, headers: dict[str, str] | None = None
    ) -> tuple[int, dict[str, Any]]:
        headers = headers or {}
        request_id = headers.get(REQUEST_ID_HEADER) or str(uuid.uuid4())
        token = _request_id_ctx.set(request_id)
        logger = logging.getLogger("api.predict")
        start = time.perf_counter()
        increment_counter("http_requests_total")
        try:
            status, body = self._handle(payload, headers, logger)
        except ApiError as e:
            # status counter incremented once, post-try, for all outcomes
            status, body = e.status_code, e.envelope()
        except Exception:
            increment_counter("http_exceptions_total")
            raise
        finally:
            duration_ms = round((time.perf_counter() - start) * 1000, 2)
            increment_counter("http_request_latency_ms_sum", duration_ms)
            increment_counter("http_request_latency_count")
            _request_id_ctx.reset(token)
        body.setdefault("request_id", request_id)
        increment_counter(f"http_status_{status}_total")
        return status, body

    # -- handler body (the framework-independent router logic) --

    def _handle(
        self, payload: Any, headers: dict[str, str], logger: logging.Logger
    ) -> tuple[int, dict[str, Any]]:
        require_api_key(headers.get(API_KEY_HEADER), self.api_key)

        errors = self._validate(payload)
        if errors:
            increment_counter("prediction_validation_failure_total")
            raise ApiError(422, "Invalid request payload.", errors)
        customer_id = payload["customer_id"]

        try:
            out = self.service.predict(customer_id)
        except VersionMismatch as e:
            increment_counter("prediction_feature_version_mismatch_total")
            raise ApiError(
                503,
                "Serving feature version does not match approved model "
                f"feature version. {e}",
            ) from e
        if out is None:
            increment_counter("prediction_feature_miss_total")
            raise ApiError(404, "No serving features found for customer_id.")

        increment_counter("predictions_total")
        increment_counter(
            f"predictions_label_{out['churn_prediction']}_total"
        )
        log_event(
            logger,
            logging.INFO,
            "prediction_scored",
            customer_id_hash=hash_identifier(customer_id),
            feature_version=out.get("feature_version"),
            as_of_date=out.get("as_of_date"),
            churn_probability=out.get("churn_probability"),
            churn_label=out.get("churn_prediction"),
        )
        return 200, dict(out)

    @staticmethod
    def _validate(payload: Any) -> list[dict[str, str]]:
        if not isinstance(payload, dict):
            return [{"loc": "body", "msg": "payload must be an object"}]
        cid = payload.get("customer_id")
        if cid is None:
            return [{"loc": "customer_id", "msg": "field required"}]
        if isinstance(cid, str) and not cid.strip():
            return [{"loc": "customer_id", "msg": "must not be blank"}]
        return []
