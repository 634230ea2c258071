"""Serving API parity: auth, request context, error envelope
(reference ``services/api/app`` semantics, in-process — no fastapi).

Covers the reference's status mapping (``routers/predict.py``):
401 bad/missing key, 422 invalid payload (envelope per
``tests/test_predict_validation.py``), 404 unknown customer,
503 feature-version mismatch, 200 happy path with request-id echo.
"""

import pytest
from pyspark.sql import functions as F

from ecom_churn_lakehouse_spark.plans.churn import training_snapshot
from ecom_churn_lakehouse_spark.serving import (
    ChurnApi,
    LatestFeaturesClient,
    PredictionService,
)
from ecom_churn_lakehouse_spark.serving.api import (
    API_KEY_HEADER,
    REQUEST_ID_HEADER,
    ApiError,
    hash_identifier,
    require_api_key,
    snapshot_counters,
)
from ecom_churn_lakehouse_spark.sources import normalized_orders
from ecom_churn_lakehouse_spark.training import train_churn_model

AS_OF = "1997-06-30"
SF = "/root/testdata/sf0.001"
KEY = "test-api-key"


@pytest.fixture(scope="module")
def snapshot(spark):
    return training_snapshot(normalized_orders(spark, SF), AS_OF)


def _api(snapshot, tmp_path, feature_version="fv1", expected="fv1"):
    model = train_churn_model(snapshot)
    export = str(tmp_path / "latest")
    snapshot.withColumn("_feature_version", F.lit(feature_version)).withColumn(
        "as_of_date", F.to_date(F.lit(AS_OF))
    ).write.mode("overwrite").parquet(export)
    client = LatestFeaturesClient(export)
    svc = PredictionService(client, model, expected_feature_version=expected)
    return ChurnApi(svc, api_key=KEY), client


def test_auth_constant_time_compare():
    require_api_key("secret", "secret")
    for bad in (None, "", "wrong", "secre", "secret2"):
        with pytest.raises(ApiError) as ei:
            require_api_key(bad, "secret")
        assert ei.value.status_code == 401
        assert ei.value.detail == "Invalid or missing API key."


def test_401_envelope(spark, snapshot, tmp_path):
    api, client = _api(snapshot, tmp_path)
    some_id = next(iter(client._by_key))
    status, body = api.predict({"customer_id": some_id}, {API_KEY_HEADER: "nope"})
    assert status == 401
    assert body["detail"] == "Invalid or missing API key."
    assert body["request_id"]
    assert body["errors"] == []


def test_422_validation_envelope(spark, snapshot, tmp_path):
    api, _ = _api(snapshot, tmp_path)
    # blank customer_id — the reference's canonical validation case
    status, body = api.predict({"customer_id": "   "}, {API_KEY_HEADER: KEY})
    assert status == 422
    assert body["detail"] == "Invalid request payload."
    assert body["request_id"]
    assert isinstance(body["errors"], list) and body["errors"]
    # missing field
    status, body = api.predict({}, {API_KEY_HEADER: KEY})
    assert status == 422 and body["errors"][0]["loc"] == "customer_id"


def test_404_unknown_customer(spark, snapshot, tmp_path):
    api, _ = _api(snapshot, tmp_path)
    status, body = api.predict({"customer_id": -999999}, {API_KEY_HEADER: KEY})
    assert status == 404
    assert body["detail"] == "No serving features found for customer_id."
    assert body["request_id"]


def test_503_version_mismatch(spark, snapshot, tmp_path):
    api, client = _api(snapshot, tmp_path, feature_version="fv-OLD", expected="fv-NEW")
    some_id = next(iter(client._by_key))
    status, body = api.predict({"customer_id": some_id}, {API_KEY_HEADER: KEY})
    assert status == 503
    assert "feature version" in body["detail"]
    assert body["request_id"]


def test_200_happy_path_echoes_request_id_and_counts(spark, snapshot, tmp_path):
    api, client = _api(snapshot, tmp_path)
    some_id = next(iter(client._by_key))
    before = snapshot_counters().get("predictions_total", 0)
    status, body = api.predict(
        {"customer_id": some_id},
        {API_KEY_HEADER: KEY, REQUEST_ID_HEADER: "req-abc-123"},
    )
    assert status == 200
    assert body["request_id"] == "req-abc-123"
    assert 0.0 <= body["churn_probability"] <= 1.0
    assert body["churn_prediction"] in (0, 1)
    assert body["feature_version"] == "fv1"
    after = snapshot_counters()
    assert after.get("predictions_total", 0) == before + 1
    assert after.get("http_status_200_total", 0) >= 1


def test_hash_identifier_is_stable_and_short():
    assert hash_identifier("cust-1") == hash_identifier("cust-1")
    assert hash_identifier("cust-1") != hash_identifier("cust-2")
    assert len(hash_identifier("cust-1")) == 12


def test_model_store_approval_gate(spark, snapshot, tmp_path):
    """ModelStore loads the lineage layout and refuses an unapproved
    model (reference model_loader.py:55-64 semantics), then wires the
    approved model into the full API."""
    import json

    from ecom_churn_lakehouse_spark.serving import (
        ApprovalMismatch,
        ModelStore,
    )
    from ecom_churn_lakehouse_spark.training import (
        log_training_run,
        train_churn_model,
    )

    model = train_churn_model(snapshot)
    run = log_training_run(
        model, str(tmp_path), feature_version="fv1", label_version="lv1",
        data_snapshot_id="snap-1",
    )
    store = ModelStore(str(tmp_path))
    assert store.is_ready()
    assert store.model_version() == run.model_version
    assert store.feature_version() == "fv1"

    # wire into the serving API end-to-end
    export = str(tmp_path / "latest")
    snapshot.withColumn("_feature_version", F.lit("fv1")).withColumn(
        "as_of_date", F.to_date(F.lit(AS_OF))
    ).write.mode("overwrite").parquet(export)
    client = LatestFeaturesClient(export)
    api = ChurnApi(store.build_service(client), api_key=KEY)
    some_id = next(iter(client._by_key))
    status, body = api.predict({"customer_id": some_id}, {API_KEY_HEADER: KEY})
    assert status == 200 and body["feature_version"] == "fv1"

    # un-approve: gate must refuse the load
    approved = json.loads(run.approved_path.read_text())
    approved["approved_model_version"] = "somebody-else"
    run.approved_path.write_text(json.dumps(approved))
    store2 = ModelStore(str(tmp_path))
    assert not store2.is_ready()
    with pytest.raises(ApprovalMismatch):
        store2.model()
