"""Serving API + model-registry governance tests (reference parity:
api tests test_api.py / test_auth_required.py / test_readonly_middleware.py
and registry governance registry.py:217-308)."""

from __future__ import annotations

import os

import pytest

from clinical_data_platform_spark.clinical.registry import ModelRegistry
from clinical_data_platform_spark.serving.app import closed_form_score, create_app

TOKEN = "test-token-123"


@pytest.fixture()
def client(monkeypatch, tmp_path, spark, silver):
    from clinical_data_platform_spark.clinical import marts as M

    mart_path = str(tmp_path / "outcomes.parquet")
    M.build_marts(silver)["fact_subject_outcomes"].toPandas().to_parquet(mart_path)
    monkeypatch.setenv("CLINICAL_API_TOKEN", TOKEN)
    monkeypatch.delenv("READ_ONLY_MODE", raising=False)
    app = create_app(mart_path)
    app.testing = True
    return app.test_client()


def _auth():
    return {"Authorization": f"Bearer {TOKEN}"}


def test_health_open(client):
    r = client.get("/health")
    assert r.status_code == 200 and r.get_json()["status"] == "ok"


def test_score_requires_auth(client):
    assert client.post("/score", json={"age": 50, "ae_count": 1, "severe_ae_count": 0}).status_code == 401


def test_score_bounds_and_validation(client):
    ok = client.post("/score", json={"age": 50, "ae_count": 2, "severe_ae_count": 1}, headers=_auth())
    assert ok.status_code == 200
    body = ok.get_json()
    assert 0.0 <= body["risk"] <= 1.0 and body["confidence"] in {"low", "medium", "high"}
    # cross-field: severe > total rejected (api/main.py:90-100)
    bad = client.post("/score", json={"age": 50, "ae_count": 1, "severe_ae_count": 3}, headers=_auth())
    assert bad.status_code == 422
    assert client.post("/score", json={"age": 200, "ae_count": 0, "severe_ae_count": 0}, headers=_auth()).status_code == 422


def test_score_matches_spark_closed_form(spark, silver, client):
    from clinical_data_platform_spark.clinical.features import subject_level_features
    from clinical_data_platform_spark.clinical.ml import closed_form_risk

    feats = subject_level_features(silver["DM"], silver["AE"]).na.fill({"AGE": 0})
    row = feats.orderBy("SUBJID").first()
    spark_risk = closed_form_risk(feats).filter(f"SUBJID = '{row['SUBJID']}'").first()["risk"]
    api = closed_form_score(row["AGE"] or 0, row["AE_COUNT"], row["SEVERE_AE_COUNT"])
    assert abs(api["risk"] - spark_risk) < 1e-9


def test_subject_lookup_and_regex(client):
    assert client.get("/subjects/SUBJ0001", headers=_auth()).status_code == 200
    assert client.get("/subjects/bad id!", headers=_auth()).status_code in (400, 404)
    assert client.get("/subjects/NOPE999", headers=_auth()).status_code == 404
    assert client.get("/studies", headers=_auth()).get_json()["studies"] == ["STUDY001"]


def test_read_only_middleware(client, monkeypatch):
    monkeypatch.setenv("READ_ONLY_MODE", "1")
    # score stays allowed; other mutations blocked
    assert client.post("/score", json={"age": 40, "ae_count": 0, "severe_ae_count": 0}, headers=_auth()).status_code == 200
    assert client.post("/studies", headers=_auth()).status_code == 403


def test_dashboard_endpoints(monkeypatch, tmp_path):
    """/dashboard/data serves the pipeline-precomputed chart payload;
    /dashboard renders it as HTML. Both require auth; 503 when absent."""
    import json as _json

    from clinical_data_platform_spark.serving.app import create_app

    monkeypatch.setenv("CLINICAL_API_TOKEN", TOKEN)
    monkeypatch.delenv("READ_ONLY_MODE", raising=False)
    payload = {
        "overview_metrics": [
            {"total_subjects": 3, "total_aes": 5, "serious_aes": 1, "avg_age": 40.0}
        ],
        "arm_distribution": [{"treatment_arm": "ARM A", "n": 3}],
    }
    p = tmp_path / "dashboard.json"
    p.write_text(_json.dumps(payload))
    app = create_app(None, dashboard_path=str(p))
    app.testing = True
    c = app.test_client()
    assert c.get("/dashboard/data").status_code == 401
    r = c.get("/dashboard/data", headers=_auth())
    assert r.status_code == 200 and r.get_json() == payload
    html = c.get("/dashboard", headers=_auth())
    assert html.status_code == 200
    body = html.get_data(as_text=True)
    assert "overview_metrics" in body and "<td>ARM A</td>" in body
    # no payload -> 503
    app2 = create_app(None)
    app2.testing = True
    assert app2.test_client().get("/dashboard/data", headers=_auth()).status_code == 503


def test_rate_limit_429(monkeypatch, tmp_path):
    """Write budget exhausts after write_calls_per_minute requests within
    the window -> 429 with Retry-After; reads have the larger budget
    (api/middleware.py:151-209)."""
    from clinical_data_platform_spark.serving.app import RateLimiter, create_app

    monkeypatch.setenv("CLINICAL_API_TOKEN", TOKEN)
    monkeypatch.delenv("READ_ONLY_MODE", raising=False)
    app = create_app(None, rate_limiter=RateLimiter(calls_per_minute=5, write_calls_per_minute=3))
    app.testing = True
    c = app.test_client()
    body = {"age": 50, "ae_count": 1, "severe_ae_count": 0}
    codes = [
        c.post("/score", json=body, headers=_auth()).status_code for _ in range(4)
    ]
    assert codes == [200, 200, 200, 429]
    r = c.post("/score", json=body, headers=_auth())
    assert r.status_code == 429 and r.headers["Retry-After"] == "60"
    # reads still within their own budget
    assert c.get("/health").status_code == 200
    # a different client ip has a fresh budget
    ok = c.post(
        "/score", json=body, headers={**_auth(), "X-Forwarded-For": "10.9.8.7"}
    )
    assert ok.status_code == 200


def test_rate_limit_window_slides():
    from clinical_data_platform_spark.serving.app import RateLimiter

    rl = RateLimiter(calls_per_minute=2, write_calls_per_minute=1)
    assert rl.is_limited("ip", False, now=1000.0) is False
    assert rl.is_limited("ip", False, now=1001.0) is False
    assert rl.is_limited("ip", False, now=1002.0) is True
    # 61 s later the window has slid past the first hits
    assert rl.is_limited("ip", False, now=1062.0) is False


def test_cors_preflight_and_headers(client, monkeypatch):
    # preflight from an allowed dev origin
    r = client.options("/score", headers={"Origin": "http://localhost:3000"})
    assert r.status_code == 204
    assert r.headers["Access-Control-Allow-Origin"] == "http://localhost:3000"
    assert "POST" in r.headers["Access-Control-Allow-Methods"]
    assert "Authorization" in r.headers["Access-Control-Allow-Headers"]
    # disallowed origin gets no CORS grant
    r = client.options("/score", headers={"Origin": "http://evil.example"})
    assert r.status_code == 204 and "Access-Control-Allow-Origin" not in r.headers
    # actual response carries the origin grant + security headers
    r = client.get("/health", headers={"Origin": "http://localhost:8501"})
    assert r.headers["Access-Control-Allow-Origin"] == "http://localhost:8501"
    assert r.headers["X-Content-Type-Options"] == "nosniff"
    # read-only mode drops write methods from the preflight grant
    monkeypatch.setenv("READ_ONLY_MODE", "1")
    r = client.options("/score", headers={"Origin": "http://localhost:3000"})
    assert "POST" not in r.headers["Access-Control-Allow-Methods"]
    # staging/prod default to an EMPTY allowlist
    monkeypatch.delenv("READ_ONLY_MODE", raising=False)
    monkeypatch.setenv("APP_ENV", "prod")
    r = client.get("/health", headers={"Origin": "http://localhost:3000"})
    assert "Access-Control-Allow-Origin" not in r.headers
    monkeypatch.setenv("CORS_ALLOWED_ORIGINS", "https://app.example.org")
    r = client.get("/health", headers={"Origin": "https://app.example.org"})
    assert r.headers["Access-Control-Allow-Origin"] == "https://app.example.org"


class _FakeRawVersion:
    """Shape of mlflow.entities.model_registry.ModelVersion as consumed by
    the adapter (name/version/current_stage/tags/source/creation_timestamp)."""

    def __init__(self, name, version, tags, source):
        self.name = name
        self.version = str(version)
        self.current_stage = "None"
        self.tags = dict(tags)
        self.source = source
        self.creation_timestamp = 1700000000000


class FakeMlflowClient:
    """Minimal MlflowClient double implementing exactly the five methods
    MlflowModelRegistry drives, with MLflow's semantics (string versions,
    per-tag writes, stage transitions)."""

    def __init__(self):
        self.models: dict[str, list[_FakeRawVersion]] = {}

    def create_registered_model(self, name):
        if name in self.models:
            raise RuntimeError(f"RESOURCE_ALREADY_EXISTS: {name}")
        self.models[name] = []

    def create_model_version(self, name, source, tags=None):
        versions = self.models.setdefault(name, [])
        raw = _FakeRawVersion(name, len(versions) + 1, tags or {}, source)
        versions.append(raw)
        return raw

    def search_model_versions(self, filter_string):
        name = filter_string.split("'")[1]
        return list(self.models.get(name, []))

    def _get(self, name, version):
        return next(v for v in self.models[name] if v.version == str(version))

    def set_model_version_tag(self, name, version, key, value):
        self._get(name, version).tags[key] = value

    def transition_model_version_stage(self, name, version, stage):
        self._get(name, version).current_stage = stage


def _make_backends(tmp_path):
    from clinical_data_platform_spark.clinical.registry import (
        MlflowModelRegistry,
        mlflow_available,
    )

    backends = [
        ("json", ModelRegistry(str(tmp_path / "registry.json"))),
        ("mlflow-contract", MlflowModelRegistry(client=FakeMlflowClient())),
    ]
    if mlflow_available():  # real client when mlflow is on the path
        import mlflow

        uri = f"sqlite:///{tmp_path}/mlflow.db"
        backends.append(("mlflow-real", MlflowModelRegistry(tracking_uri=uri)))
    return backends


def test_registry_governance_all_backends(tmp_path):
    """The governance contract must hold identically on every backend
    (reference runs it on MLflow; the JSON store is the sandbox stand-in)."""
    for label, reg in _make_backends(tmp_path):
        _governance_scenario(reg, label)


def _governance_scenario(reg, label="json"):
    mv = reg.register("risk_model", metrics={"auc": 0.9, "ap": 0.8})
    assert mv.version == 1 and mv.stage == "None"
    # production promotion blocked without governance tags
    with pytest.raises(PermissionError):
        reg.promote("risk_model", 1, "Production")
    reg.set_tags("risk_model", 1, {
        "clinical_use": "risk-screening",
        "validation_status": "approved",
        "performance_gate": "passed",
    })
    assert reg.validate_governance("risk_model", 1)["compliant"]
    reg.promote("risk_model", 1, "Production")
    assert reg.get_production_version("risk_model").version == 1
    # new version promotion archives the incumbent
    reg.register("risk_model", metrics={"auc": 0.92, "ap": 0.82}, tags={
        "clinical_use": "risk-screening",
        "validation_status": "approved",
        "performance_gate": "passed",
    })
    reg.promote("risk_model", 2, "Production")
    versions = {v.version: v.stage for v in reg._versions("risk_model")}
    assert versions == {1: "Archived", 2: "Production"}, label
    # metrics round-trip through the backend (mlflow stores them in a
    # reserved tag that must NOT leak into governance tags)
    v2 = next(v for v in reg._versions("risk_model") if v.version == 2)
    assert v2.metrics == {"auc": 0.92, "ap": 0.82}, label
    assert not any(k.startswith("_") for k in v2.tags), label
    with pytest.raises(ValueError):
        reg.promote("risk_model", 2, "SuperProd")
