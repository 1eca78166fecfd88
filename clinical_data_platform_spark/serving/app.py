"""Serving API parity (api/main.py:55-195; FastAPI in the reference, Flask
here — fastapi is not in this container; the HTTP contract is identical):

- GET  /health                      liveness
- POST /score                       bearer auth + validated closed-form
                                    logistic risk (api/main.py:171-195)
- GET  /studies                     distinct study ids from the mart
- GET  /subjects/<id>               regex-validated path, PII-light row
- read-only middleware: mutating methods are rejected when
  READ_ONLY_MODE=1 (compliance/read_only.py:14-20), /score exempt like the
  reference's scoring endpoint.

The mart is loaded once from parquet into memory (it is subject-level,
i.e. tiny relative to the facts Spark aggregates it from) — the serving
path never touches Spark.
"""

from __future__ import annotations

import math
import os
import re

import pandas as pd
from flask import Flask, jsonify, request

from ..clinical.redaction import redact_text_str

SUBJID_RE = re.compile(r"^[A-Z0-9\-]+$")
API_TOKEN_ENV = "CLINICAL_API_TOKEN"


def _authorized(req) -> bool:
    expected = os.environ.get(API_TOKEN_ENV)
    if not expected:
        return False
    auth = req.headers.get("Authorization", "")
    return auth == f"Bearer {expected}"


def closed_form_score(age: float, ae_count: int, severe_ae_count: int) -> dict:
    """z = .02*AGE + .3*AE + .6*SEVERE - 2 -> sigmoid -> confidence tiers
    on |z| (api/main.py:176-180; must equal clinical/ml.closed_form_risk)."""
    z = 0.02 * age + 0.3 * ae_count + 0.6 * severe_ae_count - 2.0
    risk = 1.0 / (1.0 + math.exp(-z))
    tier = "high" if abs(z) > 1.0 else ("medium" if abs(z) > 0.5 else "low")
    return {"risk": round(risk, 6), "confidence": tier}


def create_app(mart_path: str | None = None) -> Flask:
    app = Flask("clinical-data-platform-spark")
    mart: pd.DataFrame | None = None
    if mart_path and os.path.exists(mart_path):
        mart = pd.read_parquet(mart_path)

    @app.before_request
    def read_only_guard():
        if os.environ.get("READ_ONLY_MODE") == "1":
            if request.method in ("POST", "PUT", "PATCH", "DELETE") and request.path != "/score":
                return jsonify({"error": "read-only mode"}), 403

    @app.get("/health")
    def health():
        return jsonify({"status": "ok", "mart_loaded": mart is not None})

    @app.post("/score")
    def score():
        if not _authorized(request):
            return jsonify({"error": "unauthorized"}), 401
        body = request.get_json(silent=True) or {}
        errors = []
        age = body.get("age")
        ae = body.get("ae_count")
        severe = body.get("severe_ae_count")
        if not isinstance(age, (int, float)) or not (0 <= age <= 150):
            errors.append("age must be a number in [0, 150]")
        for k, v in (("ae_count", ae), ("severe_ae_count", severe)):
            if not isinstance(v, int) or v < 0:
                errors.append(f"{k} must be a non-negative integer")
        # cross-field check (api/main.py:90-100)
        if not errors and severe > ae:
            errors.append("severe_ae_count cannot exceed ae_count")
        if errors:
            return jsonify({"errors": errors}), 422
        return jsonify(closed_form_score(age, ae, severe))

    @app.get("/studies")
    def studies():
        if not _authorized(request):
            return jsonify({"error": "unauthorized"}), 401
        if mart is None:
            return jsonify({"studies": []})
        return jsonify({"studies": sorted(mart["studyid"].unique().tolist())})

    @app.get("/subjects/<subjid>")
    def subject(subjid: str):
        if not _authorized(request):
            return jsonify({"error": "unauthorized"}), 401
        if not SUBJID_RE.match(subjid):
            return jsonify({"error": "invalid subject id"}), 400
        if mart is None:
            return jsonify({"error": "mart not loaded"}), 503
        rows = mart[mart["subjid"] == subjid]
        if rows.empty:
            return jsonify({"error": "not found"}), 404
        r = rows.iloc[0]
        # PII-light projection (no raw demographics beyond coarse groups)
        return jsonify(
            {
                "subjid": subjid,
                "treatment_arm": r["treatment_arm"],
                "age_group": r["age_group"],
                "safety_risk_category": r["safety_risk_category"],
                "total_adverse_events": int(r["total_adverse_events"]),
                "data_completeness_score": float(r["data_completeness_score"]),
            }
        )

    @app.errorhandler(Exception)
    def on_error(exc):
        # PHI-scrubbed error surface (api/main.py:86-99)
        return jsonify({"error": "internal error", "detail": redact_text_str(str(exc))}), 500

    return app
