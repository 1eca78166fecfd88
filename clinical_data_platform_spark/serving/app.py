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
- sliding-window rate limiting per client IP (X-Forwarded-For aware):
  60 reads/min, 10 writes/min -> 429 (api/middleware.py:151-209).
- CORS allowlist with preflight handling: localhost dev origins by
  default, EMPTY in staging/prod unless configured; write methods
  excluded from Allow-Methods in read-only mode
  (api/middleware.py:213-233).
- security headers on every response (api/middleware.py:123-139).

The mart is loaded once from parquet into memory (it is subject-level,
i.e. tiny relative to the facts Spark aggregates it from) — the serving
path never touches Spark.
"""

from __future__ import annotations

import math
import os
import re
import time
from collections import defaultdict, deque

import pandas as pd
from flask import Flask, jsonify, request

from ..clinical.redaction import redact_text_str

SUBJID_RE = re.compile(r"^[A-Z0-9\-]+$")
API_TOKEN_ENV = "CLINICAL_API_TOKEN"
WRITE_METHODS = {"POST", "PUT", "PATCH", "DELETE"}
DEV_CORS_ORIGINS = ["http://localhost:3000", "http://localhost:8501"]
CORS_ALLOW_HEADERS = "Authorization, Content-Type, X-Request-ID"
CORS_EXPOSE_HEADERS = "X-Request-ID, X-Response-Time"


class RateLimiter:
    """Per-client sliding-window limiter (api/middleware.py:151-209):
    separate read/write budgets over a 60 s window, client identified by
    the first X-Forwarded-For hop when present."""

    def __init__(self, calls_per_minute: int = 60, write_calls_per_minute: int = 10):
        self.calls_per_minute = calls_per_minute
        self.write_calls_per_minute = write_calls_per_minute
        self._hits: dict[tuple[str, bool], deque] = defaultdict(deque)

    @staticmethod
    def client_ip(req) -> str:
        fwd = req.headers.get("X-Forwarded-For")
        if fwd:
            return fwd.split(",")[0].strip()
        return req.remote_addr or "unknown"

    def is_limited(self, ip: str, is_write: bool, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        q = self._hits[(ip, is_write)]
        while q and q[0] < now - 60:
            q.popleft()
        limit = self.write_calls_per_minute if is_write else self.calls_per_minute
        if len(q) >= limit:
            return True
        q.append(now)
        return False


def _cors_origins() -> list[str]:
    """Dev origins by default; staging/prod must configure explicitly
    (api/middleware.py:222-225). CORS_ALLOWED_ORIGINS is a comma list."""
    configured = os.environ.get("CORS_ALLOWED_ORIGINS")
    if configured is not None:
        return [o.strip() for o in configured.split(",") if o.strip()]
    if os.environ.get("APP_ENV") in ("staging", "prod"):
        return []
    return list(DEV_CORS_ORIGINS)


def _cors_methods() -> str:
    methods = ["GET", "HEAD", "OPTIONS"]
    if os.environ.get("READ_ONLY_MODE") != "1":
        methods.extend(sorted(WRITE_METHODS))
    return ", ".join(methods)


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


def create_app(
    mart_path: str | None = None,
    rate_limiter: RateLimiter | None = None,
    dashboard_path: str | None = None,
) -> Flask:
    app = Flask("clinical-data-platform-spark")
    mart: pd.DataFrame | None = None
    if mart_path and os.path.exists(mart_path):
        mart = pd.read_parquet(mart_path)
    dashboard: dict | None = None
    if dashboard_path and os.path.exists(dashboard_path):
        import json as _json

        with open(dashboard_path) as f:
            dashboard = _json.load(f)
    limiter = rate_limiter or RateLimiter()

    @app.before_request
    def cors_preflight():
        if request.method == "OPTIONS":
            resp = app.make_response(("", 204))
            origin = request.headers.get("Origin")
            if origin in _cors_origins():
                resp.headers["Access-Control-Allow-Origin"] = origin
                resp.headers["Access-Control-Allow-Methods"] = _cors_methods()
                resp.headers["Access-Control-Allow-Headers"] = CORS_ALLOW_HEADERS
                resp.headers["Access-Control-Allow-Credentials"] = "true"
                resp.headers["Access-Control-Max-Age"] = "600"
            return resp

    @app.before_request
    def rate_limit_guard():
        is_write = request.method in WRITE_METHODS
        if limiter.is_limited(RateLimiter.client_ip(request), is_write):
            limit = (
                limiter.write_calls_per_minute if is_write else limiter.calls_per_minute
            )
            resp = jsonify(
                {"error": "rate limit exceeded", "limit_per_minute": limit}
            )
            resp.headers["Retry-After"] = "60"
            return resp, 429

    @app.before_request
    def read_only_guard():
        if os.environ.get("READ_ONLY_MODE") == "1":
            if request.method in WRITE_METHODS and request.path != "/score":
                return jsonify({"error": "read-only mode"}), 403

    @app.after_request
    def cors_and_security_headers(resp):
        origin = request.headers.get("Origin")
        if origin in _cors_origins():
            resp.headers["Access-Control-Allow-Origin"] = origin
            resp.headers["Access-Control-Allow-Credentials"] = "true"
            resp.headers["Access-Control-Expose-Headers"] = CORS_EXPOSE_HEADERS
            resp.headers["Vary"] = "Origin"
        # security headers (api/middleware.py:123-139)
        resp.headers["X-Content-Type-Options"] = "nosniff"
        resp.headers["X-Frame-Options"] = "DENY"
        resp.headers["Referrer-Policy"] = "strict-origin-when-cross-origin"
        return resp

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

    @app.get("/dashboard/data")
    def dashboard_data():
        """Chart-data payload precomputed by the Spark pipeline
        (clinical/dashboard.py; ui/dashboard.py parity) — the serving path
        stays Spark-free, like the mart endpoints."""
        if not _authorized(request):
            return jsonify({"error": "unauthorized"}), 401
        if dashboard is None:
            return jsonify({"error": "dashboard payload not loaded"}), 503
        return jsonify(dashboard)

    @app.get("/dashboard")
    def dashboard_html():
        """Minimal HTML table view of every chart payload (the Streamlit
        front end in the reference is a pure client of /dashboard/data)."""
        if not _authorized(request):
            return jsonify({"error": "unauthorized"}), 401
        if dashboard is None:
            return jsonify({"error": "dashboard payload not loaded"}), 503
        parts = ["<html><head><title>Clinical Data Platform</title></head><body>"]
        parts.append("<h1>Study Overview Dashboard</h1>")
        for chart, rows in dashboard.items():
            parts.append(f"<h2>{chart}</h2><table border=1>")
            if rows:
                cols = list(rows[0])
                parts.append("<tr>" + "".join(f"<th>{c}</th>" for c in cols) + "</tr>")
                for r in rows:
                    parts.append(
                        "<tr>" + "".join(f"<td>{r[c]}</td>" for c in cols) + "</tr>"
                    )
            parts.append("</table>")
        parts.append("</body></html>")
        return "\n".join(parts), 200, {"Content-Type": "text/html; charset=utf-8"}

    @app.errorhandler(Exception)
    def on_error(exc):
        # PHI-scrubbed error surface (api/main.py:86-99)
        return jsonify({"error": "internal error", "detail": redact_text_str(str(exc))}), 500

    return app
