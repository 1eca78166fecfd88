"""Static report surface (clinical/report.py) — render-layer parity
with the reference's ui/dashboard.py overview + analytics pages."""

from __future__ import annotations

import json


def test_report_sections_and_payload(spark, silver, tmp_path):
    from clinical_data_platform_spark.clinical.report import (
        build_report_payload,
        render_html,
        write_report,
    )

    paths = write_report(silver, str(tmp_path))
    html = open(paths["html"]).read()
    for sec in [
        "Study Overview",
        "Age Distribution",
        "Safety Risk Categories",
        "Treatment Arms",
        "Adverse Events by Arm",
        "Demographics (Arm × Sex)",
        "Feature Correlations",
        "Treatment Summary",
        "Data Quality Checks",
    ]:
        assert sec in html, sec
    payload = json.load(open(paths["json"]))
    # headline tiles rendered from the same payload the JSON carries
    tiles = payload["overview_metrics"][0]
    assert str(tiles["total_subjects"]) in html
    # every DQ domain appears
    domains = {r["domain"] for r in payload["dq_checks"]}
    assert {"DM", "AE", "LB", "VS", "EX"} <= domains
    # render is a pure function of the payload (idempotent re-render)
    assert render_html(payload) == render_html(payload)
    # age histogram covers exactly the subjects with a known age
    binned = sum(r["n"] for r in payload["age_histogram"])
    assert 0 < binned <= tiles["total_subjects"]


def test_report_html_escapes_content(spark):
    from clinical_data_platform_spark.clinical.report import _table

    rows = [{"name": "<script>alert(1)</script>", "v": 1}]
    out = _table(rows)
    assert "<script>" not in out
    assert "&lt;script&gt;" in out
