"""Wave-22 plans: Kaplan–Meier survival, attrition waterfall, Cohen's
kappa, Poisson bootstrap, shard manifest — invariants beyond the DuckDB
value oracle."""

from __future__ import annotations

import math

import pandas as pd
import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_kaplan_meier_recount(spark):
    from clinical_data_platform_spark.plans.survival import (
        kaplan_meier_survival,
    )

    rows = kaplan_meier_survival(spark, SF).collect()
    assert rows
    # brute-force product-limit recount from the raw events
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # floor-truncate to epoch seconds regardless of stored unit
    ev["sec"] = ev["ts"].astype("datetime64[s]").astype("int64")
    pu = ev.groupby("user_id").agg(t0=("sec", "min")).reset_index()
    purch = (
        ev[ev.event_type == "purchase"]
        .groupby("user_id")
        .agg(t_evt=("sec", "min"))
        .reset_index()
    )
    pu = pu.merge(purch, on="user_id", how="left")
    t_max = ev["sec"].max()
    import hashlib

    def cohort(uid: int) -> str:
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:6], 16)
        return "A" if h % 2 == 0 else "B"

    pu["cohort"] = pu["user_id"].map(cohort)
    pu["dur"] = (
        (pu["t_evt"].fillna(t_max) - pu["t0"]) // 3600
    ).astype("int64")
    pu["evt"] = pu["t_evt"].notna().astype(int)
    for co, grp in pu.groupby("cohort"):
        tbl = (
            grp.groupby("dur")
            .agg(d=("evt", "sum"), n_rows=("evt", "size"))
            .sort_index()
        )
        at_risk = len(grp)
        surv = 1.0
        expected = {}
        for dur, r in tbl.iterrows():
            if r.d > 0:
                surv *= (at_risk - r.d) / at_risk
                expected[dur] = (at_risk, r.d, surv)
            at_risk -= r.n_rows
        got = {
            r.duration_hours: (r.n_at_risk, r.n_events, r.survival)
            for r in rows
            if r.cohort == co
        }
        assert set(got) == set(expected)
        for dur, (n_i, d_i, s) in expected.items():
            gn, gd, gs = got[dur]
            assert (gn, gd) == (n_i, d_i)
            assert math.isclose(gs, round(s, 6), abs_tol=2e-6)
    # survival is nonincreasing per cohort
    for co in {r.cohort for r in rows}:
        seq = [
            r.survival
            for r in sorted(rows, key=lambda r: r.duration_hours)
            if r.cohort == co
        ]
        assert all(a >= b for a, b in zip(seq, seq[1:]))
        assert all(0.0 <= s <= 1.0 for s in seq)


def test_attrition_waterfall_invariants(spark):
    from clinical_data_platform_spark.plans.survival import (
        cohort_attrition_waterfall,
    )

    rows = sorted(
        cohort_attrition_waterfall(spark, SF).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == [1, 2, 3, 4, 5]
    # monotone shrink, dropped accounts for every transition
    for prev, cur in zip(rows, rows[1:]):
        assert cur.remaining <= prev.remaining
        assert cur.dropped == prev.remaining - cur.remaining
    n_cust = len(pd.read_parquet(f"{SF}/customer.parquet"))
    assert rows[0].remaining == n_cust
    assert rows[0].retention == 1.0


def test_filter_agreement_kappa_recount(spark):
    from clinical_data_platform_spark.plans.survival import (
        filter_agreement_kappa,
    )

    rows = filter_agreement_kappa(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert {r.lang for r in rows} == set(docs.lang.unique())
    import re

    for r in rows:
        sub = docs[docs.lang == r.lang]
        assert r.n == len(sub)
        assert r.both_pass + r.a_only + r.b_only + r.both_fail == r.n
        # brute-force rater recount
        a = sub.text.map(
            lambda t: len(re.sub(r"[A-Za-z0-9\s]", "", t))
            / max(len(t), 1)
            <= 0.1
        )
        toks = sub.text.map(lambda t: re.split(r"\s+", t.strip()))
        b = toks.map(
            lambda ts: len(ts) >= 20
            and 3.0 <= sum(len(t) for t in ts) / len(ts) <= 12.0
        )
        assert r.both_pass == int((a & b).sum())
        assert r.both_fail == int((~a & ~b).sum())
        # kappa bounded above by 1; po/pe are probabilities
        assert r.kappa <= 1.0
        assert 0.0 <= r.po <= 1.0 and 0.0 <= r.pe <= 1.0


def test_bootstrap_ci_shape_and_determinism(spark):
    from clinical_data_platform_spark.plans.stats import bootstrap_ci_mean

    a = bootstrap_ci_mean(spark, SF).collect()[0]
    b = bootstrap_ci_mean(spark, SF).collect()[0]
    assert a == b  # md5-derived weights: fully reproducible
    assert a.n_replicates == 64
    assert a.ci_lo_95 < a.ci_hi_95
    # the point estimate sits inside a 95% interval on real data
    assert a.ci_lo_95 <= a.mean <= a.ci_hi_95


def test_shard_manifest_partitions_corpus(spark, tmp_path):
    from clinical_data_platform_spark.plans.trainprep import (
        training_shard_manifest,
    )

    rows = training_shard_manifest(spark, SF).collect()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert sum(r.n_docs for r in rows) == len(docs)
    assert sum(r.total_chars for r in rows) == int(docs.n_chars.sum())
    # deterministic: a second run is identical
    again = training_shard_manifest(spark, SF).collect()
    assert sorted(rows) == sorted(again)
    # tamper detection: altering ONE document flips exactly that
    # shard's checksum and nothing else
    import hashlib
    import shutil

    tdir = tmp_path / "sfmod"
    tdir.mkdir()
    for f in (
        "documents.parquet",
    ):
        mod = docs.copy()
        mod.loc[mod.index[0], "text"] = mod.loc[mod.index[0], "text"] + "!"
        mod.to_parquet(tdir / f)
    victim_doc = int(docs.iloc[0].doc_id)
    victim_shard = (
        int(hashlib.md5(str(victim_doc).encode()).hexdigest()[:8], 16) % 64
    )
    mod_rows = {
        r.shard: r for r in training_shard_manifest(spark, str(tdir)).collect()
    }
    for r in rows:
        if r.shard == victim_shard:
            assert mod_rows[r.shard].content_checksum != r.content_checksum
        else:
            assert mod_rows[r.shard].content_checksum == r.content_checksum
