"""Wave-43 plans: common-neighbor link prediction + Page-Hinkley drift —
independent sequential Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def _trade_graph():
    l = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    s = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = (
        l.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n.rename(columns={"n_name": "src"}), left_on="s_nationkey", right_on="n_nationkey")
        .merge(
            n.rename(columns={"n_name": "dst", "n_nationkey": "nk2"}),
            left_on="c_nationkey",
            right_on="nk2",
        )
    )
    j = j[j.src != j.dst]
    und = Counter()
    for r in j.itertuples():
        und[(min(r.src, r.dst), max(r.src, r.dst))] += 1
    avg_w = sum(und.values()) / len(und)
    return {p for p, w in und.items() if w > 1.5 * avg_w}


def _trade_graph_weighted():
    """Thresholded undirected trade edges WITH weights (shared by the
    wave-55 modularity recount)."""
    l = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    s = pd.read_parquet(f"{SF}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    c = pd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    n = pd.read_parquet(f"{SF}/nation.parquet", columns=["n_nationkey", "n_name"])
    j = (
        l.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        .merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n.rename(columns={"n_name": "src"}), left_on="s_nationkey", right_on="n_nationkey")
        .merge(
            n.rename(columns={"n_name": "dst", "n_nationkey": "nk2"}),
            left_on="c_nationkey",
            right_on="nk2",
        )
    )
    j = j[j.src != j.dst]
    und = Counter()
    for r in j.itertuples():
        und[(min(r.src, r.dst), max(r.src, r.dst))] += 1
    avg_w = sum(und.values()) / len(und)
    return {p: w for p, w in und.items() if w > 1.5 * avg_w}


def test_link_prediction_recount(spark):
    from clinical_data_platform_spark.plans.graphops import trade_link_prediction

    got = trade_link_prediction(spark, SF).collect()
    edges = _trade_graph()
    nbr = defaultdict(set)
    for a, b in edges:
        nbr[a].add(b)
        nbr[b].add(a)
    scored = []
    names = sorted(nbr)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            if (a, b) in edges:
                continue
            common = len(nbr[a] & nbr[b])
            if common == 0:
                continue
            jac = math.floor(common * 1e6 / len(nbr[a] | nbr[b])) / 1e6
            scored.append((a, b, common, jac))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = scored[: len(got)]
    assert [(r.a, r.b, r.n_common, r.jaccard) for r in got] == want


def test_link_prediction_excludes_existing_edges(spark):
    from clinical_data_platform_spark.plans.graphops import trade_link_prediction

    got = trade_link_prediction(spark, SF).collect()
    edges = _trade_graph()
    for r in got:
        assert (r.a, r.b) not in edges
        assert r.a < r.b
        assert 0.0 < r.jaccard <= 1.0


def test_page_hinkley_sequential_recount(spark):
    from clinical_data_platform_spark.plans.events import (
        _PH_LAMBDA_FP,
        page_hinkley_drift,
    )

    got = {r.event_type: r for r in page_hinkley_drift(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "event_type", "value"])
    ev["hour"] = ev.ts.dt.floor("h")
    ev["cents"] = (ev.value * 100.0).round().astype("int64")
    hourly = (
        ev.groupby(["event_type", "hour"])["cents"].sum().reset_index()
    )
    for etype, grp in hourly.groupby("event_type"):
        grp = grp.sort_values("hour")
        s = 0
        m = 0
        minm = 0
        n_alarms = 0
        first_alarm = 0
        max_ph = 0
        for t, row in enumerate(grp.itertuples(), start=1):
            s += row.cents
            inc = math.floor((row.cents - s / t) * 1e6)
            m += inc
            minm = min(minm, m)
            ph = m - minm
            max_ph = max(max_ph, ph)
            if ph > _PH_LAMBDA_FP:
                n_alarms += 1
                if first_alarm == 0:
                    first_alarm = int(row.hour.timestamp())
        r = got[etype]
        assert r.n_hours == len(grp)
        assert r.n_alarms == n_alarms, (etype, r.n_alarms, n_alarms)
        assert r.first_alarm_epoch_s == first_alarm
        assert abs(r.max_ph_stat - math.floor(max_ph / 1e6) / 100.0) < 1e-9


def test_page_hinkley_fires_somewhere(spark):
    """Value-bearing check: at least one type alarms at sf0.001 with the
    shipped lambda (otherwise the driver row compares all-zeros)."""
    from clinical_data_platform_spark.plans.events import page_hinkley_drift

    rows = page_hinkley_drift(spark, SF).collect()
    assert any(r.n_alarms > 0 for r in rows)
    for r in rows:
        assert r.max_ph_stat >= 0.0
        assert (r.n_alarms == 0) == (r.first_alarm_epoch_s == 0)
