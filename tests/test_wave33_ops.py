"""Wave-33 plans: IPF raking + recsys evaluation — sequential recounts
beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ipf_margins_converge(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        _IPF_ROUNDS,
        ipf_mixture_raking,
    )

    pdf = ipf_mixture_raking(spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    n = len(docs)
    n_lang = docs.lang.nunique()
    n_src = docs.source.nunique()
    # numpy replication with the identical rounding schedule
    cells = docs.groupby(["lang", "source"]).size()
    w = {k: float(v) for k, v in cells.items()}
    t_lang, t_src = n / n_lang, n / n_src
    for _ in range(_IPF_ROUNDS):
        rows = defaultdict(float)
        for (lg, s), v in w.items():
            rows[lg] += v
        w = {
            k: round(v * (t_lang / rows[k[0]]), 9) for k, v in w.items()
        }
        cols = defaultdict(float)
        for (lg, s), v in w.items():
            cols[s] += v
        w = {k: round(v * (t_src / cols[k[1]]), 9) for k, v in w.items()}
    for r in pdf.itertuples():
        assert abs(r.weight - round(w[(r.lang, r.source)], 6)) < 1e-6
        assert r.per_doc_weight > 0
    # after the final column step the SOURCE margins are exactly on
    # target; language margins are within a loose band (IPF converges,
    # one more row step would tighten them)
    src_m = pdf.groupby("source").weight.sum()
    assert np.allclose(src_m, t_src, rtol=1e-6)
    lang_m = pdf.groupby("lang").weight.sum()
    assert np.allclose(lang_m, t_lang, rtol=0.15)
    # mass conserved
    assert abs(pdf.weight.sum() - n) < 1e-3


def test_rec_eval_recount(spark):
    from clinical_data_platform_spark.plans.relational import (
        _DCG_W,
        _IDCG,
        rec_eval_precision_ndcg,
    )

    rows = {r.anchor: r for r in rec_eval_precision_ndcg(spark, SF).collect()}

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    cb = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(part, left_on="l_partkey", right_on="p_partkey")[
            ["o_custkey", "p_brand"]
        ]
        .drop_duplicates()
    )
    train = cb[cb.o_custkey % 2 == 0]
    test = cb[cb.o_custkey % 2 == 1]
    baskets_tr = train.groupby("o_custkey").p_brand.apply(set)
    deg = train.p_brand.value_counts()
    co = defaultdict(int)
    for bs in baskets_tr:
        for x in bs:
            for z in bs:
                if x != z:
                    co[(x, z)] += 1
    recs = defaultdict(list)
    for (x, z), nb in co.items():
        cos = math.floor(nb / math.sqrt(deg[x] * deg[z]) * 1e6) / 1e6
        recs[x].append((-cos, z))
    top3 = {x: [z for _, z in sorted(v)[:3]] for x, v in recs.items()}

    baskets_te = test.groupby("o_custkey").p_brand.apply(set)
    w = {i: float(_DCG_W[i]) for i in (1, 2, 3)}
    idcg = {i: float(_IDCG[i]) for i in (1, 2, 3)}
    agg = defaultdict(lambda: [0, 0, 0.0])  # n_evals, hits, ndcg_sum
    for bs in baskets_te:
        if len(bs) < 2:
            continue
        for anchor in bs:
            if anchor not in top3:
                continue
            rel = bs - {anchor}
            hits = [
                p
                for p, z in enumerate(top3[anchor], start=1)
                if z in rel
            ]
            dcg = sum(w[p] for p in hits)
            k = min(len(rel), 3)
            a = agg[anchor]
            a[0] += 1
            a[1] += len(hits)
            a[2] += dcg / idcg[k]
    assert set(rows) == set(agg)
    for anchor, (n_ev, nh, nd) in agg.items():
        r = rows[anchor]
        assert r.n_evals == n_ev
        assert abs(r.precision_at_3 - math.floor(nh / (3 * n_ev) * 1e6) / 1e6) < 1e-9
        assert abs(r.ndcg_at_3 - math.floor(nd / n_ev * 1e6) / 1e6) < 1e-6


def test_clean_purchase_sequences_recount(spark):
    from clinical_data_platform_spark.plans.events import (
        clean_purchase_sequences,
    )

    rows = {r.user_id: r for r in clean_purchase_sequences(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    expect = {}
    for uid, grp in ev.groupby("user_id"):
        gate = None
        n_p = n_c = 0
        first = None
        for r in grp.itertuples():
            if r.event_type == "purchase":
                n_p += 1
                if gate == "view":
                    n_c += 1
                    if first is None:
                        first = r.ts
            if r.event_type in ("view", "error"):
                gate = r.event_type
        if n_p:
            expect[uid] = (n_p, n_c, first)
    assert set(rows) == set(expect)
    for uid, (n_p, n_c, first) in expect.items():
        r = rows[uid]
        assert r.n_purchases == n_p
        assert r.n_clean == n_c
        if first is None:
            assert r.first_clean_epoch is None or pd.isna(r.first_clean_epoch)
        else:
            # Timestamp.value is always ns; engines floor to whole seconds
            assert int(r.first_clean_epoch) == first.value // 1_000_000_000


def test_kwic_recount(spark):
    from clinical_data_platform_spark.plans.textops import (
        _KWIC_TERM,
        _KWIC_WIN,
        kwic_concordance,
    )

    got = {
        (r.doc_id, r.pos): (r.left_ctx, r.right_ctx)
        for r in kwic_concordance(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    expect = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        ws = text.strip().split()
        for i, w in enumerate(ws, start=1):
            if w == _KWIC_TERM:
                left = " ".join(ws[max(i - 1 - _KWIC_WIN, 0) : i - 1])
                right = " ".join(ws[i : i + _KWIC_WIN])
                expect[(doc_id, i)] = (left, right)
    assert got == expect


def test_nb_f1_consistent_with_confusion(spark):
    from clinical_data_platform_spark.plans.contentfilter import (
        naive_bayes_lang_confusion,
        nb_f1_report,
    )

    conf = naive_bayes_lang_confusion(spark, SF).collect()
    f1 = {r.lang: r for r in nb_f1_report(spark, SF).collect()}
    langs = {r.true_lang for r in conf} | {r.pred_lang for r in conf}
    for lg in langs:
        tp = sum(
            r.n_docs for r in conf if r.true_lang == lg and r.pred_lang == lg
        )
        fp = sum(
            r.n_docs for r in conf if r.true_lang != lg and r.pred_lang == lg
        )
        fn = sum(
            r.n_docs for r in conf if r.true_lang == lg and r.pred_lang != lg
        )
        r = f1[lg]
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn), lg
        p = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f = 2 * tp / max(2 * tp + fp + fn, 1)
        assert abs(r.precision - math.floor(p * 1e6) / 1e6) < 1e-9
        assert abs(r.recall - math.floor(rec * 1e6) / 1e6) < 1e-9
        assert abs(r.f1 - math.floor(f * 1e6) / 1e6) < 1e-9


def test_burstiness_recount(spark):
    from clinical_data_platform_spark.plans.events import (
        user_burstiness_index,
    )

    rows = {r.user_id: r for r in user_burstiness_index(spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, grp in ev.groupby("user_id"):
        sec = grp.ts.astype("int64") // 1_000_000
        gaps = np.diff(sec.to_numpy())
        if len(gaps) < 5:
            assert uid not in rows
            continue
        mu = gaps.mean()
        sig = math.sqrt((gaps.astype(float) ** 2).mean() - mu * mu)
        r = rows[uid]
        assert r.n_gaps == len(gaps)
        assert abs(r.mean_gap_s - round(mu, 4)) < 1e-6
        assert abs(r.std_gap_s - round(sig, 4)) < 1e-4
        assert abs(r.burstiness - round((sig - mu) / (sig + mu), 4)) < 1e-4
        assert -1.0 <= r.burstiness <= 1.0
