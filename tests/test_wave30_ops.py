"""Wave-30 plans: zone-map audit, compaction planning, sweep-line
concurrency, rank-sum AUC, canonical dedup keepers — invariants beyond
the DuckDB value oracle."""

from __future__ import annotations

import math

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_zone_map_sorted_layout_dominates(spark):
    from clinical_data_platform_spark.plans.layout import (
        zone_map_skipping_audit,
    )

    rows = {r.layout: r for r in zone_map_skipping_audit(spark, SF).collect()}
    assert set(rows) == {"arrival", "sorted"}
    a, s = rows["arrival"], rows["sorted"]
    assert a.n_files == s.n_files  # same rows, same file size
    # sorting on the predicate column can only help
    assert s.files_scanned <= a.files_scanned
    assert s.skip_fraction >= a.skip_fraction
    # sorted layout confines the band to contiguous files:
    # at most ceil(band_rows / F) + 1 boundary-straddling files
    o = pd.read_parquet(f"{SF}/orders.parquet")
    band = ((o.o_totalprice >= 100000.0) & (o.o_totalprice <= 150000.0)).sum()
    assert s.files_scanned <= math.ceil(band / 1000) + 1
    # every file containing a band row must be scanned under any layout
    assert s.rows_scanned >= band
    assert a.rows_scanned >= band


def test_compaction_bins_conserve_and_fill(spark):
    from clinical_data_platform_spark.plans.layout import (
        compaction_bin_packing,
    )

    rows = compaction_bin_packing(spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    sizes = ev.groupby(
        [ev.ts.dt.floor("D"), "event_type"]
    ).size()
    # conservation: every input file lands in exactly one bin
    assert sum(r.n_files for r in rows) == len(sizes)
    assert sum(r.total_size_units for r in rows) == len(ev)
    # next-fit bound: each bin except possibly the last overshoots the
    # target by less than its largest member
    bins = sorted(rows, key=lambda r: r.bin_id)
    for r in bins[:-1]:
        assert r.total_size_units + 1 > 4096 - r.largest_file
    for r in rows:
        assert r.largest_file <= r.total_size_units
        assert abs(r.fill_ratio - math.floor(r.total_size_units * 1e6 / 4096) / 1e6) < 1e-9


def test_open_orders_curve_recount(spark):
    from clinical_data_platform_spark.plans.relational import (
        daily_open_orders_curve,
    )

    rows = sorted(
        daily_open_orders_curve(spark, SF).collect(), key=lambda r: r.day
    )
    o = pd.read_parquet(f"{SF}/orders.parquet")
    l = pd.read_parquet(f"{SF}/lineitem.parquet")
    close = l.groupby("l_orderkey").l_shipdate.max().dt.floor("D")
    iv = o.set_index("o_orderkey").join(close.rename("close"), how="inner")
    iv["start"] = iv.o_orderdate.dt.floor("D")
    # the operator clamps degenerate intervals (ship before order)
    iv["close"] = iv[["close", "start"]].max(axis=1)
    # open(d) counted directly on a few probe days
    days = [rows[0].day, rows[len(rows) // 2].day, rows[-1].day]
    by_day = {r.day: r for r in rows}
    for d in days:
        ts = pd.Timestamp(d)
        expected = int(((iv.start <= ts) & (iv.close >= ts)).sum())
        assert by_day[d].open_orders == expected, d
    # curve is a cumulative sum of its own increments, never negative
    cum = 0
    for r in rows:
        cum += r.n_start - r.n_released
        assert r.open_orders == cum
        assert r.open_orders >= 0
    # everything that starts eventually closes within [d0, d1]
    assert rows[-1].open_orders == int((iv.close == iv.close.max()).sum())


def test_auc_matches_per_row_rank_formula(spark):
    from clinical_data_platform_spark.plans.stats import (
        distributed_auc_rank_sum,
    )

    r = distributed_auc_rank_sum(spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    score = o.o_totalprice.apply(math.floor)
    label = o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    # classic per-row average-rank Mann-Whitney AUC
    ranks = score.rank(method="average")
    n_pos, n_neg = int(label.sum()), int((~label).sum())
    auc = (ranks[label].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert r.n_pos == n_pos and r.n_neg == n_neg
    assert abs(r.auc - math.floor(auc * 1e6) / 1e6) < 2e-6
    assert 0.0 <= r.auc <= 1.0
    assert abs(r.gini - (2 * auc - 1)) < 1e-5
    assert r.n_scores == score.nunique()


def test_canonical_docs_survivorship(spark):
    from clinical_data_platform_spark.plans.textops import (
        dup_cluster_canonical_docs,
        near_dup_clusters,
    )

    rows = dup_cluster_canonical_docs(spark, SF).collect()
    comp = pd.DataFrame(
        [(r.node, r.component) for r in near_dup_clusters(spark, SF).collect()],
        columns=["node", "component"],
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet").set_index("doc_id")
    assert {r.cluster_id for r in rows} == set(comp.component.unique())
    for r in rows:
        members = comp[comp.component == r.cluster_id].node.tolist()
        assert r.n_members == len(members) >= 2
        assert r.n_dropped == r.n_members - 1
        chars = {m: int(docs.loc[m, "n_chars"]) for m in members}
        best = max(chars.values())
        # keeper is the longest member, smallest id on ties
        assert chars[r.canonical_doc] == best == r.canonical_chars
        assert r.canonical_doc == min(
            m for m in members if chars[m] == best
        )
        assert r.chars_dropped == sum(chars.values()) - best
