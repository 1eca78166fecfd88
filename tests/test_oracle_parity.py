"""Driver-gate replica inside pytest: every registered plan query vs its
DuckDB oracle at sf0.001 (fast). The standalone tools/oracle_check.py does
the same at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from clinical_data_platform_spark.catalog import TABLES
from clinical_data_platform_spark.plans import all_oracles, all_queries

from .helpers import assert_frames_match

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


_QUERIES = sorted(all_queries())


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(name, spark, corpus_duck):
    q = all_queries()[name]
    sdf = q(spark, SF_DIR)
    oracle = all_oracles().get(name)
    if oracle is None:
        assert sdf.count() >= 0  # rows-only contract
        return
    odf = corpus_duck.execute(oracle).fetchdf()
    assert_frames_match(sdf, odf, float_dp=6, context=name)


def test_driver_window_spans_all_modules():
    """The driver value-checks only the first 50 registered queries. The
    round-4 discipline (r3 verdict item 3): the window must burn down the
    driver-verification debt — every slot goes to a query the driver has
    NEVER sampled in CORRECTNESS_r01-r03, except the entry() flagship
    anchor and queries whose semantics changed this round (the five
    inverted-index dedup queries re-registered with the df cap ON)."""
    import json
    from pathlib import Path

    from clinical_data_platform_spark.plans import QUERIES

    ordered = list(all_queries())
    assert ordered[0] == "q1_pricing_summary"  # entry() flagship
    window = ordered[:50]

    root = Path(__file__).resolve().parent.parent
    driver_verified: set[str] = set()
    for r in (1, 2, 3):
        f = root / f"CORRECTNESS_r0{r}.json"
        if f.exists():
            driver_verified |= set(json.loads(f.read_text()).keys())
    changed_this_round = {
        # max_shingle_docs=1000 turned ON + oracle mirror (r4)
        "near_dup_jaccard_pairs", "near_dup_clusters",
        "containment_dup_pairs", "dup_cluster_canonical_docs",
        "dedup_capture_recapture",
    }
    allowed_verified = {"q1_pricing_summary"} | changed_this_round
    stale = set(window) & driver_verified - allowed_verified
    assert not stale, f"window wastes slots on driver-verified rows: {stale}"
    # the debt burndown is real: >= 44 fresh names this round
    fresh = [n for n in window if n not in driver_verified]
    assert len(fresh) >= 44, len(fresh)

    for must_have in (
        # changed this round -> must re-verify
        "near_dup_jaccard_pairs", "near_dup_clusters",
        "containment_dup_pairs", "dup_cluster_canonical_docs",
        "dedup_capture_recapture",
        # ab_test carries the r4 p-value fix (doubled two-sided p dropped)
        "ab_test_two_proportion",
        # r3-verdict-named rotation candidates
        "dbscan_grid_clusters", "kaplan_meier_survival",
        "distributed_auc_rank_sum", "bm25_topk_docs",
        "spearman_quantity_price", "exact_gini_coefficient",
    ):
        assert must_have in window
    # the full registry is still exposed, nothing dropped or duplicated
    assert sorted(ordered) == sorted(QUERIES) and len(ordered) == len(QUERIES)
