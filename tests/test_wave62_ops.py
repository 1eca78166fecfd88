"""Wave-62 invariant tests: time-series diagnostics (Ljung-Box, DFT),
Nelson-Aalen hazard, feature-hash collisions, Dirichlet QL retrieval,
winnowing fingerprints, Kneser-Ney LM, personalized PageRank,
t-closeness, MMR re-ranking. Value-exactness is covered by the DuckDB
oracle gate (test_oracle_parity / tools/oracle_check.py); these pin the
mathematical invariants the hash comparison can't express."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ljung_box_bounds(spark):
    from clinical_data_platform_spark.plans.events import ljung_box_autocorr

    rows = ljung_box_autocorr(spark, SF).collect()
    assert rows
    for r in rows:
        for k in range(1, 7):
            rk = getattr(r, f"r{k}")
            assert -1.0 <= rk <= 1.0, (r.event_type, k, rk)
        assert r.q_stat >= 0
        assert 0.0 <= r.p_approx <= 1.0
        assert r.n_hours > 6


def test_dft24_power_nonnegative_and_parseval_bound(spark):
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.catalog import table as T
    from clinical_data_platform_spark.plans.events import dft24_hourly_spectrum

    rows = dft24_hourly_spectrum(spark, SF).collect()
    assert sorted(r.cycles_per_day for r in rows) == [1, 2, 3, 4]
    total = (
        T(spark, SF, "events").agg(F.count(F.lit(1))).collect()[0][0]
    )
    for r in rows:
        assert r.power >= 0
        # |X_f| <= sum |c_h| = total event count
        assert abs(r.re_sum) <= total and abs(r.im_sum) <= total


def test_nelson_aalen_vs_km(spark):
    """H(t) nondecreasing; Fleming-Harrington exp(-H) >= the KM product
    (1-x <= e^-x termwise), both in (0, 1]."""
    from clinical_data_platform_spark.plans.survival import (
        kaplan_meier_survival,
        nelson_aalen_hazard,
    )

    na = {
        (r.cohort, r.duration_hours): r
        for r in nelson_aalen_hazard(spark, SF).collect()
    }
    km = {
        (r.cohort, r.duration_hours): r.survival
        for r in kaplan_meier_survival(spark, SF).collect()
    }
    assert set(na) == set(km)
    last = {}
    for (cohort, dur), r in sorted(na.items()):
        assert r.cum_hazard >= last.get(cohort, 0.0) - 1e-9
        last[cohort] = r.cum_hazard
        assert 0.0 < r.fleming_harrington_surv <= 1.0
        assert r.fleming_harrington_surv >= km[(cohort, dur)] - 1e-6
        assert r.se >= 0


def test_hash_collision_monotone_in_bits(spark):
    from clinical_data_platform_spark.plans.trainprep import (
        hash_collision_audit,
    )

    rows = {r.bits: r for r in hash_collision_audit(spark, SF).collect()}
    assert sorted(rows) == [12, 16, 20]
    ntok = {r.n_tokens for r in rows.values()}
    assert len(ntok) == 1  # same vocabulary hashed three ways
    for b, r in rows.items():
        assert r.n_buckets <= min(1 << b, r.n_tokens)
        assert 0.0 <= r.collision_rate < 1.0
        assert 0 < r.expected_buckets <= (1 << b)
    assert rows[12].collision_rate >= rows[16].collision_rate >= rows[20].collision_rate


def test_dirichlet_ql_scores(spark):
    from clinical_data_platform_spark.plans.textops import (
        dirichlet_query_likelihood,
    )

    rows = dirichlet_query_likelihood(spark, SF).collect()
    assert len(rows) == 10
    scores = [r.ql_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s < 0 for s in scores)  # log-probs


def test_winnowing_pairs_structural(spark):
    from clinical_data_platform_spark.plans.textops import (
        winnowing_fingerprint_pairs,
    )

    rows = winnowing_fingerprint_pairs(spark, SF).collect()
    assert rows  # the corpus has near-dups; winnowing must catch some
    for r in rows:
        assert r.id_a < r.id_b
        assert r.n_shared >= 2
        assert r.n_shared <= min(r.fp_a, r.fp_b)
        assert 0.0 < r.containment <= 1.0


def test_kneser_ney_vs_addk(spark):
    """KN rows line up with the add-k twin's splits; perplexities are
    finite and > 1; and on the heldout half KN's pooled mean beats
    add-k (the point of the smoothing)."""
    from clinical_data_platform_spark.plans.collocations import (
        bigram_lm_perplexity,
        kneser_ney_bigram_lm,
    )

    kn = {(r.lang, r.split): r for r in kneser_ney_bigram_lm(spark, SF).collect()}
    ak = {(r.lang, r.split): r for r in bigram_lm_perplexity(spark, SF).collect()}
    assert set(kn) == set(ak)
    for key, r in kn.items():
        assert r.n_docs == ak[key].n_docs
        assert r.avg_ppl > 1.0
    kn_held = [r.avg_ppl for (lang, s), r in kn.items() if s == "heldout"]
    ak_held = [r.avg_ppl for (lang, s), r in ak.items() if s == "heldout"]
    assert sum(kn_held) / len(kn_held) < sum(ak_held) / len(ak_held)


def test_personalized_pagerank_mass_and_seed(spark):
    from clinical_data_platform_spark.plans.graphops import (
        personalized_pagerank,
    )

    rows = personalized_pagerank(spark, SF).collect()
    seeds = [r for r in rows if r.is_seed]
    assert len(seeds) == 1
    total = sum(r.ppr for r in rows)
    assert abs(total - 1.0) < 1e-4  # stochastic up to per-iter rounding
    assert seeds[0].ppr == max(r.ppr for r in rows)
    assert all(r.ppr >= 0 for r in rows)


def test_t_closeness_flag_consistent(spark):
    from clinical_data_platform_spark.plans.validation import (
        _TC_T,
        t_closeness_audit,
    )

    rows = t_closeness_audit(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.emd <= 1.0
        if r.emd >= _TC_T + 1e-6:
            assert r.violates_t
        if r.emd < _TC_T - 1e-6:
            assert not r.violates_t


def test_mmr_greedy_properties(spark):
    from clinical_data_platform_spark.plans.textops import (
        bm25_topk_docs,
        mmr_diversified_topk,
    )

    rows = sorted(mmr_diversified_topk(spark, SF).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.doc_id for r in rows}) == 5
    top_bm25 = bm25_topk_docs(spark, SF).collect()[0].doc_id
    assert rows[0].doc_id == top_bm25  # round 1 is pure relevance
    assert rows[0].penalty == 0.0
    for r in rows:
        assert 0.0 <= r.nb <= 1.0 and 0.0 <= r.penalty <= 1.0
