"""Wave-64 invariant tests: Markov stationary distribution, two-segment
structural break (Chow), Bradley-Terry strength."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_markov_stationary_is_distribution(spark):
    from clinical_data_platform_spark.plans.events import (
        event_markov_stationary,
    )

    rows = event_markov_stationary(spark, SF).collect()
    assert rows
    total = sum(r.stationary_prob for r in rows)
    assert abs(total - 1.0) < 1e-3
    for r in rows:
        assert 0.0 <= r.stationary_prob <= 1.0
        assert r.convergence_gap <= 1e-3  # P^64 mixed on a 5-state chain
        assert 0.0 <= r.empirical_freq <= 1.0


def test_markov_driver_and_distributed_paths_agree(spark):
    """The size-gated driver replay and the distributed squaring loop
    must produce identical rows on the same transition counts (r10: the
    gate pattern bpe/pagerank/CC already follow). Fixture includes an
    asymmetric 4-state chain plus a NULL-state row, which the SQL joins
    drop from P0 but keep in the empirical total — the replay must
    mirror both."""
    from clinical_data_platform_spark.plans.events import (
        _mkv_distributed,
        _mkv_driver_replay,
    )

    counts = [
        ("a", "b", 7),
        ("a", "c", 3),
        ("b", "a", 4),
        ("b", "d", 9),
        ("c", "c", 5),
        ("c", "a", 1),
        ("d", "b", 2),
        ("d", "d", 6),
        (None, "a", 8),  # null cur: out of P0, in the empirical total
    ]
    c = spark.createDataFrame(counts, "cur string, nxt string, n long")
    dist = sorted(
        (r.state, r.stationary_prob, r.convergence_gap, r.empirical_freq)
        for r in _mkv_distributed(c.localCheckpoint()).collect()
    )
    driver = sorted(_mkv_driver_replay(counts))
    assert dist == driver


def test_trend_break_recovers_injected_break(spark):
    """On the shipped stationary series the machinery must still return
    valid segments; the Chow F and slopes must be finite and the
    breakpoint inside the allowed band."""
    from clinical_data_platform_spark.plans.events import (
        _TSB_MIN_SEG,
        two_segment_trend_break,
    )

    rows = two_segment_trend_break(spark, SF).collect()
    assert rows
    for r in rows:
        assert _TSB_MIN_SEG <= r.break_rn <= r.n_hours - _TSB_MIN_SEG
        assert r.chow_f >= 0
        assert 0.0 <= r.sse_drop_frac <= 1.0
        assert r.slope_left is not None and r.slope_right is not None


def test_bradley_terry_strengths(spark):
    """Strengths are max-normalized in (0, 1]; every nation appears;
    and strength correlates with win_rate in the aggregate (Spearman
    over the 25 nations strictly positive)."""
    from clinical_data_platform_spark.plans.graphops import (
        bradley_terry_trade_strength,
    )

    rows = bradley_terry_trade_strength(spark, SF).collect()
    assert len(rows) >= 2
    assert max(r.strength for r in rows) == 1.0
    for r in rows:
        assert 0.0 < r.strength <= 1.0
        assert r.wins > 0
        assert 0.0 <= r.win_rate <= 1.0
    by_strength = sorted(rows, key=lambda r: r.strength)
    by_rate = sorted(rows, key=lambda r: r.win_rate)
    rk_s = {r.nation: i for i, r in enumerate(by_strength)}
    rk_r = {r.nation: i for i, r in enumerate(by_rate)}
    n = len(rows)
    d2 = sum((rk_s[r.nation] - rk_r[r.nation]) ** 2 for r in rows)
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    assert rho > 0.3, rho
