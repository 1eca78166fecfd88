"""Wave-42 plans: Dunning G2 collocations + Fellegi-Sunter linkage
weights — independent Python recounts beyond the DuckDB value oracle."""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

SF = "/root/testdata/sf0.001"


def _bigrams(ws: list[str]) -> list[tuple[str, str]]:
    return list(zip(ws, ws[1:]))


def test_g2_recount(spark):
    from clinical_data_platform_spark.plans.collocations import (
        _MIN_PAIR,
        dunning_g2_collocations,
    )

    got = dunning_g2_collocations(spark, SF).collect()
    assert len(got) == 20
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    bg = Counter()
    for r in docs.itertuples():
        ws = r.text.strip().split()
        bg.update(_bigrams(ws))
    total = sum(bg.values())
    lm = Counter()
    rm = Counter()
    for (w1, w2), c in bg.items():
        lm[w1] += c
        rm[w2] += c
    scored = []
    for (w1, w2), o11 in bg.items():
        if o11 < _MIN_PAIR:
            continue
        lc, rc = lm[w1], rm[w2]
        cells = [
            (o11, lc * rc),
            (lc - o11, lc * (total - rc)),
            (rc - o11, (total - lc) * rc),
            (total - lc - rc + o11, (total - lc) * (total - rc)),
        ]
        g2 = 2.0 * sum(
            o * math.log(o * 1.0 * total / e) for o, e in cells if o > 0
        )
        scored.append((w1, w2, o11, round(g2, 4)))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = scored[:20]
    for g, w in zip(got, want):
        assert (g.w1, g.w2, g.n_pair) == (w[0], w[1], w[2])
        assert abs(g.g2 - w[3]) < 2e-4, (g, w)


def test_g2_prefers_volume_over_rarity(spark):
    """G2's defining property vs PMI: every surfaced collocation carries
    real support, and the statistic is nonnegative."""
    from clinical_data_platform_spark.plans.collocations import (
        _MIN_PAIR,
        dunning_g2_collocations,
    )

    got = dunning_g2_collocations(spark, SF).collect()
    for r in got:
        assert r.n_pair >= _MIN_PAIR
        assert r.g2 >= 0.0


def test_fellegi_sunter_recount(spark):
    from clinical_data_platform_spark.plans.textops import (
        _FS_M,
        fellegi_sunter_weights,
    )

    got = fellegi_sunter_weights(spark, SF).collect()
    p = pd.read_parquet(f"{SF}/part.parquet")
    # u-probabilities
    u = {}
    for f in ("p_brand", "p_type", "p_size"):
        vc = p[f].value_counts()
        n = len(p)
        u[f] = float((vc * vc).sum()) / (n * n)
    wa = {f: round(math.log2(_FS_M / u[f]), 6) for f in u}
    wd = {f: round(math.log2(0.1 / (1.0 - u[f])), 6) for f in u}
    # blocked candidate pairs
    rows = []
    for r in p.itertuples():
        ts = sorted(set(f"{r.p_name} {r.p_brand} {r.p_type}".lower().split()))
        if len(ts) >= 2:
            rows.append((f"{ts[0]} {ts[1]}", r.p_partkey, r.p_brand, r.p_type, r.p_size))
    byblk: dict[str, list] = {}
    for row in rows:
        byblk.setdefault(row[0], []).append(row)
    patterns = Counter()
    for blk in byblk.values():
        blk.sort(key=lambda t: t[1])
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                a, b = blk[i], blk[j]
                patterns[(a[2] == b[2], a[3] == b[3], a[4] == b[4])] += 1
    assert len(got) == len(patterns)
    for r in got:
        key = (r.brand_agree, r.type_agree, r.size_agree)
        assert patterns[key] == r.n_pairs, (key, r)
        w = (
            (wa if key[0] else wd)["p_brand"]
            + (wa if key[1] else wd)["p_type"]
            + (wa if key[2] else wd)["p_size"]
        )
        assert abs(r.match_weight - w) < 2e-6, (key, r.match_weight, w)


def test_fellegi_sunter_weights_are_monotone(spark):
    """More agreement never lowers the match weight (agree weight >
    disagree weight per field since m > u for every field here)."""
    from clinical_data_platform_spark.plans.textops import (
        fellegi_sunter_weights,
    )

    got = fellegi_sunter_weights(spark, SF).collect()
    by_bits = {
        (r.brand_agree, r.type_agree, r.size_agree): r.match_weight
        for r in got
    }
    for bits, w in by_bits.items():
        for i in range(3):
            if not bits[i]:
                up = tuple(b or (k == i) for k, b in enumerate(bits))
                if up in by_bits:
                    assert by_bits[up] > w, (bits, up)
