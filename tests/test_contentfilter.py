"""Content-filter plan tests (plans/contentfilter.py).

The corpus itself is clean word-salad, so the registered pii_signal_counts
rows are all-zero by construction; these tests inject documents where the
patterns MUST fire, and cross-check the counting against DuckDB on the
same fixture. The classifier weight function is re-derived with hashlib.
"""

from __future__ import annotations

import hashlib

import duckdb
import pyspark.sql.functions as F

from clinical_data_platform_spark.plans.contentfilter import (
    PII_SIGNALS,
    _token_weight,
    pii_signal_frame,
)

FIXTURE = [
    # (doc_id, text, source)
    (0, "contact alice@example.com or bob@corp.io today", "dirty"),
    (1, "see https://example.com/a and http://b.io/x?q=1", "dirty"),
    (2, "server at 10.0.0.1 and 192.168.1.255 rebooted", "dirty"),
    (3, "ssn 123-45-6789 phone 555-123-4567 on file", "dirty"),
    (4, "perfectly clean prose with no identifiers at all", "clean"),
]


def _fixture_df(spark):
    return spark.createDataFrame(
        FIXTURE, ["doc_id", "text", "source"]
    )


def test_patterns_fire_on_injected_docs(spark):
    out = {
        r["source"]: r.asDict()
        for r in pii_signal_frame(_fixture_df(spark)).collect()
    }
    dirty, clean = out["dirty"], out["clean"]
    assert dirty["n_email"] == 2
    assert dirty["n_url"] == 2
    assert dirty["n_ipv4"] == 2
    assert dirty["n_ssn"] == 1
    # 555-123-4567 matches phone; 123-45-6789 does not (3-2-4 grouping).
    assert dirty["n_phone"] == 1
    assert all(clean[f"n_{k}"] == 0 for k in PII_SIGNALS)


def test_counts_match_duckdb_on_fixture(spark):
    spark_rows = {
        r["source"]: r.asDict()
        for r in pii_signal_frame(_fixture_df(spark)).collect()
    }
    con = duckdb.connect()
    con.register(
        "docs",
        _fixture_df(spark).toPandas(),
    )
    for name, pat in PII_SIGNALS.items():
        duck = dict(
            con.sql(
                "SELECT source, cast(sum(len(regexp_extract_all(text,"
                f" '{pat}'))) AS BIGINT) FROM docs GROUP BY source"
            ).fetchall()
        )
        for src, n in duck.items():
            assert spark_rows[src][f"n_{name}"] == n, (name, src)


def test_token_weight_matches_hashlib(spark):
    words = ["spark", "table", "Zebra", "123"]
    got = (
        spark.createDataFrame([(w,) for w in words], ["w"])
        .select("w", _token_weight(F.col("w")).alias("wt"))
        .collect()
    )
    for r in got:
        expect = (int(hashlib.md5(r["w"].encode()).hexdigest()[:2], 16) - 127.5) / 127.5
        assert abs(r["wt"] - expect) < 1e-12
        assert -1.0 <= r["wt"] <= 1.0


def test_bigram_lm_heldout_perplexity_higher(spark):
    """The LM is trained on the even-doc_id half, so held-out docs must
    score strictly higher average perplexity than training docs within
    every language (the generalization gap the filter exploits), and
    every perplexity exceeds 1."""
    from clinical_data_platform_spark.plans.collocations import (
        bigram_lm_perplexity,
    )

    rows = bigram_lm_perplexity(spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        assert r.avg_ppl > 1.0, r
        by_lang.setdefault(r.lang, {})[r.split] = r.avg_ppl
    assert by_lang
    for lang, d in by_lang.items():
        assert d["heldout"] > d["train"], (lang, d)


def test_naive_bayes_learns_on_separable_corpus(spark):
    """The registered query's corpus is word salad (shared vocabulary),
    so NB there collapses to the prior; this fixture gives each 'lang'
    a disjoint vocabulary plus shared filler and asserts the classifier
    recovers the labels perfectly on the held-out half — and that the
    confusion rows exactly partition the held-out docs."""
    from clinical_data_platform_spark.plans.contentfilter import (
        naive_bayes_confusion,
    )

    vocab = {
        "aa": ["alpha", "anchor", "apple"],
        "bb": ["bravo", "basket", "bridge"],
        "cc": ["carbon", "circle", "copper"],
    }
    rows = []
    doc_id = 0
    for lang, words in vocab.items():
        for i in range(20):
            body = " ".join(words[(i + j) % 3] for j in range(6))
            rows.append((doc_id, lang, f"{body} filler common"))
            doc_id += 1
    d = spark.createDataFrame(
        rows, ["doc_id", "lang", "text"]
    ).select(
        "doc_id", "lang", F.split(F.trim(F.col("text")), r"\s+").alias("ws")
    )
    got = naive_bayes_confusion(d).collect()
    # perfect diagonal: every held-out doc predicted as its own lang
    assert {(r.true_lang, r.pred_lang) for r in got} == {
        (lg, lg) for lg in vocab
    }
    assert all(r.n_docs == 10 for r in got)
    # determinism: a second run returns the identical matrix
    again = naive_bayes_confusion(d).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
