"""Property-based tests (hypothesis): the check-engine compiler and the
as-of join verified against independent pandas implementations on
generated inputs — coverage beyond the reference's example-based strategy
(SURVEY §5 item 8 notes the reference has none)."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clinical_data_platform_spark.operators import checks as C
from clinical_data_platform_spark.operators.asof import asof_join_backward

values = st.one_of(st.none(), st.integers(min_value=-50, max_value=150))
rows = st.lists(
    st.tuples(values, st.sampled_from(["M", "F", "X", None])), min_size=1, max_size=30
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=rows)
def test_checks_match_pandas_bruteforce(spark, data):
    pdf = pd.DataFrame(data, columns=["age", "sex"]).astype({"age": "object"})
    df = spark.createDataFrame(
        [(a, s) for a, s in data], "age INT, sex STRING"
    )
    rules = [
        C.not_null("age"),
        C.in_range("age", 0, 120),
        C.accepted_values("sex", ["M", "F"]),
    ]
    got = C.run_checks(df, rules).collect()[0].asDict()

    exp_not_null = int(pdf["age"].isna().sum())
    nn = pdf["age"].dropna().astype(int)
    exp_range = int(((nn < 0) | (nn > 120)).sum())
    sx = pdf["sex"].dropna()
    exp_accept = int((~sx.isin(["M", "F"])).sum())

    assert got["not_null__age"] == exp_not_null
    assert got["in_range__age"] == exp_range
    assert got["accepted_values__sex"] == exp_accept
    assert got["n_rows"] == len(pdf)


asof_left = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=25
)
asof_right = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100), st.floats(0, 10)),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left, right=asof_right)
def test_asof_join_matches_merge_asof(spark, left, right):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left)],
        columns=["k", "ts", "row_id"],
    )
    rpdf = pd.DataFrame(
        [(k, base + dt.timedelta(minutes=m), v) for k, m, v in right],
        columns=["k", "rts", "val"],
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = (
        asof_join_backward(ldf, rdf, key="k", left_ts="ts", right_ts="rts", value_cols=["val"])
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("ts", kind="mergesort"),
        rpdf.sort_values("rts", kind="mergesort"),
        left_on="ts",
        right_on="rts",
        by="k",
        direction="backward",
    ).sort_values("row_id").reset_index(drop=True)
    assert len(got) == len(exp)
    got_vals = [None if pd.isna(v) else round(v, 9) for v in got["val"]]
    exp_vals = [None if pd.isna(v) else round(v, 9) for v in exp["val"]]
    assert got_vals == exp_vals


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=asof_left, right=asof_right, tol=st.sampled_from([None, 0, 7, 30]))
def test_asof_forward_and_nearest_match_merge_asof(spark, left, right, tol):
    """Forward and nearest(+tolerance) variants == pd.merge_asof with the
    same direction/tolerance — including equidistant ties, where both
    pandas and operators/asof.py pick the backward match."""
    import datetime as dt

    from clinical_data_platform_spark.operators.asof import (
        asof_join_forward,
        asof_join_nearest,
    )

    base = dt.datetime(2024, 1, 1)
    lpdf = pd.DataFrame(
        [(k, base + dt.timedelta(minutes=m), i) for i, (k, m) in enumerate(left)],
        columns=["k", "ts", "row_id"],
    )
    rpdf = pd.DataFrame(
        [(k, base + dt.timedelta(minutes=m), v) for k, m, v in right],
        columns=["k", "rts", "val"],
    )
    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    tol_s = None if tol is None else tol * 60
    tol_td = None if tol is None else pd.Timedelta(minutes=tol)

    for direction, fn in (("forward", asof_join_forward), ("nearest", asof_join_nearest)):
        kwargs = {"tolerance_seconds": tol_s} if tol_s is not None else {}
        got = (
            fn(ldf, rdf, key="k", left_ts="ts", right_ts="rts", value_cols=["val"], **kwargs)
            .toPandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("rts", kind="mergesort"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction=direction,
            tolerance=tol_td,
        ).sort_values("row_id").reset_index(drop=True)
        got_vals = [None if pd.isna(v) else round(v, 9) for v in got["val"]]
        exp_vals = [None if pd.isna(v) else round(v, 9) for v in exp["val"]]
        assert got_vals == exp_vals, f"direction={direction} tol={tol}"


def test_asof_nearest_direction_and_tolerance(spark):
    """Pinned nearest semantics: backward wins exact ties, tolerance nulls
    both directions, direction column labels the winner."""
    import datetime as dt

    from clinical_data_platform_spark.operators.asof import asof_join_nearest

    base = dt.datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2],
                "ts": [
                    base + dt.timedelta(minutes=10),  # tie: rts at 5 and 15
                    base + dt.timedelta(minutes=58),  # nearer forward (60)
                    base + dt.timedelta(minutes=200),  # nothing within tol
                    base,  # key with no right rows at all
                ],
                "row_id": [0, 1, 2, 3],
            }
        )
    )
    rdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1],
                "rts": [
                    base + dt.timedelta(minutes=5),
                    base + dt.timedelta(minutes=15),
                    base + dt.timedelta(minutes=60),
                ],
                "val": [1.0, 2.0, 3.0],
            }
        )
    )
    got = (
        asof_join_nearest(
            ldf, rdf, key="k", left_ts="ts", right_ts="rts",
            value_cols=["val"], tolerance_seconds=30 * 60, direction_col="dir",
        )
        .toPandas()
        .sort_values("row_id")
        .reset_index(drop=True)
    )
    assert [None if pd.isna(v) else v for v in got["val"]] == [1.0, 3.0, None, None]
    assert [None if pd.isna(v) else v for v in got["dir"]] == [
        "backward", "forward", None, None,
    ]


# --- interval join vs brute force -------------------------------------------

iv_probe = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2000)), min_size=1, max_size=25
)
iv_windows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 2000), st.integers(1, 900)),
    min_size=1,
    max_size=12,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(probe=iv_probe, windows=iv_windows)
def test_interval_join_matches_bruteforce(spark, probe, windows):
    """Bucketed interval semi-join == brute-force membership, for every
    generated key/timestamp layout (windows straddling bucket borders,
    duplicates, overlapping windows)."""
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.operators.rangejoin import interval_semi_join

    p = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(probe)], "k INT, rid INT, t LONG"
    ).select("k", "rid", F.timestamp_seconds("t").alias("t"))
    w = spark.createDataFrame(
        [(k, s, s + d) for k, s, d in windows], "k INT, ws LONG, we LONG"
    ).select(
        "k",
        F.timestamp_seconds("ws").alias("ws"),
        F.timestamp_seconds("we").alias("we"),
    )
    got = sorted(
        r.rid
        for r in interval_semi_join(
            p, w, key="k", ts_col="t", start_col="ws", end_col="we",
            bucket_seconds=600,
        ).collect()
    )
    want = sorted(
        i
        for i, (k, t) in enumerate(probe)
        if any(k == wk and ws <= t < ws + d for wk, ws, d in windows)
    )
    assert got == want


# --- chunking vs python reference -------------------------------------------

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=200), min_size=1, max_size=10
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=texts)
def test_chunking_matches_python_reference(spark, docs):
    import hashlib

    from clinical_data_platform_spark.plans.trainprep import chunk_documents_frame

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id LONG, text STRING"
    )
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_tokens, r.chunk_md5)
        for r in chunk_documents_frame(df, size=8, stride=5).collect()
    }
    want = {}
    for i, t in enumerate(docs):
        toks = t.lower().strip().split()
        if not toks:
            continue
        n = len(toks)
        n_chunks = 1 + -(-max(n - 8, 0) // 5)
        for c in range(n_chunks):
            sl = toks[c * 5 : c * 5 + 8]
            want[(i, c)] = (
                len(sl),
                hashlib.md5(" ".join(sl).encode()).hexdigest(),
            )
    assert got == want


class _FakeState:
    """Minimal GroupState double for driving _corpus_update directly."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


@given(
    st.lists(
        st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12),
                 min_size=0, max_size=8),
        min_size=1, max_size=4,
    )
)
@settings(max_examples=30, deadline=None)
def test_bloom_state_update_counts_match_exact_sets(batches):
    """Property: across ANY micro-batch split, the Bloom-bounded state
    machine's (n_seen, n_unique) equals the exact multiset/set counts —
    on these corpus sizes the 64 Kbit sketch must behave exactly (a
    false positive would undercount uniques)."""
    import pandas as pd

    from clinical_data_platform_spark.streaming.stateful import (
        _corpus_update,
    )

    state = _FakeState()
    seen, uniq = 0, set()
    last = None
    for batch in batches:
        out = list(
            _corpus_update(
                ("src",), iter([pd.DataFrame({"fp": batch})]), state
            )
        )
        seen += len(batch)
        uniq |= set(batch)
        last = out[-1]
    assert int(last["n_seen"].iloc[0]) == seen
    assert int(last["n_unique"].iloc[0]) == len(uniq)
