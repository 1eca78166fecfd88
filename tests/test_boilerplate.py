"""Line-level boilerplate detection/removal (plans/corpusqc.py).

The shipped corpus is single-line with unique lines, so the registered
queries legitimately return empty/trivial results there (the oracle
agrees); these tests inject a fixture with real repeated lines to pin
the non-empty behavior."""

from __future__ import annotations

from clinical_data_platform_spark.plans.corpusqc import (
    boilerplate_lines_frame,
    boilerplate_removal_frame,
)

HEADER = "SUBSCRIBE TO OUR NEWSLETTER"
FOOTER = "(c) example corp all rights reserved"


def _fixture(spark):
    rows = []
    for i in range(8):
        rows.append(
            (i, f"{HEADER}\nunique body line {i}\n{FOOTER}", "webA")
        )
    for i in range(8, 12):
        rows.append((i, f"clean doc {i} with its own text", "webB"))
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_repeated_lines_detected(spark):
    found = {
        r["line"]: (r["n_docs"], r["n_occurrences"])
        for r in boilerplate_lines_frame(_fixture(spark)).collect()
    }
    assert found == {HEADER: (8, 8), FOOTER: (8, 8)}


def test_removal_stats_per_source(spark):
    stats = {
        r["source"]: r.asDict()
        for r in boilerplate_removal_frame(_fixture(spark)).collect()
    }
    a, b = stats["webA"], stats["webB"]
    assert a["total_lines"] == 24 and a["boilerplate_lines"] == 16
    assert abs(a["retained_frac"] - 8 / 24) < 1e-6
    assert b["boilerplate_lines"] == 0 and b["retained_frac"] == 1.0


def test_threshold_respected(spark):
    # with min_docs above the duplication level nothing is boilerplate
    assert boilerplate_lines_frame(_fixture(spark), min_docs=9).count() == 0


def test_dup_span_detection_fires_on_shared_passage(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        dup_span_fraction_frame,
    )

    shared = " ".join(f"tok{i}" for i in range(32))  # 32-token passage
    rows = [
        (0, shared + " tailA one two three four five six seven eight", "dup"),
        (1, shared + " tailB nine ten eleven twelve thirteen fourteen fifteen sixteen", "dup"),
        (2, " ".join(f"solo{i}" for i in range(48)), "clean"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    stats = {
        r["source"]: r.asDict()
        for r in dup_span_fraction_frame(docs).collect()
    }
    # the first windows (offsets 0 and 8) fall inside the shared passage
    assert stats["dup"]["dup_windows"] >= 4  # >=2 windows in each of 2 docs
    assert stats["dup"]["dup_frac"] > 0
    assert stats["clean"]["dup_windows"] == 0


def test_clean_corpus_rebuild_preserves_order_and_drops_dups(spark):
    from clinical_data_platform_spark.plans.corpusqc import (
        clean_corpus_frame,
    )

    rows = []
    for i in range(6):
        rows.append(
            (i, f"{HEADER}\nbody first {i}\nbody second {i}\n{FOOTER}", "web")
        )
    rows.append((6, rows[0][1], "web"))  # exact duplicate of doc 0
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])

    out = {r["doc_id"]: r for r in clean_corpus_frame(docs).collect()}
    # duplicate dropped, min doc_id kept
    assert set(out) == {0, 1, 2, 3, 4, 5}
    # boilerplate stripped, original line ORDER preserved
    assert out[3]["clean_text"] == "body first 3\nbody second 3"
    assert out[3]["n_lines_removed"] == 2
    # every surviving doc lost exactly the header and footer
    assert all(r["n_lines_removed"] == 2 for r in out.values())
