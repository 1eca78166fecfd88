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


def test_substring_removal_frame_hand_computed(spark):
    """Wave 82 semantics on a hand-computed fixture: W=16, stride 8.
    Doc 0 (owner) and doc 1 share an identical 32-token text; doc 2 is
    unrelated. Doc 1 must lose its duplicated windows merged into ONE
    maximal span covering the whole 32 tokens; doc 0 (min doc_id owner)
    and doc 2 keep everything."""
    from clinical_data_platform_spark.plans.corpusqc import (
        substring_dedup_removal_frame,
    )

    shared = " ".join(f"w{i}" for i in range(32))          # 32 tokens
    other = " ".join(f"z{i}" for i in range(32))
    docs = spark.createDataFrame(
        [(0, "a", shared), (1, "b", shared), (2, "b", other)],
        ["doc_id", "source", "text"],
    )
    out = {r["source"]: r for r in substring_dedup_removal_frame(docs).collect()}
    # windows in a 32-token doc: starts 0, 8, 16 -> [0,16),[8,24),[16,32)
    # doc 1: all three duplicated (owner doc 0) -> union [0,32) = 32 tokens
    assert out["a"]["tokens_removed"] == 0
    assert out["a"]["docs_affected"] == 0
    assert out["b"]["tokens_removed"] == 32
    assert out["b"]["docs_affected"] == 1
    assert out["b"]["n_spans"] == 1
    assert out["b"]["max_span_tokens"] == 32
    assert out["b"]["total_tokens"] == 64
    assert abs(out["b"]["removed_frac"] - 0.5) < 1e-9


def test_substring_removal_interval_union_not_double_counted(spark):
    """Overlapping removed windows must merge (interval UNION), never
    sum: a doc sharing a 24-token run yields windows [0,16) and [8,24)
    -> 24 removed tokens, not 32. A disjoint second shared run checks
    multi-span accounting."""
    from clinical_data_platform_spark.plans.corpusqc import (
        substring_dedup_removal_frame,
    )

    run_a = " ".join(f"a{i}" for i in range(24))           # 24 tokens
    pad = " ".join(f"p{i}" for i in range(8))              # 8 tokens
    run_b = " ".join(f"b{i}" for i in range(16))           # 16 tokens
    # owner doc 0 carries both runs; doc 1 repeats them with padding
    # BETWEEN so its removed spans are disjoint. Doc-1 layout (56 tokens):
    # run_a at [0,24), pad at [24,32), run_b at [32,48), pad2 [48,56).
    pad2 = " ".join(f"q{i}" for i in range(8))
    doc0 = run_a + " " + run_b                               # 40 tokens
    doc1 = run_a + " " + pad + " " + run_b + " " + pad2      # 56 tokens
    docs = spark.createDataFrame(
        [(0, "a", doc0), (1, "b", doc1)], ["doc_id", "source", "text"]
    )
    out = {r["source"]: r for r in substring_dedup_removal_frame(docs).collect()}
    # doc 1 windows: starts 0,8,16,24,32,40 ->
    #   [0,16) run_a hash-match (doc0 [0,16)) -> removed
    #   [8,24) run_a tail matches doc0 [8,24)? doc0 [8,24) = a8..a23 ==
    #          doc1 [8,24) -> removed
    #   [16,32) = a16..a23+p0..p7 -> unique
    #   [32,48) = run_b == doc0 [24,40)? doc0 window starts are 0,8,16,24:
    #          doc0 [24,40) = b0..b15 -> removed
    #   [40,56) = b8..b15+q0..q7 -> unique
    # removed intervals: [0,16),[8,24),[32,48) -> union [0,24) + [32,48)
    assert out["b"]["tokens_removed"] == 24 + 16
    assert out["b"]["n_spans"] == 2
    assert out["b"]["max_span_tokens"] == 24
    assert out["a"]["tokens_removed"] == 0
