"""Raw-corpus readers (sources/corpus.py): line mode, per-file mode,
binary mode — id determinism, guard behavior, and downstream fit."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from clinical_data_platform_spark.sources.corpus import (
    read_binary_corpus,
    read_text_corpus,
)


def _mk_corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("first doc here\nsecond doc here\n\n")
    (d / "b.txt").write_text("third doc, different file\n")
    return str(d)


def test_line_mode_one_doc_per_line(spark, tmp_path):
    path = _mk_corpus(tmp_path)
    docs = read_text_corpus(spark, path).collect()
    assert len(docs) == 3  # empty line dropped
    assert {r["text"] for r in docs} == {
        "first doc here",
        "second doc here",
        "third doc, different file",
    }
    # every doc carries its originating file
    assert all(r["source"].endswith((".txt",)) for r in docs)


def test_doc_ids_content_derived_and_stable(spark, tmp_path):
    path = _mk_corpus(tmp_path)
    a = {r["text"]: r["doc_id"] for r in read_text_corpus(spark, path).collect()}
    b = {
        r["text"]: r["doc_id"]
        for r in read_text_corpus(spark, path)
        .repartition(7)
        .collect()
    }
    assert a == b  # stable under re-read and re-partitioning
    assert len(set(a.values())) == len(a)  # distinct contents -> distinct ids


def test_per_file_mode_and_size_guard(spark, tmp_path):
    path = _mk_corpus(tmp_path)
    docs = read_text_corpus(spark, path, per_file=True).collect()
    assert len(docs) == 2  # one row per file
    texts = {os.path.basename(r["source"]): r["text"] for r in docs}
    assert texts["a.txt"].startswith("first doc here")
    # a tiny max_file_bytes drops the larger file but keeps the smaller
    kept = read_text_corpus(
        spark, path, per_file=True, max_file_bytes=30
    ).collect()
    assert {os.path.basename(r["source"]) for r in kept} == {"b.txt"}


def test_binary_mode_feeds_multimodal_shape(spark, tmp_path):
    d = tmp_path / "blobs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"\x00\x01\x02payload")
    (d / "y.bin").write_bytes(b"\xff" * 64)
    (d / "skip.dat").write_bytes(b"zz")
    df = read_binary_corpus(spark, str(d), glob="*.bin")
    rows = {os.path.basename(r["source"]): r for r in df.collect()}
    assert set(rows) == {"x.bin", "y.bin"}
    assert bytes(rows["x.bin"]["payload"]) == b"\x00\x01\x02payload"
    assert rows["y.bin"]["length"] == 64
    assert df.schema["payload"].dataType.typeName() == "binary"
    # the length guard prunes at the scan
    assert (
        read_binary_corpus(spark, str(d), glob="*.bin", max_file_bytes=10)
        .count()
        == 1
    )
