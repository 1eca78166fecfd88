"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (north-star, BASELINE.json): image/audio/video travel as BINARY
columns with a metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` over the binary
column. The image/audio codec libraries are NOT in this container, so the
actual decode is STUBBED (clearly marked below); everything Spark-side —
schema, batching, partitioning, UDF signatures — is real and tested.

At 100 TB the binary column dominates I/O: keep payloads in their own
parquet column (column pruning skips them unless referenced), partition by
content shard, and size spark.sql.files.maxPartitionBytes so one task's
batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAYLOAD_SCHEMA = "doc_id BIGINT, payload BINARY, media_type STRING"
META_SCHEMA = "doc_id BIGINT, media_type STRING, byte_len BIGINT, sha256 STRING"
FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"


def attach_payload(df: DataFrame, id_col: str, text_col: str, media_type: str = "text/plain") -> DataFrame:
    """Wrap a column as an opaque binary payload + media_type tag (stand-in
    for reading real image/audio bytes; the corpus has no binary column)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
    )


def extract_meta(payloads: DataFrame) -> DataFrame:
    """Per-payload metadata via mapInPandas (Arrow batches of binary).

    This is the real plumbing pattern: iterator of pandas batches in, typed
    rows out, constant memory per batch."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return payloads.mapInPandas(_meta, META_SCHEMA)


def decode_image(payloads: DataFrame) -> DataFrame:
    """STUB: real image decode needs PIL/opencv (not in this container).
    The Spark-side contract (mapInPandas over binary -> struct rows) is
    identical to extract_meta; only the per-batch body changes."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv) not present in "
        "this environment; use extract_meta/featurize_payload for the "
        "tested plumbing path"
    )


def featurize_payload(payloads: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic fake feature extractor (sha256-seeded), standing in for
    an embedding model. Exercises the batched binary -> vector path."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                digest = hashlib.sha256(bytes(b)).digest()
                feats.append([digest[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return payloads.mapInPandas(_feat, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx BIGINT, frame_bytes BINARY, frame_sha STRING"


def sample_frames(
    payloads: DataFrame, frame_bytes: int = 100, stride: int = 4
) -> DataFrame:
    """Frame sampling over a video-like payload: the payload is treated as
    a sequence of fixed-size frames (a deterministic stand-in for a real
    container format — no codec libs in this environment) and every
    ``stride``-th frame is emitted as its own row.

    This is the 1->N mapInPandas shape a real frame sampler uses: one
    Arrow batch of payloads in, a frame-level DataFrame out, with the
    binary column sliced INSIDE the batch (no per-row Python calls into
    Spark). Downstream per-frame decode/featurize then runs on a table
    whose parallelism is frames, not videos — at scale, repartition the
    output so one hot video cannot pin a task."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, shas = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                n_frames = max(1, len(data) // frame_bytes)
                for i in range(0, n_frames, stride):
                    chunk = data[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    blobs.append(chunk)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_bytes": blobs,
                    "frame_sha": shas,
                }
            )

    return payloads.mapInPandas(_frames, FRAME_SCHEMA)
