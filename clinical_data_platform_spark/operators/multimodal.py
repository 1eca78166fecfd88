"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (north-star, BASELINE.json): image/audio/video travel as BINARY
columns with a metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` over the binary
column. Image decode is REAL for BMP, PPM (P6) and baseline PNG via the
dependency-free codecs in operators/imagecodec.py; JPEG (and exotic PNG
variants) fall back to PIL when installed, else surface as decode_error
rows. Audio/video decode remains a deterministic stand-in (no codec libs
in this container); the Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested either way.

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


IMAGE_STATS_SCHEMA = (
    "doc_id BIGINT, media_type STRING, width INT, height INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, decode_error STRING"
)
AHASH_SCHEMA = (
    "doc_id BIGINT, ahash_bits STRING, ahash_hex STRING, decode_error STRING"
)


def synth_image_payloads(
    df: DataFrame,
    id_col: str,
    seed_mod: int = 97,
    size: int = 8,
    force_format: str | None = None,
) -> DataFrame:
    """Deterministic REAL image payloads: for each id, a size x size RGB
    image whose bytes are md5(f"{id % seed_mod}:{block}") digests laid
    out in order — so a DuckDB oracle can recompute every pixel from its
    own md5, and ids sharing a seed class are exact perceptual duplicates
    (the aHash dedup fixture). The format rotates by id — doc_id % 3 of
    0 serializes as 24-bit BMP, 1 as binary PPM (P6), 2 as baseline PNG
    (with the PNG row filter rotating over all five filter types via
    doc_id % 5, so every unfilter path decodes inside the oracled
    fixtures): the PIXELS are identical regardless (sums and hashes —
    everything the oracles assert — are format-independent), so one
    fixture exercises ALL THREE native codecs plus the magic-byte
    dispatch. The bytes on the wire are spec-conformant files; nothing
    downstream knows they were synthesized. ``force_format`` ("bmp",
    "ppm", "png") pins every payload to one codec — the PNG-only decode
    query uses it so all five filter classes run through the PNG path."""
    import hashlib

    import numpy as np

    from .imagecodec import encode_bmp, encode_png, encode_ppm

    n_bytes = size * size * 3
    n_blocks = (n_bytes + 15) // 16

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, types = [], []
            for d in pdf["doc_id"]:
                seed = int(d) % seed_mod
                raw = b"".join(
                    hashlib.md5(f"{seed}:{b}".encode()).digest()
                    for b in range(n_blocks)
                )[:n_bytes]
                px = np.frombuffer(raw, dtype=np.uint8).reshape(size, size, 3)
                fmt = (
                    {"bmp": 0, "ppm": 1, "png": 2}[force_format]
                    if force_format
                    else int(d) % 3
                )
                if fmt == 0:
                    payloads.append(encode_bmp(px))
                    types.append("image/bmp")
                elif fmt == 1:
                    payloads.append(encode_ppm(px))
                    types.append("image/x-portable-pixmap")
                else:
                    payloads.append(encode_png(px, filter_type=int(d) % 5))
                    types.append("image/png")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": types,
                }
            )

    return df.select(F.col(id_col).alias("doc_id")).mapInPandas(
        _synth, PAYLOAD_SCHEMA
    )


# backwards-compatible name kept for callers/tests written against the
# BMP-only fixture
synth_bmp_payloads = synth_image_payloads


def synth_jpeg_payloads(
    df: DataFrame, id_col: str, seed_mod: int = 97
) -> DataFrame:
    """Deterministic spec-conformant baseline JPEGs (operators/
    jpegcodec.py::synth_jpeg): even ids 16x16 4:2:0, odd ids 8x8 4:4:4,
    coefficient-domain md5 payloads so a DuckDB oracle recomputes every
    DECODED pixel with integer math (see the jpegcodec module docstring
    for the exactness construction). Same mapInPandas plumbing as
    synth_image_payloads, but fanned out first: encode+decode are
    CPU-heavy per doc and the test corpus is one parquet file (identity
    no-op on a real multi-split scan — see catalog.fan_out_scan)."""
    from ..catalog import fan_out_scan
    from .jpegcodec import synth_jpeg

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        synth_jpeg(int(d), seed_mod) for d in pdf["doc_id"]
                    ],
                    "media_type": "image/jpeg",
                }
            )

    return fan_out_scan(df.select(F.col(id_col).alias("doc_id"))).mapInPandas(
        _synth, PAYLOAD_SCHEMA
    )


PIXEL_STATS_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, "
    "sum_r BIGINT, sum_g BIGINT, sum_b BIGINT, "
    "pixel_md5 STRING, decode_error STRING"
)


def decode_image_fingerprint(payloads: DataFrame) -> DataFrame:
    """decode_image plus a TOTAL pixel fingerprint: md5 over the decoded
    R-channel values, row-major, comma-joined decimal — a quantity a SQL
    oracle can recompute byte-for-byte, so the gate pins EVERY pixel of
    the decode, not just channel sums. Same corrupt-payload policy as
    decode_image (errors become rows)."""
    from .imagecodec import decode_rgb

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = ("doc_id", "width", "height", "sum_r", "sum_g",
                    "sum_b", "pixel_md5", "decode_error")
            rows = {k: [] for k in cols}
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(d)
                try:
                    rgb = decode_rgb(b)
                    s = rgb.astype("int64").sum(axis=(0, 1))
                    fp = hashlib.md5(
                        ",".join(
                            str(int(v)) for v in rgb[:, :, 0].ravel()
                        ).encode()
                    ).hexdigest()
                    rows["width"].append(rgb.shape[1])
                    rows["height"].append(rgb.shape[0])
                    rows["sum_r"].append(int(s[0]))
                    rows["sum_g"].append(int(s[1]))
                    rows["sum_b"].append(int(s[2]))
                    rows["pixel_md5"].append(fp)
                    rows["decode_error"].append(None)
                except Exception as e:  # noqa: BLE001 — failure becomes a row
                    for k in cols[1:-1]:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e)[:200])
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(_decode, PIXEL_STATS_SCHEMA)


def decode_image(payloads: DataFrame) -> DataFrame:
    """REAL image decode via the dependency-free BMP/PPM codecs in
    operators/imagecodec.py (PNG/JPEG fall back to PIL when installed —
    the former env-gated stub survives only as that fallback's ImportError
    branch). Emits per-image dimensions and exact integer channel sums;
    undecodable payloads become a decode_error ROW, never a task failure —
    at 100 TB a corrupt image must not kill the job."""
    from .imagecodec import decode_rgb

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "media_type", "width", "height",
                "sum_r", "sum_g", "sum_b", "decode_error",
            )}
            for d, mt, b in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                rows["doc_id"].append(d)
                rows["media_type"].append(mt)
                try:
                    rgb = decode_rgb(b)
                    s = rgb.astype("int64").sum(axis=(0, 1))
                    rows["width"].append(rgb.shape[1])
                    rows["height"].append(rgb.shape[0])
                    rows["sum_r"].append(int(s[0]))
                    rows["sum_g"].append(int(s[1]))
                    rows["sum_b"].append(int(s[2]))
                    rows["decode_error"].append(None)
                except Exception as e:  # noqa: BLE001 — any codec failure becomes a row
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["sum_r"].append(None)
                    rows["sum_g"].append(None)
                    rows["sum_b"].append(None)
                    rows["decode_error"].append(str(e)[:200])
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(_decode, IMAGE_STATS_SCHEMA)


def image_ahash(payloads: DataFrame) -> DataFrame:
    """Perceptual average-hash over REAL decoded pixels: integer gray
    (r+g+b, no division), bit_p = gray_p * n >= total — engine-exact, so
    a SQL oracle recomputes the identical bitstring. Emits both the
    row-major '0'/'1' bitstring (oracle-friendly) and packed hex (the
    join key a production dedup would use). Same corrupt-payload policy
    as decode_image: a codec failure becomes a null-hash row carrying
    decode_error, never a task failure — consumers keying on the hash
    filter ``ahash_bits IS NOT NULL``."""
    from .imagecodec import ahash_bits, ahash_hex, decode_rgb

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bits, hexes, errs = [], [], [], []
            for d, b in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(d)
                try:
                    rgb = decode_rgb(b)
                    bits.append("".join(map(str, ahash_bits(rgb))))
                    hexes.append(ahash_hex(rgb))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — codec failure becomes a row
                    bits.append(None)
                    hexes.append(None)
                    errs.append(str(e)[:200])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "ahash_bits": bits,
                    "ahash_hex": hexes,
                    "decode_error": errs,
                }
            )

    return payloads.mapInPandas(_hash, AHASH_SCHEMA)


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
