"""Baseline JPEG codec tests (operators/jpegcodec.py, r8 wave 84).

The DuckDB gate hash-compares jpeg_decode_stats end to end; these tests
pin the codec pieces the oracle exercises only implicitly (byte
stuffing, ZRL, EOB, non-baseline rejection, corrupt-payload policy) and
recount the decode against the closed-form pixel math for EVERY seed
class x sampling parity.
"""

from __future__ import annotations

import numpy as np
import pytest

from clinical_data_platform_spark.operators.jpegcodec import (
    JPEG_SIGN,
    ZZ_INDEX,
    _BitReader,
    _BitWriter,
    _q_chroma,
    _q_luma,
    decode_jpeg,
    encode_baseline,
    expected_image_pixels,
    synth_jpeg,
)


def test_roundtrip_exact_all_seed_classes():
    """Every (seed class, sampling parity) combination decodes to the
    closed-form integer pixels — 97 md5 classes x {4:2:0, 4:4:4}. The
    float IDCT's pre-round values sit ~1e-12 from exact integers by
    construction, so exactness here is the margin test."""
    for doc_id in range(194):
        rgb = decode_jpeg(synth_jpeg(doc_id))
        exp = expected_image_pixels(doc_id)
        assert rgb.shape == (*exp.shape, 3)
        assert (rgb[:, :, 0].astype(np.int64) == exp).all(), doc_id
        assert (rgb[:, :, 1] == rgb[:, :, 0]).all(), doc_id  # neutral chroma
        assert (rgb[:, :, 2] == rgb[:, :, 0]).all(), doc_id
        assert exp.min() >= 72 and exp.max() <= 184  # no clamp in range


def test_byte_stuffing_roundtrip():
    """0xFF in the entropy stream must be stuffed on write and
    unstuffed on read (the fixtures happen not to produce one, so this
    pins the path directly)."""
    w = _BitWriter()
    w.write(0xFF, 8)
    w.write(0xFF, 8)
    w.write(0x0, 4)  # force a pad
    out = w.flush()
    assert out == b"\xff\x00\xff\x00\x0f"
    r = _BitReader(out)
    assert r.read_bits(8) == 0xFF
    assert r.read_bits(8) == 0xFF
    assert r.read_bits(4) == 0


def test_zrl_and_eob_paths():
    """A lone (4,4) coefficient sits 38 zigzag zeros after the DC — two
    ZRLs plus the run remainder; trailing zeros then need an EOB. Both
    paths must reconstruct exactly."""
    assert ZZ_INDEX[(4, 4)] == 39
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[0, 0] = 3
    coef[4, 4] = 5
    rgb = decode_jpeg(
        encode_baseline([coef], 8, 8, "444", _q_luma(), _q_chroma())
    )
    k = 2  # _Q_LIVE / 8
    exp = np.array(
        [
            [k * (3 + 5 * JPEG_SIGN[x] * JPEG_SIGN[y]) + 128 for x in range(8)]
            for y in range(8)
        ]
    )
    assert (rgb[:, :, 0].astype(np.int64) == exp).all()


def _coef(c0, c1, c2, c3):
    coef = np.zeros((8, 8), dtype=np.int64)
    coef[0, 0], coef[0, 4], coef[4, 0], coef[4, 4] = c0, c1, c2, c3
    return coef


def _exp(c0, c1, c2, c3):
    k = 2  # _Q_LIVE / 8
    return np.array(
        [
            [
                k
                * (
                    c0
                    + c1 * JPEG_SIGN[x]
                    + c2 * JPEG_SIGN[y]
                    + c3 * JPEG_SIGN[x] * JPEG_SIGN[y]
                )
                + 128
                for x in range(8)
            ]
            for y in range(8)
        ]
    )


def test_422_sampling_roundtrip():
    """4:2:2 (2 Y blocks per MCU, horizontal-only chroma upsample) —
    the third sampling layout the decoder's generic MCU walk supports."""
    blocks = [_coef(3, -2, 5, 1), _coef(-4, 6, 0, -7)]
    rgb = decode_jpeg(
        encode_baseline(blocks, 16, 8, "422", _q_luma(), _q_chroma())
    )
    assert rgb.shape == (8, 16, 3)
    exp = np.hstack([_exp(3, -2, 5, 1), _exp(-4, 6, 0, -7)])
    assert (rgb[:, :, 0].astype(np.int64) == exp).all()


def test_restart_interval_roundtrip():
    """DRI/RSTn: byte realignment and DC-predictor reset at every
    restart boundary must reconstruct exactly; the markers must actually
    be on the wire."""
    blocks = [_coef(c, c - 3, 0, 2) for c in (-7, -1, 4, 7)]
    data = encode_baseline(
        blocks, 8, 32, "444", _q_luma(), _q_chroma(), restart_interval=1
    )
    assert any(
        bytes([0xFF, 0xD0 + i]) in data for i in range(8)
    ), "no RSTn emitted"
    rgb = decode_jpeg(data)
    assert rgb.shape == (32, 8, 3)
    exp = np.vstack([_exp(c, c - 3, 0, 2) for c in (-7, -1, 4, 7)])
    assert (rgb[:, :, 0].astype(np.int64) == exp).all()


def test_non_baseline_rejected():
    """Progressive (SOF2) must raise ValueError — that is the dispatch
    contract that routes exotic profiles to the PIL fallback."""
    data = bytearray(synth_jpeg(1))
    sof = data.find(b"\xff\xc0")
    assert sof > 0
    data[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_corrupt_payload_becomes_row(spark):
    """A truncated JPEG must surface as a decode_error ROW through the
    Arrow plumbing, never a task failure."""
    import pyspark.sql.functions as F

    from clinical_data_platform_spark.operators.multimodal import (
        decode_image_fingerprint,
    )

    good = synth_jpeg(0)
    payloads = spark.createDataFrame(
        [(0, bytearray(good), "image/jpeg"),
         (1, bytearray(good[: len(good) // 2]), "image/jpeg")],
        "doc_id long, payload binary, media_type string",
    )
    rows = {r["doc_id"]: r for r in decode_image_fingerprint(payloads).collect()}
    assert rows[0]["decode_error"] is None and rows[0]["width"] == 16
    assert rows[1]["decode_error"] is not None and rows[1]["width"] is None
    # dispatch: sniff + decode through the generic image path too
    from clinical_data_platform_spark.operators.multimodal import decode_image

    ok = decode_image(payloads.filter(F.col("doc_id") == 0)).collect()[0]
    assert ok["media_type"] == "image/jpeg" and ok["sum_r"] == ok["sum_g"]
