"""Dependency-free image codec tests (BMP/PPM round-trips, layout traps,
graceful decode errors) plus the Spark decode path. The oracle gate
(image_decode_stats / image_ahash_dedup_pairs) separately proves the
decoded VALUES against DuckDB's md5 recomputation."""

from __future__ import annotations

import numpy as np
import pytest

from clinical_data_platform_spark.operators.imagecodec import (
    ahash_bits,
    ahash_hex,
    decode_bmp,
    decode_ppm,
    decode_rgb,
    encode_bmp,
    encode_ppm,
    sniff_format,
)


def rng_img(h, w, seed=7):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (5, 3), (1, 1), (16, 7), (3, 10)])
def test_bmp_roundtrip_all_padding_classes(shape):
    """w=3,7,10 exercise every row-padding remainder (w*3 mod 4)."""
    img = rng_img(*shape)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("shape", [(8, 8), (2, 5), (1, 1)])
def test_ppm_roundtrip(shape):
    img = rng_img(*shape)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_whitespace():
    img = rng_img(2, 2)
    data = b"P6 # comment\n# full comment line\n 2\t2 # sizes\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(data), img)


def test_bmp_layout_is_bottom_up_bgr():
    """Pin the on-disk layout independently of the decoder: first body
    byte = BLUE of the BOTTOM-LEFT pixel."""
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[1, 0] = (10, 20, 30)  # bottom-left RGB
    data = encode_bmp(img)
    assert data[54] == 30 and data[55] == 20 and data[56] == 10


def test_decode_errors_are_valueerrors():
    with pytest.raises(ValueError):
        decode_bmp(b"BMshort")
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 100)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 12)  # grayscale PGM
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")  # truncated body


def test_sniff_and_dispatch():
    img = rng_img(3, 3)
    assert sniff_format(encode_bmp(img)) == "image/bmp"
    assert sniff_format(encode_ppm(img)) == "image/x-portable-pixmap"
    assert np.array_equal(decode_rgb(encode_bmp(img)), img)
    assert np.array_equal(decode_rgb(encode_ppm(img)), img)
    with pytest.raises(ValueError):
        decode_rgb(b"\xff\xd8\xff rest-of-a-jpeg")  # no PIL in container


def test_ahash_matches_naive_reference():
    img = rng_img(8, 8, seed=42)
    g = img.astype(int).sum(axis=2).ravel()
    expect = (g * g.size >= g.sum()).astype(int)
    assert list(ahash_bits(img)) == list(expect)
    # hex packs bit 0 as the MSB of the first byte
    hx = ahash_hex(img)
    assert len(hx) == 16
    first_byte = int(hx[:2], 16)
    assert (first_byte >> 7) & 1 == expect[0]


def test_ahash_invariance_and_sensitivity():
    img = rng_img(8, 8, seed=1)
    # brightness scaling preserves each bit's comparison direction only
    # in expectation — but an IDENTICAL image always matches itself
    assert ahash_hex(img) == ahash_hex(img.copy())
    flipped = img.copy()
    flipped[0, 0] = 255 - flipped[0, 0]
    # recompute the naive reference for the MODIFIED image: the hash must
    # track the change exactly (both the bitstring and its hex packing),
    # and the change must actually move at least one bit vs the original
    g = flipped.astype(int).sum(axis=2).ravel()
    expect_flipped = list((g * g.size >= g.sum()).astype(int))
    assert list(ahash_bits(flipped)) == expect_flipped
    g0 = img.astype(int).sum(axis=2).ravel()
    expect_orig = list((g0 * g0.size >= g0.sum()).astype(int))
    assert expect_flipped != expect_orig, "fixture must actually flip a bit"
    assert ahash_hex(flipped) != ahash_hex(img)


def test_spark_decode_image_emits_error_rows(spark):
    """Corrupt payloads become decode_error ROWS (job survives)."""
    import pandas as pd

    from clinical_data_platform_spark.operators.multimodal import decode_image

    img = rng_img(4, 4)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [encode_bmp(img), b"garbage-bytes", encode_ppm(img)],
            "media_type": ["image/bmp", "application/octet-stream",
                           "image/x-portable-pixmap"],
        }
    )
    out = decode_image(spark.createDataFrame(pdf)).orderBy("doc_id").collect()
    assert out[0]["decode_error"] is None and out[0]["width"] == 4
    assert out[1]["decode_error"] is not None and out[1]["sum_r"] is None
    assert out[2]["decode_error"] is None
    exp = img.astype("int64").sum(axis=(0, 1))
    assert (out[0]["sum_r"], out[0]["sum_g"], out[0]["sum_b"]) == tuple(exp)
    assert (out[2]["sum_r"], out[2]["sum_g"], out[2]["sum_b"]) == tuple(exp)


def test_spark_image_ahash_emits_error_rows(spark):
    """image_ahash mirrors decode_image's corrupt-payload policy: a bad
    payload becomes a null-hash row carrying decode_error, and the batch
    survives (was: exception propagated out of mapInPandas)."""
    import pandas as pd

    from clinical_data_platform_spark.operators.multimodal import image_ahash

    img = rng_img(8, 8, seed=7)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [encode_ppm(img), b"not-an-image"],
            "media_type": ["image/x-portable-pixmap", "application/octet-stream"],
        }
    )
    out = image_ahash(spark.createDataFrame(pdf)).orderBy("doc_id").collect()
    g = img.astype(int).sum(axis=2).ravel()
    expect = "".join(str(b) for b in (g * g.size >= g.sum()).astype(int))
    assert out[0]["ahash_bits"] == expect and out[0]["decode_error"] is None
    assert out[1]["ahash_bits"] is None and out[1]["ahash_hex"] is None
    assert out[1]["decode_error"] is not None

# --- baseline PNG codec ------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(8, 8), (5, 3), (1, 1), (16, 7)])
def test_png_roundtrip_every_filter_type(shape, ftype):
    """Every PNG row filter (None/Sub/Up/Average/Paeth) must reconstruct
    exactly, across widths (bpp-offset edge at w=1) and heights (Up/Paeth
    first-row zero-prior edge)."""
    from clinical_data_platform_spark.operators.imagecodec import (
        decode_png,
        encode_png,
    )

    img = rng_img(*shape, seed=11)
    data = encode_png(img, filter_type=ftype)
    assert sniff_format(data) == "image/png"
    assert np.array_equal(decode_png(data), img)
    # decode_rgb dispatches PNG natively (no PIL in this container)
    assert np.array_equal(decode_rgb(data), img)


def test_png_rgba_alpha_dropped():
    """Color type 6 (truecolor+alpha) decodes with the alpha dropped."""
    import struct
    import zlib

    from clinical_data_platform_spark.operators.imagecodec import (
        PNG_SIG,
        _png_chunk,
        decode_png,
    )

    img = rng_img(4, 6, seed=2)
    rgba = np.concatenate(
        [img, np.full((4, 6, 1), 128, np.uint8)], axis=2
    )
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    data = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_error_paths():
    """Corrupt CRC, unsupported profiles, and truncation all raise
    ValueError (the decode_error-row contract), never crash."""
    import struct
    import zlib

    from clinical_data_platform_spark.operators.imagecodec import (
        PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    img = rng_img(4, 4, seed=3)
    good = encode_png(img)

    flipped = bytearray(good)
    flipped[-6] ^= 0xFF  # inside IEND/CRC tail
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))

    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(4))
    for ihdr in (
        struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0),  # 16-bit
        struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0),   # palette
        struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1),   # Adam7
    ):
        data = (
            PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(data)

    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n" + b"junk")


def test_synth_payload_format_rotation(spark):
    """The shared fixture rotates BMP/PPM/PNG by doc_id % 3 and decodes
    to identical pixels regardless of format."""
    import pandas as pd

    from clinical_data_platform_spark.operators.multimodal import (
        decode_image,
        synth_image_payloads,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(6))})
    )
    rows = synth_image_payloads(df, "doc_id").orderBy("doc_id").collect()
    assert [r.media_type for r in rows] == [
        "image/bmp", "image/x-portable-pixmap", "image/png",
        "image/bmp", "image/x-portable-pixmap", "image/png",
    ]
    out = decode_image(
        synth_image_payloads(df, "doc_id")
    ).orderBy("doc_id").collect()
    assert all(r.decode_error is None for r in out)
    # ids 97 apart share a seed class -> identical sums across formats;
    # here: same id mod 97, different formats by construction is not
    # available in 0..5, so assert sums match a direct recompute instead
    import hashlib

    for r in out:
        raw = b"".join(
            hashlib.md5(f"{r.doc_id % 97}:{b}".encode()).digest()
            for b in range(12)
        )[:192]
        px = np.frombuffer(raw, dtype=np.uint8).reshape(8, 8, 3)
        s = px.astype("int64").sum(axis=(0, 1))
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(s)


def test_truncated_jpeg_always_valueerror():
    """r8 ADVICE: truncated/malformed JPEG streams can raise
    IndexError/struct.error/KeyError from the marker parser; the decode_rgb
    dispatch must route ALL of them to the documented ValueError diagnosis
    (or PIL fallback), never leak a raw parser exception."""
    from clinical_data_platform_spark.operators.imagecodec import decode_rgb
    from clinical_data_platform_spark.operators.jpegcodec import synth_jpeg

    data = synth_jpeg(0)
    for cut in (3, 4, 10, 21, 40, 80, len(data) // 2):
        try:
            decode_rgb(data[:cut])
        except ValueError:
            pass  # the documented failure type
        except Exception as err:  # PIL-equipped envs may surface PIL's own
            assert type(err).__module__.startswith("PIL"), (
                f"cut={cut}: raw {type(err).__name__} leaked past dispatch"
            )
