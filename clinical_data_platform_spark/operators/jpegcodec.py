"""Dependency-free baseline JPEG codec (ITU-T T.81 sequential DCT,
8-bit, Huffman).

Closes the last PIL gate from the r7 verdict (item 5): BMP/PPM/PNG decode
natively (operators/imagecodec.py); JPEG fell back to PIL, absent in this
container. This module implements the real baseline pipeline both ways:

- ``decode_jpeg``: marker parse (DQT/SOF0/DHT/DRI/SOS, APPn/COM skip),
  DHT canonical-Huffman construction (Annex C), entropy decode with
  0xFF00 byte unstuffing, restart markers (RSTn with byte realignment +
  DC predictor reset), DC prediction, AC run/size + ZRL/EOB, zigzag,
  dequantization, full float64 2-D IDCT, 4:2:0 / 4:2:2 / 4:4:4 chroma
  upsampling, YCbCr->RGB (CCIR 601 floats) with round + clamp.
  Non-baseline profiles (progressive SOF2, arithmetic, 12-bit) raise
  ValueError so the dispatch in imagecodec.decode_rgb can fall back to
  PIL where it exists.
- ``encode_baseline``: the matching writer — DQT/SOF0/DHT/SOS plus the
  entropy-coded segment with byte stuffing — used by the oracle fixture
  generator (multimodal.synth_jpeg_payloads).

VALUE-EXACT ORACLE STRATEGY (same discipline as the PNG codec, adapted
to a lossy format): the fixture is constructed in the COEFFICIENT
domain. Quantized coefficients live only at (v,u) in {(0,0),(0,4),
(4,0),(4,4)}, whose 2-D IDCT basis products are EXACTLY +-1/8 (the u=4
cosines are +-sqrt(2)/2 and pair into rational products), and the
corresponding quantizer entries are multiples of 8 — so every decoded
pixel is an exact integer, reproducible in DuckDB with pure integer
math: pixel(y,x) = (q/8)*(c0 + c1*s(x) + c2*s(y) + c3*s(x)*s(y)) + 128
with sign s(t) = +1 for t in {0,3,4,7}, -1 otherwise. The decoder still
runs the GENERIC float64 IDCT; on these inputs its pre-round values sit
within ~1e-12 of integers (never near a .5 boundary), so the float path
is deterministic across hosts. Chroma coefficients are all zero ->
Cb = Cr = 128 exactly -> R = G = B = Y exactly through the float color
convert. Huffman decode, zigzag, dequant, MCU interleave, upsample and
color conversion all sit on the value path.

The DHT tables are generated canonical tables (incomplete Kraft sums,
so the all-ones codeword is never assigned — the padding-safety property
Annex C recommends). The bytes on the wire are spec-conformant baseline
JFIF; the decoder reads the tables from the stream, never from shared
constants.

Public references: ITU-T T.81 (JPEG), Annex C (Huffman table
generation), Annex F (sequential decode procedures).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- zigzag

def _zigzag_order() -> list[tuple[int, int]]:
    """Standard zigzag scan as (v, u) pairs, index 0..63."""
    out: list[tuple[int, int]] = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        # even diagonals run bottom-left -> top-right (v decreasing)
        for v in (reversed(rng) if d % 2 == 0 else rng):
            out.append((v, d - v))
    return out


ZIGZAG: list[tuple[int, int]] = _zigzag_order()
ZZ_INDEX: dict[tuple[int, int], int] = {vu: i for i, vu in enumerate(ZIGZAG)}

# ------------------------------------------------------------ IDCT basis

def _idct_matrix() -> np.ndarray:
    """A[u, x] = alpha(u) * cos((2x+1) u pi / 16); spatial = A.T @ C @ A."""
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        alpha = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            a[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _idct_matrix()


def idct2(coef: np.ndarray) -> np.ndarray:
    """Generic float64 2-D inverse DCT of an 8x8 dequantized block
    (coef[v, u]); returns spatial float64 values (pre level-shift)."""
    return _A.T @ coef @ _A


# -------------------------------------------------- canonical Huffman

def _canonical_tables(
    lengths: dict[int, int],
) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """JPEG Annex C canonical code assignment from {symbol: length}.

    Returns (BITS[16], HUFFVAL, {symbol: (code, length)}). Symbols are
    ordered by (length, symbol value) — deterministic, and exactly the
    order the DHT segment serializes."""
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    bits = [0] * 16
    huffval: list[int] = []
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for sym, ln in ordered:
        if not 1 <= ln <= 16:
            raise ValueError(f"code length {ln} out of range")
        code <<= ln - prev_len
        codes[sym] = (code, ln)
        code += 1
        prev_len = ln
        bits[ln - 1] += 1
        huffval.append(sym)
    return bits, huffval, codes


def _decode_table(
    bits: list[int], huffval: list[int]
) -> dict[tuple[int, int], int]:
    """{(length, code): symbol} lookup built exactly per Annex C."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


# Encoder-side tables. DC: size categories 0..11; AC: EOB, ZRL and
# (run, size) for run 0..15, size 1..10. Length assignment keeps every
# Kraft sum strictly below 1 (the all-ones code stays unassigned).
def _dc_lengths() -> dict[int, int]:
    return {s: (2 if s <= 2 else s) for s in range(12)}  # 2,2,2,3..11


def _ac_lengths() -> dict[int, int]:
    lens: dict[int, int] = {0x00: 2, 0xF0: 6}  # EOB, ZRL
    for run in range(16):
        for size in range(1, 11):
            sym = (run << 4) | size
            # run-0 small sizes shortest; everything else in a flat band
            lens[sym] = 4 + (size - 1 if run == 0 and size <= 4 else 6)
    return lens


# ----------------------------------------------------------- bit I/O

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy segment truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("dangling 0xFF in entropy segment")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{marker:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bits(1)
            if (ln, code) in table:
                return table[(ln, code)]
        raise ValueError("invalid Huffman code in scan")

    def sync_restart(self) -> None:
        """Discard pad bits to the byte boundary and consume one RSTn
        marker (T.81 F.2.1.3.1; DC predictors reset by the caller)."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or not 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(v: int, size: int) -> int:
    """Annex F.2.2.1 magnitude extension."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


# ------------------------------------------------------------- encoder

_SAMPLING_HV = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_baseline(
    y_blocks: list[np.ndarray],
    width: int,
    height: int,
    sampling: str,
    q_luma: np.ndarray,
    q_chroma: np.ndarray,
    restart_interval: int = 0,
) -> bytes:
    """Serialize QUANTIZED luma coefficient blocks (8x8 int arrays,
    C[v, u]) as a baseline JFIF with all-zero chroma. ``sampling`` is
    "444" (1 MCU = Y,Cb,Cr 1:1:1), "422" (2 Y + Cb + Cr) or "420"
    (4 Y + Cb + Cr). The block list is MCU scan order. A nonzero
    ``restart_interval`` emits a DRI segment and RSTn markers every
    that-many MCUs (byte-aligned, DC predictors reset — T.81 F.1.2.3)."""
    if sampling not in _SAMPLING_HV:
        raise ValueError(sampling)
    hv_y = _SAMPLING_HV[sampling]

    dc_bits, dc_val, dc_codes = _canonical_tables(_dc_lengths())
    ac_bits, ac_val, ac_codes = _canonical_tables(_ac_lengths())

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tq, q in ((0, q_luma), (1, q_chroma)):
        zz = bytes(int(q[v, u]) for (v, u) in ZIGZAG)
        seg(0xDB, bytes([tq]) + zz)  # DQT, 8-bit precision

    comp = b"".join(
        bytes([cid, (h << 4) | v, tq])
        for cid, (h, v), tq in (
            (1, hv_y, 0),
            (2, (1, 1), 1),
            (3, (1, 1), 1),
        )
    )
    seg(0xC0, struct.pack(">BHHB", 8, height, width, 3) + comp)  # SOF0

    def dht(tc: int, th: int, bits: list[int], val: list[int]) -> None:
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(val))

    dht(0, 0, dc_bits, dc_val)  # DC luma
    dht(1, 0, ac_bits, ac_val)  # AC luma
    dht(0, 1, dc_bits, dc_val)  # DC chroma (same generated table)
    dht(1, 1, ac_bits, ac_val)  # AC chroma

    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))  # DRI

    seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )  # SOS: Y uses tables 0/0, chroma 1/1

    w = _BitWriter()

    def put(codes: dict[int, tuple[int, int]], sym: int) -> None:
        code, ln = codes[sym]
        w.write(code, ln)

    def encode_block(coef: np.ndarray, pred: int) -> int:
        dc = int(coef[0, 0])
        diff = dc - pred
        s = _size_cat(diff)
        put(dc_codes, s)
        if s:
            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        for idx in range(1, 64):
            v, u = ZIGZAG[idx]
            c = int(coef[v, u])
            if c == 0:
                run += 1
                continue
            while run > 15:
                put(ac_codes, 0xF0)  # ZRL
                run -= 16
            s = _size_cat(c)
            put(ac_codes, (run << 4) | s)
            w.write(c if c >= 0 else c + (1 << s) - 1, s)
            run = 0
        if run:
            put(ac_codes, 0x00)  # EOB
        return dc

    zero = np.zeros((8, 8), dtype=np.int64)
    blocks_per_mcu = hv_y[0] * hv_y[1]
    n_mcus = len(y_blocks) // blocks_per_mcu
    pred_y = pred_cb = pred_cr = 0
    bi = 0
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            # byte-align (1-pad), emit RSTn, reset DC predictors
            out.extend(w.flush())
            w = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + ((m // restart_interval) - 1) % 8]))
            pred_y = pred_cb = pred_cr = 0
        for _ in range(blocks_per_mcu):
            pred_y = encode_block(y_blocks[bi], pred_y)
            bi += 1
        pred_cb = encode_block(zero, pred_cb)
        pred_cr = encode_block(zero, pred_cr)
    out.extend(w.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline sequential decode -> (h, w, 3) uint8 RGB. Restart
    intervals (DRI/RSTn) are fully supported; raises ValueError on
    non-baseline profiles (progressive, arithmetic, 12-bit) and
    malformed streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps)
    scan = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                q = np.zeros((8, 8), dtype=np.int64)
                for i, (v, u) in enumerate(ZIGZAG):
                    q[v, u] = body[b + 1 + i]
                qtabs[tq] = q
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                huffval = list(body[b + 17 : b + 17 + n])
                htabs[(tc, th)] = _decode_table(bits, huffval)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline SOF 0x{marker:02X}")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scomps = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F)
                for i in range(ns)
            ]
            scan = (scomps, pos)
            break
        # APPn / COM and anything else: skipped
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")

    h, w, comps = frame
    scomps, entropy_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # strip the trailing EOI before handing bytes to the bit reader
    end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[entropy_start : end if end > 0 else len(data)])

    planes: dict[int, np.ndarray] = {}
    for cid, hc, vc, _tq in comps:
        planes[cid] = np.zeros(
            (mcus_y * vc * 8, mcus_x * hc * 8), dtype=np.float64
        )
    td_ta = {cid: (td, ta) for cid, td, ta in scomps}
    preds = {cid: 0 for cid, *_ in comps}

    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and (
                mcu_index % restart_interval == 0
            ):
                reader.sync_restart()
                for cid in preds:
                    preds[cid] = 0
            mcu_index += 1
            for cid, hc, vc, tq in comps:
                td, ta = td_ta[cid]
                dct = htabs[(0, td)]
                act = htabs[(1, ta)]
                for bv in range(vc):
                    for bh in range(hc):
                        coef = np.zeros((8, 8), dtype=np.int64)
                        s = reader.read_symbol(dct)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[cid] += diff
                        coef[0, 0] = preds[cid]
                        idx = 1
                        while idx < 64:
                            sym = reader.read_symbol(act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:  # ZRL
                                idx += 16
                                continue
                            idx += run
                            if idx > 63:
                                raise ValueError("AC index overflow")
                            v, u = ZIGZAG[idx]
                            coef[v, u] = _extend(
                                reader.read_bits(size), size
                            )
                            idx += 1
                        spatial = idct2(
                            coef.astype(np.float64) * qtabs[tq]
                        )
                        y0 = (my * vc + bv) * 8
                        x0 = (mx * hc + bh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = spatial

    # level shift, upsample, color convert
    full = []
    for cid, hc, vc, _tq in comps:
        p = planes[cid] + 128.0
        p = np.repeat(np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        yp = np.clip(np.floor(full[0] + 0.5), 0, 255)
        return np.stack([yp] * 3, axis=2).astype(np.uint8)
    yp, cb, cr = full
    r = yp + 1.402 * (cr - 128.0)
    g = yp - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = yp + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


# ------------------------------------------------- oracle fixture synth

# Quantizer values for the four live coefficient positions — multiples
# of 8 so (q/8) stays integral and every decoded pixel is exact (module
# docstring). The remaining entries multiply zero coefficients; filled
# with a plausible ramp so the table on the wire looks ordinary.
_Q_LIVE = 16


def _q_luma() -> np.ndarray:
    q = np.clip(np.arange(64).reshape(8, 8) * 2 + 10, 1, 255).astype(np.int64)
    for v, u in ((0, 0), (0, 4), (4, 0), (4, 4)):
        q[v, u] = _Q_LIVE
    return q


def _q_chroma() -> np.ndarray:
    return np.full((8, 8), 24, dtype=np.int64)


JPEG_SIGN = [1, -1, -1, 1, 1, -1, -1, 1]  # cos((2t+1)pi/4) signs


def jpeg_coefs(doc_id: int, block: int, seed_mod: int = 97) -> list[int]:
    """The four md5-derived quantized coefficients (c0..c3) of a Y
    block — byte i of md5(f"{seed}:jpg:{block}") mapped to (byte % 15)
    - 7, range [-7, 7]. Mirrored byte-for-byte in the DuckDB oracle."""
    import hashlib

    digest = hashlib.md5(
        f"{int(doc_id) % seed_mod}:jpg:{block}".encode()
    ).digest()
    return [(digest[i] % 15) - 7 for i in range(4)]


def expected_block_pixels(coefs: list[int]) -> np.ndarray:
    """Closed-form exact pixels of one synthesized Y block: the integer
    arithmetic the DuckDB oracle replays (codec-independent)."""
    c0, c1, c2, c3 = coefs
    k = _Q_LIVE // 8
    px = np.zeros((8, 8), dtype=np.int64)
    for y in range(8):
        for x in range(8):
            px[y, x] = (
                k
                * (
                    c0
                    + c1 * JPEG_SIGN[x]
                    + c2 * JPEG_SIGN[y]
                    + c3 * JPEG_SIGN[x] * JPEG_SIGN[y]
                )
                + 128
            )
    return px


def synth_jpeg(doc_id: int, seed_mod: int = 97) -> bytes:
    """Deterministic spec-conformant baseline JPEG for one id. Even ids:
    16x16 4:2:0 (one MCU, 4 Y blocks); odd ids: 8x8 4:4:4. Chroma blocks
    all-zero (neutral 128 -> exact grayscale through the color
    convert)."""
    sampling = "420" if doc_id % 2 == 0 else "444"
    n_blocks = 4 if sampling == "420" else 1
    size = 16 if sampling == "420" else 8
    blocks = []
    for b in range(n_blocks):
        c = jpeg_coefs(doc_id, b, seed_mod)
        coef = np.zeros((8, 8), dtype=np.int64)
        coef[0, 0] = c[0]
        coef[0, 4] = c[1]
        coef[4, 0] = c[2]
        coef[4, 4] = c[3]
        blocks.append(coef)
    return encode_baseline(blocks, size, size, sampling, _q_luma(), _q_chroma())


def expected_image_pixels(doc_id: int, seed_mod: int = 97) -> np.ndarray:
    """Exact full-image gray plane for one synthesized id (block layout:
    420 MCU order is Y00 Y01 Y10 Y11)."""
    if doc_id % 2 == 0:
        img = np.zeros((16, 16), dtype=np.int64)
        for b in range(4):
            by, bx = divmod(b, 2)
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                expected_block_pixels(jpeg_coefs(doc_id, b, seed_mod))
            )
        return img
    return expected_block_pixels(jpeg_coefs(doc_id, 0, seed_mod))
