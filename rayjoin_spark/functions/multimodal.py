"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow-batched pandas iterators.

All three media kinds now have REAL decoders with zero external deps:
IMAGE is a pure-stdlib PNG codec (zlib inflate + scanline unfiltering,
8-bit gray/RGB/RGBA) plus a baseline-DCT JPEG decoder (ITU-T T.81 marker
+ canonical-Huffman entropy parse; channel means exactly from the DC
coefficients; progressive raises), both parsing width/height and
per-channel means; AUDIO is
a stdlib RIFF/WAVE parser (PCM16) extracting sample rate, channel count,
frame count and per-channel means; VIDEO is a YUV4MPEG2 (.y4m) parser —
text header + raw planar 4:2:0 frames — extracting dimensions, frame
count, frame rate and per-plane (Y/U/V) means, plus a frame-sampling op
(`sample_video_frames`). Unrecognized payloads fall back to the
clearly-marked deterministic digest feature (`_decode_stub`): the
Spark-side contract — schema, batch shape, partition sizing, UDF
signature — is identical either way, so swapping in ffmpeg for compressed
containers keeps every plan unchanged.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media row schema: payload stays opaque; metadata is typed
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, feature array<float>, "
    "decode_ok boolean, decoder string, error string"
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit)


# ------------------------------------------------------------------ PNG
def encode_png(width: int, height: int, pixels: list[list[tuple]]) -> bytes:
    """Minimal RGB PNG encoder (filter 0 rows) for fixtures/round-trips."""
    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes(v for px in row for v in px) for row in pixels
    )
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Scalar Paeth predictor (spec reference + fixture encoding in tests;
    the decoder uses the vectorized np.where form)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, list[float]]:
    """Parse a (8-bit gray/RGB/RGBA, non-interlaced) PNG entirely with the
    stdlib + NumPy: returns (width, height, n_channels, per-channel means).

    Unfiltering is vectorized: Sub is a per-channel cumulative sum mod 256,
    Up is one vector add; Average/Paeth carry a true scanline dependency so
    they loop over pixels but stay vectorized across channels — no per-byte
    Python loop anywhere. Malformed input raises ValueError (the caller's
    degrade-to-error-row contract)."""
    if not data.startswith(PNG_SIG):
        raise ValueError("not a PNG")
    pos, idat = len(PNG_SIG), b""
    width = height = bitdepth = colortype = None
    while pos + 8 <= len(data):
        (ln,), tag = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("bad IHDR")
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bitdepth != 8 or colortype not in _CHANNELS or interlace:
                raise ValueError(f"unsupported PNG (depth={bitdepth} ct={colortype})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR")
    if width == 0 or height == 0:
        raise ValueError("empty image")
    ch = _CHANNELS[colortype]
    stride = width * ch
    raw = zlib.decompress(idat)
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline data")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    fts = rows[:, 0]
    sums = np.zeros(ch, dtype=np.int64)
    prev = np.zeros((width, ch), dtype=np.int64)
    for y in range(height):
        ft = int(fts[y])
        px = rows[y, 1:].astype(np.int64).reshape(width, ch)
        if ft == 0:
            line = px
        elif ft == 1:  # Sub: decoded = running sum of raw bytes, mod 256
            line = np.cumsum(px, axis=0) & 0xFF
        elif ft == 2:  # Up
            line = (px + prev) & 0xFF
        elif ft == 3:  # Average
            line = np.empty_like(px)
            left = np.zeros(ch, dtype=np.int64)
            for k in range(width):
                left = (px[k] + ((left + prev[k]) >> 1)) & 0xFF
                line[k] = left
        elif ft == 4:  # Paeth
            line = np.empty_like(px)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for k in range(width):
                up = prev[k]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                left = (px[k] + pred) & 0xFF
                line[k] = left
                ul = up
        else:
            raise ValueError(f"bad filter {ft}")
        sums += line.sum(axis=0)
        prev = line
    n_px = width * height
    return width, height, ch, [float(s) / n_px / 255.0 for s in sums]


# ------------------------------------------------------------------ JPEG
# Baseline-DCT JPEG (ITU-T T.81 / JFIF), stdlib + NumPy only. The
# decoder parses markers, canonical Huffman tables and the interleaved
# entropy stream; per-channel means come EXACTLY from the DC
# coefficients (every AC basis function of the 8x8 IDCT has zero mean,
# so a block's pixel mean is DC*q0/8 + 128 — no IDCT needed for the
# feature contract). Means are over the coded block grid, which equals
# the image for MCU-aligned dims (all fixtures are). The encoder exists
# for deterministic fixtures: 4:4:4 (or grayscale), Annex K quantization
# and Huffman tables, orthonormal-matrix FDCT.

JPEG_SIG = b"\xff\xd8"

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# T.81 Annex K.1 quantization tables (zigzag order when emitted)
_QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_QT_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]
# T.81 Annex K.3 typical Huffman tables: (bits[1..16], values)
_HT_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _huff_canonical(bits, values):
    """(bits, values) -> {(length, code): symbol} canonical table."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_codes(bits, values):
    """(bits, values) -> {symbol: (length, code)} for the encoder."""
    return {v: k for k, v in _huff_canonical(bits, values).items()}


class _BitReader:
    """MSB-first reader over entropy-coded data; 0xFF00 unstuffing done
    by the caller (segments are split at RST markers before reading)."""

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("jpeg: entropy stream truncated")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def decode_jpeg(data: bytes) -> tuple[int, int, int, list[float]]:
    """Baseline-DCT JPEG -> (width, height, n_components, per-component
    means in [0,1], YCbCr order as coded). Only SOF0 (baseline) is
    supported; progressive/arithmetic — and ANY malformed stream — raise
    ValueError (the caller's degrade-to-error-row contract; low-level
    KeyError/IndexError/ZeroDivisionError from truncated or inconsistent
    segments are normalized here so they cannot escape the contract and
    fail a whole Spark task). Means are exact over the coded block grid
    (DC-only identity, see section comment)."""
    try:
        return _decode_jpeg(data)
    except (KeyError, IndexError, ZeroDivisionError) as e:
        raise ValueError(
            f"jpeg: malformed stream ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg(data: bytes) -> tuple[int, int, int, list[float]]:
    if not data.startswith(JPEG_SIG):
        raise ValueError("not a JPEG")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = None
    restart = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD8:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq:
                    vals = list(struct.unpack(f">{64}H", body[i:i + 128]))
                    i += 128
                else:
                    vals = list(body[i:i + 64])
                    i += 64
                qt[tq] = vals  # zigzag order; [0] is the DC quantizer
        elif marker in (0xC0, 0xC1):  # SOF0/1 (baseline)
            _, h, w, nc = struct.unpack(">BHHB", body[:6])
            if w == 0 or h == 0:
                raise ValueError("jpeg: zero dimension (DNL not supported)")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"jpeg: unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                values = list(body[i + 17:i + 17 + n])
                huff[(tc, th)] = _huff_canonical(bits, values)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if comps is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = body[0]
            sel = {}
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                sel[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                data, pos, w, h, comps, sel, qt, huff, restart
            )
        # all other segments (APPn, COM, ...) are skipped
    raise ValueError("jpeg: no SOS marker")


def _decode_scan(data, pos, w, h, comps, sel, qt, huff, restart):
    """Entropy-decode the single interleaved baseline scan from `pos`,
    accumulating per-component DC sums (exact means)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # split entropy bytes at markers, unstuffing 0xFF00
    segments, cur = [], bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            m = data[i + 1] if i + 1 < len(data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RST
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next segment
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    dc_sum = [0] * len(comps)
    dc_n = [0] * len(comps)
    mcu_done = 0
    for seg in segments:
        if mcu_done >= n_mcu:
            break
        r = _BitReader(seg)
        pred = [0] * len(comps)
        seg_mcus = restart if restart else (n_mcu - mcu_done)
        for _ in range(min(seg_mcus, n_mcu - mcu_done)):
            for ci, c in enumerate(comps):
                tdc, tac = sel[c["id"]]
                q0 = qt[c["tq"]][0]
                for _blk in range(c["h"] * c["v"]):
                    t = r.decode_symbol(huff[(0, tdc)])
                    diff = _extend(r.read_bits(t), t)
                    pred[ci] += diff
                    dc_sum[ci] += pred[ci] * q0
                    dc_n[ci] += 1
                    k = 1
                    while k < 64:  # AC: decoded to advance the stream
                        rs = r.decode_symbol(huff[(1, tac)])
                        rl, sz = rs >> 4, rs & 0xF
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += rl + 1
                        _extend(r.read_bits(sz), sz)
            mcu_done += 1
    if mcu_done != n_mcu:
        raise ValueError(f"jpeg: decoded {mcu_done}/{n_mcu} MCUs")
    means = [
        (s / n / 8.0 + 128.0) / 255.0 for s, n in zip(dc_sum, dc_n)
    ]
    return w, h, len(comps), [float(min(max(m, 0.0), 1.0)) for m in means]


def _dct_matrix() -> "np.ndarray":
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m = c * np.sqrt(2.0 / 8.0)
    m[0, :] = np.sqrt(1.0 / 8.0)
    return m


def encode_jpeg(width: int, height: int, pixels: list[list[tuple]]) -> bytes:
    """Minimal baseline JFIF encoder for fixtures: 4:4:4 YCbCr from RGB
    tuples, Annex K quantization + typical Huffman tables, matrix FDCT.
    Deterministic byte-for-byte (pure integer/np.float64 math)."""
    rgb = np.array(pixels, dtype=np.float64).reshape(height, width, 3)
    ycc = np.empty_like(rgb)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    ycc[..., 0] = 0.299 * r + 0.587 * g + 0.114 * b
    ycc[..., 1] = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    ycc[..., 2] = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    ph, pw = -(-height // 8) * 8, -(-width // 8) * 8
    pad = np.empty((ph, pw, 3))
    pad[:height, :width] = ycc
    pad[height:, :width] = ycc[-1:, :, :]
    pad[:, width:] = pad[:, width - 1:width, :]
    m = _dct_matrix()
    qts = [np.array(_QT_LUM, dtype=np.float64).reshape(8, 8),
           np.array(_QT_CHR, dtype=np.float64).reshape(8, 8)]
    dc_codes = [_huff_codes(*_HT_DC_LUM), _huff_codes(*_HT_DC_CHR)]
    ac_codes = [_huff_codes(*_HT_AC_LUM), _huff_codes(*_HT_AC_CHR)]
    bitbuf: list[int] = []

    def put(code_len: int, code: int) -> None:
        for i in range(code_len - 1, -1, -1):
            bitbuf.append((code >> i) & 1)

    def put_val(v: int) -> tuple[int, int]:
        """magnitude category + the value bits (T.81 F.1.2.1)."""
        if v == 0:
            return 0, 0
        t = int(abs(v)).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    pred = [0, 0, 0]
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                blk = pad[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8, ci] - 128.0
                coef = m @ blk @ m.T
                q = np.round(coef / qts[ti]).astype(np.int64)
                zz = q.reshape(64)[_ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t, bits = put_val(diff)
                ln, code = dc_codes[ti][t]
                put(ln, code)
                if t:
                    put(t, bits)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_codes[ti][0xF0]
                        put(ln, code)
                        run -= 16
                    t, bits = put_val(v)
                    ln, code = ac_codes[ti][(run << 4) | t]
                    put(ln, code)
                    put(t, bits)
                    run = 0
                if run:
                    ln, code = ac_codes[ti][0x00]
                    put(ln, code)
    while len(bitbuf) % 8:
        bitbuf.append(1)  # pad with 1s (T.81 F.1.2.3)
    raw = bytearray()
    for i in range(0, len(bitbuf), 8):
        byte = 0
        for b in bitbuf[i:i + 8]:
            byte = (byte << 1) | b
        raw.append(byte)
        if byte == 0xFF:
            raw.append(0x00)  # stuffing

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(JPEG_SIG)
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(_QT_LUM[i] for i in _ZIGZAG))
    out += seg(0xDB, bytes([0x01]) + bytes(_QT_CHR[i] for i in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # 4:4:4, h=v=1
    out += seg(0xC0, sof)
    for (tc, th), (bits, vals) in (
        ((0, 0), _HT_DC_LUM), ((1, 0), _HT_AC_LUM),
        ((0, 1), _HT_DC_CHR), ((1, 1), _HT_AC_CHR),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += raw
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ WAV
def encode_wav(sample_rate: int, frames: list[tuple]) -> bytes:
    """Minimal PCM16 RIFF/WAVE writer for fixtures/round-trips; `frames`
    is a list of per-frame channel tuples of int16 samples."""
    ch = len(frames[0])
    data = b"".join(struct.pack("<" + "h" * ch, *fr) for fr in frames)
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, list[float]]:
    """Parse a PCM16 RIFF/WAVE payload with the stdlib + NumPy: returns
    (sample_rate, n_channels, n_frames, per-channel means in [-1, 1)).
    Malformed input raises ValueError (degrade-to-error-row contract,
    same as decode_png)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("bad fmt chunk")
            audio_fmt, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt} bits={bits})")
            if ch == 0:
                raise ValueError("zero channels")
            fmt = (ch, sr)
        elif tag == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    ch, sr = fmt
    n_frames = len(pcm) // (ch * 2)
    if n_frames == 0:
        raise ValueError("empty audio")
    arr = np.frombuffer(pcm[: n_frames * ch * 2], dtype="<i2").reshape(n_frames, ch)
    means = arr.astype(np.float64).mean(axis=0) / 32768.0
    return sr, ch, n_frames, [float(m) for m in means]


# ------------------------------------------------------------------ Y4M
Y4M_SIG = b"YUV4MPEG2 "
_Y4M_C420 = {"420", "420jpeg", "420mpeg2", "420paldv"}


def encode_y4m(
    width: int, height: int, fps: tuple[int, int], frames: list[tuple]
) -> bytes:
    """Minimal YUV4MPEG2 writer for fixtures/round-trips; `frames` is a
    list of (y_bytes, u_bytes, v_bytes) planar 4:2:0 planes
    (len(y) == w*h, len(u) == len(v) == (w//2)*(h//2))."""
    head = f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n"
    out = [head.encode("ascii")]
    for y, u, v in frames:
        out.append(b"FRAME\n")
        out.extend((bytes(y), bytes(u), bytes(v)))
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[int, int, int, int, int, list[float]]:
    """Parse a YUV4MPEG2 (4:2:0, 8-bit) payload with the stdlib + NumPy:
    returns (width, height, n_frames, fps_num, fps_den, per-plane Y/U/V
    means over all frames in [0, 1]). Malformed input raises ValueError
    (degrade-to-error-row contract, same as decode_png/decode_wav)."""
    if not data.startswith(Y4M_SIG):
        raise ValueError("not a Y4M stream")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated Y4M header")
    width = height = None
    fps_num, fps_den = 30, 1
    for tok in data[len(Y4M_SIG):nl].decode("ascii", "strict").split():
        tag, val = tok[0], tok[1:]
        if tag == "W":
            width = int(val)
        elif tag == "H":
            height = int(val)
        elif tag == "F":
            num, den = val.split(":")
            fps_num, fps_den = int(num), int(den)
        elif tag == "C" and val not in _Y4M_C420:
            raise ValueError(f"unsupported Y4M colorspace C{val}")
    if not width or not height or fps_num <= 0 or fps_den <= 0:
        raise ValueError("bad Y4M header")
    if width % 2 or height % 2:
        raise ValueError("4:2:0 needs even dimensions")
    y_sz, c_sz = width * height, (width // 2) * (height // 2)
    frame_sz = y_sz + 2 * c_sz
    pos, n_frames = nl + 1, 0
    sums = np.zeros(3, dtype=np.int64)
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if data[pos:pos + 5] != b"FRAME" or fnl < 0:
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + frame_sz > len(data):
            raise ValueError("truncated frame payload")
        planes = np.frombuffer(data[pos:pos + frame_sz], dtype=np.uint8)
        sums[0] += int(planes[:y_sz].sum(dtype=np.int64))
        sums[1] += int(planes[y_sz:y_sz + c_sz].sum(dtype=np.int64))
        sums[2] += int(planes[y_sz + c_sz:].sum(dtype=np.int64))
        pos += frame_sz
        n_frames += 1
    if n_frames == 0:
        raise ValueError("empty video")
    means = [
        float(sums[0]) / (n_frames * y_sz) / 255.0,
        float(sums[1]) / (n_frames * c_sz) / 255.0,
        float(sums[2]) / (n_frames * c_sz) / 255.0,
    ]
    return width, height, n_frames, fps_num, fps_den, means


def _y4m_frame_y_means(data: bytes, every: int) -> list[tuple[int, float]]:
    """(frame_idx, y_mean) for every `every`-th frame — the frame-sample
    kernel behind sample_video_frames. Reuses the header validation of
    decode_y4m's parse path."""
    width, height, _, _, _, _ = decode_y4m(data)
    y_sz = width * height
    c_sz = (width // 2) * (height // 2)
    frame_sz = y_sz + 2 * c_sz
    pos = data.find(b"\n") + 1
    out, idx = [], 0
    while pos < len(data):
        pos = data.find(b"\n", pos) + 1  # skip FRAME line (validated above)
        if idx % every == 0:
            y = np.frombuffer(data[pos:pos + y_sz], dtype=np.uint8)
            out.append((idx, float(y.sum(dtype=np.int64)) / y_sz / 255.0))
        pos += frame_sz
        idx += 1
    return out


def sample_video_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame-sampling over Y4M video payloads: one output row per sampled
    frame (every `every`-th), carrying the frame index and its luma mean.
    Non-video / undecodable rows degrade to a single decode_ok=false row.
    Arrow-batched mapInPandas, same partition-sizing guidance as
    extract_features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ymeans, oks, errs = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                try:
                    for idx, ym in _y4m_frame_y_means(b, every):
                        ids.append(mid)
                        idxs.append(idx)
                        ymeans.append(ym)
                        oks.append(True)
                        errs.append(None)
                except ValueError as e:
                    ids.append(mid)
                    idxs.append(None)
                    ymeans.append(None)
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "y_mean": pd.array(ymeans, dtype="Float64"),
                    "decode_ok": oks,
                    "error": errs,
                }
            )

    return media.mapInPandas(
        op,
        schema="media_id long, frame_idx int, y_mean double, "
               "decode_ok boolean, error string",
    )


# ------------------------------------------------------------------ kernels
def _decode_stub(payload: bytes) -> list[float]:
    """STUB decode for unrecognized payloads (opaque blobs, compressed
    containers): deterministic fake feature from the payload digest. Real
    compressed-video decode would be ffmpeg — not in this environment by
    design; raw Y4M goes through the real decode_y4m path."""
    d = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def _decode_one(kind: str, b: bytes):
    """-> (width, height, feature[8], decoder, error)"""
    if kind == "image" and b.startswith(PNG_SIG):
        w, h, ch, means = decode_png(b)
        feat = [float(w), float(h), float(ch)] + means[:4] + [0.0] * (4 - len(means[:4]))
        return w, h, [float(v) for v in (feat + [1.0])[:8]], "png", None
    if kind == "image" and b.startswith(JPEG_SIG):
        w, h, ch, means = decode_jpeg(b)
        feat = [float(w), float(h), float(ch)] + means[:4] + [0.0] * (4 - len(means[:4]))
        return w, h, [float(v) for v in (feat + [4.0])[:8]], "jpeg", None
    if kind == "audio" and b[:4] == b"RIFF":
        sr, ch, nf, means = decode_wav(b)
        feat = [float(sr), float(ch), float(nf)] + means[:4] + [0.0] * (4 - len(means[:4]))
        return None, None, [float(v) for v in (feat + [2.0])[:8]], "wav", None
    if kind == "video" and b.startswith(Y4M_SIG):
        w, h, nf, fn, fd, means = decode_y4m(b)
        feat = [float(nf), float(fn) / float(fd)] + means + [0.0, 0.0, 3.0]
        return w, h, [float(v) for v in feat], "y4m", None
    return None, None, [float(v) for v in _decode_stub(b)], "stub", None


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow streams batches of rows into Python; each batch is processed
    row-vectorized (hashes + decode). Partition sizing guidance: binary
    payloads make rows heavy — repartition so a partition holds O(100 MB)
    of payloads, not O(row count).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, feats, decs, oks, errs, hashes, sizes = (
                [], [], [], [], [], [], [], []
            )
            for kind, p in zip(pdf["kind"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                sizes.append(len(b))
                hashes.append(hashlib.sha256(b).hexdigest())
                try:
                    w, h, feat, dec, err = _decode_one(kind, b)
                    widths.append(w)
                    heights.append(h)
                    feats.append(feat)
                    decs.append(dec)
                    oks.append(True)
                    errs.append(err)
                except (ValueError, zlib.error, struct.error) as e:
                    # struct.error: truncated IHDR/chunk header — same
                    # degrade-to-error-row contract as a bad zlib stream
                    widths.append(None)
                    heights.append(None)
                    feats.append(None)
                    decs.append("png")
                    oks.append(False)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "feature": feats,
                    "decode_ok": oks,
                    "decoder": decs,
                    "error": errs,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def _png_variants() -> list[bytes]:
    """The 8 deterministic 4x3 RGB fixture PNGs (shared with the driver's
    literal-lookup oracle, __spark_entry__._multimodal_sql)."""
    variants = []
    for k in range(8):
        px = [
            [((k * 37 + x * 11 + y * 53) % 256, (k * 59 + x * 17) % 256, (y * 29 + k) % 256)
             for x in range(4)]
            for y in range(3)
        ]
        variants.append(encode_png(4, 3, px))
    return variants


def _jpeg_variants() -> list[bytes]:
    """The 8 deterministic fixture JPEGs (MCU-aligned dims so the
    DC-derived channel means are exact over the full image; shared with
    the driver's literal-lookup oracle). Widths alternate 8/16, height 8."""
    variants = []
    for k in range(8):
        w = 8 + 8 * (k % 2)
        px = [
            [((k * 41 + x * 13 + y * 7) % 256, (k * 23 + x * 29) % 256,
              (y * 31 + k * 5) % 256)
             for x in range(w)]
            for y in range(8)
        ]
        variants.append(encode_jpeg(w, 8, px))
    return variants


def _wav_variants() -> list[bytes]:
    """8 deterministic tiny PCM16 WAV fixtures (1-2 channels, 16-23
    frames, varied sample rates) — same oracle-sharing contract."""
    variants = []
    for k in range(8):
        ch = 1 + (k % 2)
        frames = [
            tuple(((k * 997 + i * 131 + c * 73) % 2048) - 1024 for c in range(ch))
            for i in range(16 + k)
        ]
        variants.append(encode_wav(8000 + 100 * k, frames))
    return variants


def _y4m_variants() -> list[bytes]:
    """8 deterministic tiny Y4M videos (4x4 / 6x4, 2-4 frames, varied
    frame rates) — same oracle-sharing contract as the PNG/WAV variants."""
    variants = []
    for k in range(8):
        w, h = (4 + 2 * (k % 2)), 4
        y_sz, c_sz = w * h, (w // 2) * (h // 2)
        frames = []
        for f in range(2 + (k % 3)):
            y = bytes((k * 31 + f * 67 + i * 13) % 256 for i in range(y_sz))
            u = bytes((k * 17 + f * 29 + i * 7) % 256 for i in range(c_sz))
            v = bytes((k * 23 + f * 41 + i * 11) % 256 for i in range(c_sz))
            frames.append((y, u, v))
        variants.append(encode_y4m(w, h, (24 + k, 1), frames))
    return variants


def synthetic_media(spark, n: int, real_png: bool = True) -> DataFrame:
    """Deterministic fake media table. image rows carry REAL tiny PNGs,
    audio rows REAL tiny PCM16 WAVs, video rows REAL tiny Y4M clips
    (8 deterministic variants each, stdlib-encoded) so all three decode
    paths run end-to-end."""
    png_arr = F.array(*[F.lit(bytearray(v)) for v in _png_variants()])
    jpg_arr = F.array(*[F.lit(bytearray(v)) for v in _jpeg_variants()])
    wav_arr = F.array(*[F.lit(bytearray(v)) for v in _wav_variants()])
    y4m_arr = F.array(*[F.lit(bytearray(v)) for v in _y4m_variants()])
    i = F.col("id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(i, 3) + 1).cast("int"),
    )
    blob = F.encode(F.concat(F.lit("payload:"), i.cast("string")), "UTF-8")
    payload = (
        # image ids are = 0 (mod 3); every second one (= 3 mod 6) carries a
        # REAL baseline JPEG, the rest a REAL PNG — both decode paths run
        F.when(kind == "image",
               F.when(F.pmod(i, 6) == 3,
                      F.element_at(jpg_arr, (F.pmod(i, 8) + 1).cast("int")))
               .otherwise(F.element_at(png_arr, (F.pmod(i, 8) + 1).cast("int"))))
        .when(kind == "audio", F.element_at(wav_arr, (F.pmod(i, 8) + 1).cast("int")))
        .when(kind == "video", F.element_at(y4m_arr, (F.pmod(i, 8) + 1).cast("int")))
        .otherwise(blob)
        if real_png
        else blob
    )
    return spark.range(n).select(
        i.alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image",
               F.when(F.pmod(i, 6) == 3, F.lit("image/jpeg"))
               .otherwise(F.lit("image/png")))
        .when(kind == "audio", F.lit("audio/wav") if real_png else F.lit("application/octet-stream"))
        .when(kind == "video", F.lit("video/x-yuv4mpeg") if real_png else F.lit("application/octet-stream"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
