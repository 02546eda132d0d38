"""Pure-Python baseline JPEG codec (stdlib + numpy — no libjpeg/Pillow).

Implements the sequential baseline process of ITU-T T.81: 8-bit samples,
8×8 DCT blocks, Annex-K quantization and Huffman tables on the encode side,
and a decoder that handles ANY baseline stream's tables (DQT/DHT are read
from the file), grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 subsampling,
optional restart intervals. Progressive (SOF2) and arithmetic coding are out
of scope and raise.

Performance position: this codec exists for correctness — real pixels out of
real entropy-coded bytes — inside Arrow-batched ``mapInPandas`` workers
(operators/multimodal.py), where per-image Python cost parallelizes across
executors. A production deployment swaps in libjpeg-turbo behind the same
``decode_image`` seam; nothing upstream changes.

The DCT is exact matrix algebra: ``B = C·P·Cᵀ`` with the orthonormal DCT-II
basis ``C`` — numpy matmuls, no scipy dependency.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (quality 50 reference)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K Huffman specs: (BITS counts per code length 1..16, HUFFVAL symbols)
_DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Orthonormal 8×8 DCT-II basis: C[k, n] = a(k) cos((2n+1)kπ/16)
_N = np.arange(8)
_DCT_C = np.cos((2 * _N[None, :] + 1) * _N[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_DCT_C[0, :] = np.sqrt(1 / 8)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_C.T @ coef @ _DCT_C


def _huff_codes(spec):
    """BITS/HUFFVAL → {symbol: (code, length)} per T.81 Annex C."""
    bits, vals = spec
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_lookup(spec):
    """BITS/HUFFVAL → {(length, code): symbol} for decoding."""
    return {(length, code): sym for sym, (code, length) in _huff_codes(spec).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (category, offset bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v


def _extend(bits_val: int, size: int) -> int:
    """Offset bits → signed value (F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits_val < (1 << (size - 1)):
        return bits_val - (1 << size) + 1
    return bits_val


# ------------------------------------------------------------------- encoder


def encode_jpeg_baseline(pixels: np.ndarray) -> bytes:
    """Encode ``(H, W)`` or ``(H, W, 3)`` uint8 pixels as baseline JPEG
    (4:4:4, Annex-K quality-50 tables). Exists so the decoder has real
    entropy-coded fixtures without shipping libjpeg; it is a complete,
    interoperable encoder all the same."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nch = pixels.shape
    if nch not in (1, 3):
        raise ValueError(f"need 1 or 3 channels, got {nch}")
    rgb = pixels.astype(np.float64)
    if nch == 3:
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128,
        ]
    else:
        comps = [rgb[..., 0]]
    quants = [QUANT_LUMA] + [QUANT_CHROMA] * (len(comps) - 1)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(QUANT_LUMA.flatten()[ZIGZAG].astype(np.uint8)))
    if len(comps) == 3:
        seg(0xDB, bytes([1]) + bytes(QUANT_CHROMA.flatten()[ZIGZAG].astype(np.uint8)))
    # SOF0: 8-bit, H×W, components with 1×1 sampling (4:4:4)
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci in range(len(comps)):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    for cls, tid, spec in (
        (0, 0, _DC_LUMA_SPEC), (1, 0, _AC_LUMA_SPEC),
        (0, 1, _DC_CHROMA_SPEC), (1, 1, _AC_CHROMA_SPEC),
    )[: 4 if len(comps) == 3 else 2]:
        bits, vals = spec
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    dc_codes = [_huff_codes(_DC_LUMA_SPEC), _huff_codes(_DC_CHROMA_SPEC)]
    ac_codes = [_huff_codes(_AC_LUMA_SPEC), _huff_codes(_AC_CHROMA_SPEC)]
    bw = _BitWriter()
    pred = [0] * len(comps)
    bh, bwid = -(-h // 8), -(-w // 8)
    padded = [
        np.pad(c, ((0, bh * 8 - h), (0, bwid * 8 - w)), mode="edge") for c in comps
    ]
    for by in range(bh):
        for bx in range(bwid):
            for ci, comp in enumerate(padded):
                tid = 0 if ci == 0 else 1
                block = comp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.round(_dct2(block) / quants[0 if ci == 0 else 1]).astype(np.int64)
                zz = q.flatten()[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits_val = _magnitude(diff)
                code, length = dc_codes[tid][size]
                bw.write(code, length)
                if size:
                    bw.write(bits_val, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[tid][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    size, bits_val = _magnitude(v)
                    code, length = ac_codes[tid][(run << 4) | size]
                    bw.write(code, length)
                    bw.write(bits_val, size)
                    run = 0
                    if k == last_nz:
                        break
                if last_nz < 63:
                    code, length = ac_codes[tid][0x00]  # EOB
                    bw.write(code, length)
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: handled by caller via align_restart()
                    self.pos -= 1
                    break
                else:
                    self.pos -= 1  # EOI or other marker: stop feeding
                    break
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                # A conforming baseline stream carries every bit its Huffman
                # codes need (byte-align padding is part of the data); running
                # dry mid-MCU means truncation/corruption. Raising (instead of
                # returning 0) lets decode_image convert this to
                # UnsupportedMediaFormat → digest fallback with decoded=False,
                # rather than emitting deterministic garbage pixels flagged
                # decoded=True.
                raise ValueError(
                    "JPEG entropy stream exhausted mid-scan (truncated or corrupt)"
                )
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Consume a restart marker and byte-align."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _decode_huff(br: _BitReader, lookup: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lookup.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline (SOF0) JPEG to ``(H, W, C) uint8`` (C = 1 or 3).

    Reads quantization/Huffman tables from the stream, supports 4:4:4 /
    4:2:2 / 4:2:0 sampling and restart intervals. Progressive or arithmetic
    streams raise ``ValueError``.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:
                    raise ValueError("16-bit quant tables are not baseline")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(body[p : p + 64], dtype=np.uint8)
                quant[tq] = tbl.reshape(8, 8)
                p += 64
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                (dc_tables if cls == 0 else ac_tables)[tid] = _huff_lookup((bits, vals))
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError("only 8-bit baseline JPEG is supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG process (progressive/arithmetic)")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i : 3 + 2 * i]
                scan.append({"cs": cs, "dc": tt >> 4, "ac": tt & 0xF})
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = []
    for c in frame["comps"]:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))

    br = _BitReader(data[pos:])
    pred = [0] * len(frame["comps"])
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(frame["comps"])
            for ci, comp in enumerate(frame["comps"]):
                sc = scan[ci]
                dct = dc_tables[sc["dc"]]
                act = ac_tables[sc["ac"]]
                q = quant[comp["tq"]]
                for byi in range(comp["v"]):
                    for bxi in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(br, dct)
                        diff = _extend(br.read_bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * comp["v"] + byi) * 8
                        x0 = (mx * comp["h"] + bxi) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    h, w = frame["h"], frame["w"]
    full = []
    for ci, comp in enumerate(frame["comps"]):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
