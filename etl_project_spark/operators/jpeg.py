"""Baseline-JPEG codec in pure stdlib + numpy (no imaging library).

Closes the one codec gap that is feasible in-sandbox (round-8 verdict
task #4): ITU T.81 baseline sequential DCT, 8-bit, 1-component
grayscale or 3-component YCbCr at 4:4:4 (all sampling factors 1). The
decoder is a REAL marker-stream decoder — SOI/APP/COM skip, DQT, SOF0,
DHT (Huffman tables built from the stream's own BITS/HUFFVAL per
Annex C), SOS, entropy-coded segment with 0xFF00 byte-unstuffing,
per-MCU Huffman decode with DC prediction, EOB/ZRL AC runs, dezigzag,
dequantization, float 2-D IDCT, level shift, and YCbCr→RGB for color
streams. The encoder exists for the fixture side (so the decoder is
exercised against genuine entropy-coded bytes) and emits standard
Annex-K quantization + Huffman tables.

Out of scope — raises, never guesses: progressive (SOF2), arithmetic
coding, subsampling ≠ 1x1, 12-bit precision, DRI/restart markers.
Video stays a documented boundary (`multimodal.decode_payload`).

Exactness note for the oracle family: on images that are CONSTANT per
8×8 block with even pixel values, every AC coefficient is exactly 0,
the DC coefficient is 16·(v−128)/2 with quantizer 16, and both the
encoder's quantization and the decoder's IDCT land ≥0.49 away from
every rounding boundary — the lossy codec becomes bit-exact, so a SQL
oracle can replay decoded stats from the pixel rule alone (the same
device the PNG/BMP/WAV families use), while the general lossy path is
covered by roundtrip-bound property tests.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg_grid", "decode_jpeg"]

# --- Annex K tables -------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (BITS[1..16], HUFFVAL) per Annex K — the de-facto tables every
# baseline encoder ships. The decoder does NOT assume them: it builds
# whatever DHT declares.
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Zigzag scan: ZIGZAG[k] = (row, col) of the k-th coefficient.
_zz = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (
        rc[0] + rc[1],
        rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
    ),
)
ZIGZAG = np.array(_zz, dtype=np.int64)

# Orthonormal 8-point DCT-II matrix: M[u, x] = C(u)/2 · cos((2x+1)uπ/16).
_u, _x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
DCT_M = 0.5 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
DCT_M[0, :] *= 1.0 / np.sqrt(2.0)


def _build_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """Annex-C canonical code assignment: symbol → (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-serial decoder."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, huffval).items()}


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
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-stuffing marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` raw bits to a signed coefficient."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --- Encoder --------------------------------------------------------------

def encode_jpeg(pixels: np.ndarray) -> bytes:
    """Encode ``(h, w)`` grayscale or ``(h, w, 3)`` RGB uint8 as a real
    baseline sequential JPEG (4:4:4, Annex-K tables). Dimensions are
    padded to block multiples by edge replication, per the usual
    encoder convention."""
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [px.astype(np.float64)]
        qtabs = [QUANT_LUMA]
        qids = [0]
    else:
        r = px[:, :, 0].astype(np.int64)
        g = px[:, :, 1].astype(np.int64)
        b = px[:, :, 2].astype(np.int64)
        # Integer-exact JFIF transform (floor of the /1000-scaled form)
        y = (299 * r + 587 * g + 114 * b) // 1000
        cb = np.clip(128 + (-169 * r - 331 * g + 500 * b) // 1000, 0, 255)
        cr = np.clip(128 + (500 * r - 419 * g - 81 * b) // 1000, 0, 255)
        comps = [y.astype(np.float64), cb.astype(np.float64), cr.astype(np.float64)]
        qtabs = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
        qids = [0, 1, 1]

    hb, wb = -(-h // 8), -(-w // 8)
    dc_codes = [_build_codes(*DC_LUMA)] + ([_build_codes(*DC_CHROMA)] if not gray else [])
    ac_codes = [_build_codes(*AC_LUMA)] + ([_build_codes(*AC_CHROMA)] if not gray else [])
    zr, zc = ZIGZAG[:, 0], ZIGZAG[:, 1]

    writer = _BitWriter()
    pred = [0] * len(comps)
    for by in range(hb):
        for bx in range(wb):
            for ci, plane in enumerate(comps):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                if block.shape != (8, 8):  # edge-replicate pad
                    pad_h, pad_w = 8 - block.shape[0], 8 - block.shape[1]
                    block = np.pad(block, ((0, pad_h), (0, pad_w)), mode="edge")
                coef = DCT_M @ (block - 128.0) @ DCT_M.T
                q = qtabs[ci].astype(np.float64)
                quant = (np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)).astype(
                    np.int64
                )
                zz = quant[zr, zc]
                tsel = 0 if ci == 0 else 1 if not gray else 0
                dct, act = dc_codes[min(tsel, len(dc_codes) - 1)], ac_codes[
                    min(tsel, len(ac_codes) - 1)
                ]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _category(diff)
                code, ln = dct[size]
                writer.write(code, ln)
                if size:
                    writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
                run = 0
                last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = act[0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    size = _category(v)
                    code, ln = act[(run << 4) | size]
                    writer.write(code, ln)
                    writer.write(v if v >= 0 else v + (1 << size) - 1, size)
                    run = 0
                if last_nz < 63:
                    code, ln = act[0x00]  # EOB
                    writer.write(code, ln)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0]) + bytes(QUANT_LUMA[zr, zc].astype(np.uint8))
    if not gray:
        dqt += bytes([1]) + bytes(QUANT_CHROMA[zr, zc].astype(np.uint8))
    out += seg(0xFFDB, dqt)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, qids[ci]])
    out += seg(0xFFC0, sof)  # SOF0 baseline
    dht = b""
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if not gray:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tclass_id, (bits, vals) in tables:
        dht += bytes([tclass_id]) + bytes(bits) + bytes(vals)
    out += seg(0xFFC4, dht)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, tsel])
    sos += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += seg(0xFFDA, sos)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- Decoder --------------------------------------------------------------

def decode_jpeg_grid(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to ``(h, w)`` uint8 (grayscale stream) or
    ``(h, w, 3)`` uint8 RGB (3-component YCbCr stream). Real marker
    walk + entropy decode; raises on progressive/subsampled/12-bit/
    restart-interval streams instead of guessing."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = None
    pos = 2
    zr, zc = ZIGZAG[:, 0], ZIGZAG[:, 1]
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tab = np.zeros((8, 8), dtype=np.int32)
                vals = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                tab[zr, zc] = vals
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(body[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("subsampling unsupported (4:4:4 only)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xFF{marker:02X} unsupported"
            )
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for si in range(ns):
                cid, tsel = body[1 + 2 * si], body[2 + 2 * si]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = huff[(0, tsel >> 4)]
                        c["ac"] = huff[(1, tsel & 0xF)]
            pos += ln
            reader = _BitReader(payload, pos)
            hb, wb = -(-h // 8), -(-w // 8)
            planes = [np.zeros((hb * 8, wb * 8)) for _ in comps]
            pred = [0] * len(comps)

            def read_symbol(table: dict[tuple[int, int], int]) -> int:
                code, length = 0, 0
                while length < 16:
                    code = (code << 1) | reader.bit()
                    length += 1
                    sym = table.get((length, code))
                    if sym is not None:
                        return sym
                raise ValueError("invalid Huffman code")

            for by in range(hb):
                for bx in range(wb):
                    for ci, c in enumerate(comps):
                        zz = np.zeros(64, dtype=np.int64)
                        size = read_symbol(c["dc"])
                        diff = _extend(reader.bits(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = read_symbol(c["ac"])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.float64)
                        coef[zr, zc] = zz * qtabs[c["tq"]][zr, zc]
                        block = DCT_M.T @ coef @ DCT_M + 128.0
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            out = [
                np.clip(np.floor(p[:h, :w] + 0.5), 0, 255).astype(np.int64)
                for p in planes
            ]
            if len(out) == 1:
                return out[0].astype(np.uint8)
            y, cb, cr = (p.astype(np.float64) for p in out)
            r = np.floor(y + 1.402 * (cr - 128) + 0.5)
            g = np.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
            b = np.floor(y + 1.772 * (cb - 128) + 0.5)
            return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
        else:
            pass  # APPn / COM / unknown: skip
        pos += ln
    raise ValueError("no SOS segment found")


def decode_jpeg(payload: bytes, modality: str = "image") -> dict:
    """Baseline-JPEG decode to the ``decode_images`` stats contract:
    width/height/channels plus integer-BT.601 mean luma at 4 decimals
    half-up (grayscale streams use the gray values directly)."""
    import math

    px = decode_jpeg_grid(payload)
    if px.ndim == 2:
        h, w = px.shape
        nch = 1
        luma = px.astype(np.int64)
    else:
        h, w, _ = px.shape
        nch = 3
        p = px.astype(np.int64)
        luma = (299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]) // 1000
    mean = int(luma.sum()) / (h * w)
    return {
        "width": w,
        "height": h,
        "n_channels": nch,
        "mean_luma": math.floor(mean * 10_000 + 0.5) / 10_000,
    }
