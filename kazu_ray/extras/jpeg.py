"""Pure-python/numpy baseline-sequential JPEG codec (ITU-T T.81).

No imaging library ships in this container, so the multimodal stage's
majority real-world image format was a header-parse-only seam until
round 5.  This module implements the public baseline JPEG spec
directly:

- **decoder** (:func:`decode_jpeg_baseline`): DQT / SOF0 / DHT / SOS /
  DRI segment parse, canonical Huffman decode with 0xFF00 byte
  unstuffing and RSTn handling, DC differentials, AC run-length +
  EOB/ZRL, dequantize, inverse zigzag, orthonormal 8×8 IDCT,
  nearest-neighbour chroma upsampling for subsampled scans, and
  YCbCr→RGB (BT.601 full-range, the JFIF convention).  Grayscale
  (1-component) and YCbCr (3-component) frames; progressive (SOF2) and
  arithmetic coding are outside baseline and raise.
- **encoder** (:func:`encode_jpeg_baseline`): grayscale baseline
  encoder using the Annex-K luminance quantization + Huffman tables
  (quality-scaled per the public IJG formula), used to synthesize REAL
  decodable JPEG payloads for the multimodal corpus and tests.

Correctness is pinned without any third-party reference decoder by
(a) an analytically-constructed DC-only JPEG whose decoded block value
is computed by hand from the spec, (b) the FDCT/IDCT inverse property,
(c) encode→decode round-trips bounded by quantization error, and
(d) frozen byte/pixel digests (tests/test_multimodal.py).

Reference scope note: the reference engine ingests text only; image
decode belongs to the multimodal operator family this engine adds
(SURVEY.md §2 "beyond the reference").
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared tables (public spec, ITU-T T.81 Annex K)
# --------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.1 luminance quantization table (natural order via zigzag)
STD_LUMA_QUANT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)

# Annex K.3: (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: Y = C @ X @ C.T is the 2-D FDCT."""
    C = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            C[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16)
    C *= 0.5
    C[0, :] *= 1 / np.sqrt(2)
    return C


_C = _dct_matrix()


def fdct8(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct8(coeffs: np.ndarray) -> np.ndarray:
    return _C.T @ coeffs @ _C


def quality_scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling of the Annex-K luminance table (public
    formula: scale = 5000/Q below 50 else 200-2Q)."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (STD_LUMA_QUANT * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical Huffman construction
    (T.81 Annex C)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# --------------------------------------------------------------------------
# encoder (grayscale baseline)
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_baseline(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode a 2-D uint8 array as a single-component baseline JPEG
    (Annex-K tables, quality-scaled quant, no subsampling)."""
    img = np.asarray(img)
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_baseline takes a 2-D uint8 array")
    h, w = img.shape
    quant = quality_scaled_quant(quality)
    q2d = quant.reshape(8, 8).astype(np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw), np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # edge replication
    padded[:, w:] = padded[:, w - 1 : w]
    padded -= 128.0

    dc_codes = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            coeffs = np.round(fdct8(padded[by : by + 8, bx : bx + 8]) / q2d).astype(int)
            zz = coeffs.flatten()[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            cat, bits = _magnitude(diff)
            code, length = dc_codes[cat]
            bw.write(code, length)
            if cat:
                bw.write(bits, cat)
            run = 0
            last_nz = max(np.nonzero(zz[1:])[0] + 1) if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                cat, bits = _magnitude(v)
                code, length = ac_codes[(run << 4) | cat]
                bw.write(code, length)
                bw.write(bits, cat)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, b"\x00" + bytes(int(quant[i]) for i in range(64)))
    sof = seg(0xC0, b"\x08" + struct.pack(">HH", h, w) + b"\x01" + b"\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    sos = seg(0xDA, b"\x01" + b"\x01\x00" + b"\x00\x3f\x00")
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + bytes(bw.buf) + b"\xff\xd9"


# --------------------------------------------------------------------------
# decoder (baseline sequential, 1 or 3 components)
# --------------------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over the entropy-coded scan with 0xFF00
    unstuffing; RSTn markers end the current run (reset() realigns)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self):
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt  # real marker: stop consuming
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def reset_at_rst(self):
        """Consume an RSTn marker between restart intervals."""
        self.acc = 0
        self.nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


def _build_decode_table(bits: list[int], vals: list[int]):
    """(code, length) -> symbol dict for canonical Huffman decode."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits back to a signed value."""
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to uint8 (H, W) grayscale or
    (H, W, 3) RGB.  Raises ValueError on non-baseline frames."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + size]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables are extended, not baseline")
                quant[tq] = np.frombuffer(body[i + 1 : i + 65], np.uint8).astype(
                    np.int32
                )
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline JPEG frame (progressive/extended)")
        elif marker == 0xC0:  # SOF0
            if body[0] != 8:
                raise ValueError("baseline JPEG requires 8-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0xF)
                for c in range(ns)
            ]
            scan_start = pos + 2 + size
            break
        pos += 2 + size
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        cid: np.zeros((mcuy * vs * 8, mcux * hs * 8), np.float64)
        for cid, hs, vs, _ in comps
    }
    comp_by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}

    br = _BitReader(data, scan_start)
    pred = {cid: 0 for cid, _, _ in scan_comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.reset_at_rst()
                pred = {cid: 0 for cid, _, _ in scan_comps}
            for cid, td, ta in scan_comps:
                hs, vs, tq = comp_by_id[cid]
                for v in range(vs):
                    for u in range(hs):
                        sym = _decode_symbol(br, huff[(0, td)])
                        diff = _extend(br.read_bits(sym), sym)
                        pred[cid] += diff
                        zz = np.zeros(64, np.int32)
                        zz[0] = pred[cid]
                        i = 1
                        while i < 64:
                            rs = _decode_symbol(br, huff[(1, ta)])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                i += 16
                                continue
                            run, cat = rs >> 4, rs & 0xF
                            i += run
                            if i > 63:
                                raise ValueError("AC run past block end")
                            zz[i] = _extend(br.read_bits(cat), cat)
                            i += 1
                        block = np.zeros(64, np.float64)
                        block[ZIGZAG] = zz * quant[tq]
                        pix = idct8(block.reshape(8, 8)) + 128.0
                        y0 = (my * vs + v) * 8
                        x0 = (mx * hs + u) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"unsupported component count {len(full)}")
