"""Baseline JPEG codec (kazu_ray/extras/jpeg.py): analytic DC-only
decode, FDCT/IDCT inverse property, encode→decode round-trips bounded
by quantization error, frozen digests, and the multimodal wiring."""

import hashlib
import struct

import numpy as np
import pytest

from kazu_ray.extras.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    fdct8,
    idct8,
    quality_scaled_quant,
)


def test_dct_idct_inverse_property():
    rng = np.random.default_rng(7)
    for _ in range(5):
        block = rng.standard_normal((8, 8)) * 100
        assert np.abs(idct8(fdct8(block)) - block).max() < 1e-9


def test_dc_only_block_decodes_to_analytic_value():
    """Hand-built single-block JPEG carrying ONLY a DC coefficient:
    decoded pixels must equal round(DC * q[0] / 8) + 128 exactly
    (orthonormal IDCT of a constant: dc*q / 8 across the block)."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    quant = bytes([1] * 64)  # identity quant table
    dqt = seg(0xDB, b"\x00" + quant)
    sof = seg(0xC0, b"\x08" + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00")
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    # scan: DC category 5, value bits 10100 (=20 via EXTEND), then EOB.
    # DC cat-5 code is 110 + 5 value bits; AC EOB (sym 0x00) code 1010.
    # bits: 110 10100 1010 -> pad with 1s to 16 bits: 1101 0100 1010 1111
    scan = bytes([0b11010100, 0b10101111])
    data = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    out = decode_jpeg_baseline(data)
    assert out.shape == (8, 8)
    expected = round(20 * 1 / 8) + 128  # = 131 (orthonormal DC basis = 1/8)
    assert (out == expected).all()


def test_roundtrip_flat_exact():
    img = np.full((17, 23), 77, np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(img, quality=90))
    assert dec.shape == (17, 23)
    assert (dec == img).all()


def test_roundtrip_smooth_and_noise_bounded():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 255, 64)
    smooth = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    dec = decode_jpeg_baseline(encode_jpeg_baseline(smooth, quality=95))
    assert np.abs(dec.astype(int) - smooth.astype(int)).max() <= 4
    noise = rng.integers(0, 256, (32, 40)).astype(np.uint8)
    dec2 = decode_jpeg_baseline(encode_jpeg_baseline(noise, quality=100))
    assert np.abs(dec2.astype(int) - noise.astype(int)).max() <= 1


def test_frozen_digests():
    """Byte-level regression pin: encoder output and decoded pixels of a
    fixed input at a fixed quality must never drift."""
    x = np.linspace(0, 255, 48)
    img = np.clip(np.round(np.add.outer(x, x) / 2), 0, 255).astype(np.uint8)
    enc = encode_jpeg_baseline(img, quality=85)
    assert hashlib.md5(enc).hexdigest() == ENCODED_MD5
    assert hashlib.md5(decode_jpeg_baseline(enc).tobytes()).hexdigest() == DECODED_MD5


def test_quality_scaling_monotone():
    q50 = quality_scaled_quant(50)
    q90 = quality_scaled_quant(90)
    q10 = quality_scaled_quant(10)
    assert (q90 <= q50).all() and (q10 >= q50).all()
    assert (quality_scaled_quant(100) == 1).all()


def test_progressive_rejected():
    bad = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8) + b"\x08\x00\x08\x00\x08\x00"
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_baseline(bad)


def test_make_jpeg_is_real_and_features_use_pixels():
    """The synthetic corpus JPEGs are now genuinely decodable, and
    MediaFeatureExtractor features come from the DECODED pixels."""
    from kazu_ray.extras.multimodal import (
        MediaFeatureExtractor,
        decode_media,
        make_jpeg,
        parse_image_header,
    )

    payload = make_jpeg(40, 24, seed=3)
    assert parse_image_header(payload) == ("jpeg", 40, 24)
    decoded = decode_media(payload)
    assert decoded is not None and decoded.shape == (24, 40)
    assert decoded.std() > 10  # a real pattern, not filler
    ex = MediaFeatureExtractor()
    arr = decoded.astype(np.float32).ravel()
    exp = [float(round(c.mean() / 255.0, 6)) for c in np.array_split(arr, 16)]
    assert ex._features(payload) == exp
    # determinism (resumable synthetic corpus)
    assert make_jpeg(40, 24, seed=3) == payload


def test_color_420_flat_mcu_analytic():
    """Hand-built 16×16 YCbCr 4:2:0 JPEG with flat DC-only planes: pins
    interleaved MCU block order (4×Y, Cb, Cr), per-component DC
    predictors, nearest-neighbour chroma upsampling, and BT.601
    conversion — all against hand-computed RGB values."""
    from kazu_ray.extras.jpeg import _BitWriter, _canonical_codes, _magnitude

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    # target plane values: Y=168, Cb=128, Cr=148  ->  DC = (v-128)*8
    dc_vals = {"y": (168 - 128) * 8, "cb": 0, "cr": (148 - 128) * 8}
    bw = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}

    def put_block(comp):
        diff = dc_vals[comp] - pred[comp]
        pred[comp] = dc_vals[comp]
        cat, bits = _magnitude(diff)
        code, length = dc[cat]
        bw.write(code, length)
        if cat:
            bw.write(bits, cat)
        code, length = ac[0x00]  # EOB
        bw.write(code, length)

    for comp in ("y", "y", "y", "y", "cb", "cr"):  # one 4:2:0 MCU
        put_block(comp)
    bw.flush()

    quant = bytes([1] * 64)
    dqt = seg(0xDB, b"\x00" + quant)
    sof = seg(
        0xC0,
        b"\x08" + struct.pack(">HH", 16, 16) + b"\x03"
        + b"\x01\x22\x00" + b"\x02\x11\x00" + b"\x03\x11\x00",
    )
    dht = seg(
        0xC4,
        b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
        + b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS),
    )
    sos = seg(0xDA, b"\x03" + b"\x01\x00\x02\x00\x03\x00" + b"\x00\x3f\x00")
    data = b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.buf) + b"\xff\xd9"
    out = decode_jpeg_baseline(data)
    assert out.shape == (16, 16, 3)
    # BT.601: R = Y + 1.402*(Cr-128), G = Y - .344136*(Cb-128) - .714136*(Cr-128), B = Y + 1.772*(Cb-128)
    exp_r = round(168 + 1.402 * 20)       # 196
    exp_g = round(168 - 0.714136 * 20)    # 154
    exp_b = 168
    assert (out[..., 0] == exp_r).all()
    assert (out[..., 1] == exp_g).all()
    assert (out[..., 2] == exp_b).all()


ENCODED_MD5 = "425a1971964aea25dbaf28922e774ec4"
DECODED_MD5 = "674550cc90ecacb4f9a41b5058e87717"
