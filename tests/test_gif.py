"""GIF LZW codec: hand-computed golden stream, lossless round-trips
across palette sizes (width growth 3->12 bits, table-full CLEAR),
interlace reordering, extension skipping."""

import struct

import numpy as np

from kazu_ray.extras.gif import (
    decode_gif,
    lzw_decode,
    lzw_encode,
    make_gif_image,
)


def test_lzw_golden_hand_computed():
    """Spec-traced golden: min code size 2 (clear=4, end=5, width=3);
    the stream CLEAR, 1, 6, 1, END encodes [1,1,1,1] where code 6 is
    the cScSc case (code == next_code).  Bits LSB-first:
    4 | 1<<3 | 6<<6 | 1<<9 | 5<<12 = 0x538C -> bytes 8C 53."""
    assert lzw_decode(bytes([0x8C, 0x53]), 2) == [1, 1, 1, 1]
    # and the encoder produces exactly that stream
    assert lzw_encode([1, 1, 1, 1], 2) == bytes([0x8C, 0x53])


def test_lzw_round_trip_all_widths():
    """Lossless across palette sizes; 256-color 96x96 random forces
    width growth through 12 bits AND a table-full CLEAR reset."""
    for n_colors, size, seed in ((2, 64, 0), (4, 333, 1), (16, 2000, 2), (256, 96 * 96, 3)):
        rng = np.random.default_rng(seed)
        pixels = rng.integers(0, n_colors, size=size).tolist()
        mcs = max(2, (n_colors - 1).bit_length())
        assert lzw_decode(lzw_encode(pixels, mcs), mcs) == pixels
    # repetitive input (deep dictionary chains) also exact
    pixels = ([0] * 50 + [1] * 50 + [0, 1] * 50) * 20
    assert lzw_decode(lzw_encode(pixels, 2), 2) == pixels


def test_lzw_corrupt_stream_rejected():
    # a code beyond next_code is corrupt, not crashy
    big = 4 | (7 << 3)  # CLEAR then code 7 with only 0..5 + none assigned
    assert lzw_decode(big.to_bytes(1, "little"), 2) is None


def test_decode_gif_golden_pixels():
    pixels = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.uint8)
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8
    )
    data = make_gif_image(pixels, palette)
    got = decode_gif(data)
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got, palette[pixels.astype(int)])


def test_decode_gif_skips_extensions():
    pixels = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    data = make_gif_image(pixels, palette)
    # splice a graphic-control extension between palette and descriptor
    head, img = data[: 13 + 6], data[13 + 6 :]
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    assert np.array_equal(decode_gif(head + gce + img), palette[pixels.astype(int)])


def test_decode_gif_interlaced():
    """Rows stored in 4-pass interlace order are restored to display
    order (flag 0x40 in the image descriptor)."""
    h, w = 8, 3
    pixels = (np.arange(h * w, dtype=np.uint8) % 4).reshape(h, w)
    palette = np.array(
        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]], dtype=np.uint8
    )
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(start, h, step)]
    from kazu_ray.extras.gif import _sub_blocks

    screen = struct.pack("<HH", w, h) + bytes((0x80 | 1, 0, 0))
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes((0x40,))
    lzw = lzw_encode(pixels[order].ravel(), 2)
    data = (
        b"GIF89a" + screen + palette.tobytes() + desc + bytes((2,))
        + _sub_blocks(lzw) + b"\x3b"
    )
    assert np.array_equal(decode_gif(data), palette[pixels.astype(int)])


def test_decode_gif_local_palette_wins():
    pixels = np.array([[0, 1]], dtype=np.uint8)
    g_pal = np.zeros((2, 3), dtype=np.uint8)
    l_pal = np.array([[7, 8, 9], [10, 11, 12]], dtype=np.uint8)
    base = make_gif_image(pixels, g_pal)
    # rebuild with a local color table on the image descriptor
    screen = base[6:13]
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + bytes((0x80 | 0,))
    tail = base[13 + 6 + 10 :]  # min-code-size + data + trailer
    data = b"GIF89a" + screen + g_pal.tobytes() + desc + l_pal.tobytes() + tail
    assert np.array_equal(decode_gif(data), l_pal[pixels.astype(int)])


def test_decode_gif_rejects_garbage():
    assert decode_gif(b"not a gif") is None
    assert decode_gif(b"GIF89a" + b"\x00" * 4) is None


def test_make_gif_real_decode_round_trip():
    """The synthetic corpus GIFs are now genuinely decodable: pixels
    come back bit-exactly (LZW is lossless) as grayscale RGB."""
    from kazu_ray.extras.multimodal import decode_media, make_gif

    data = make_gif(41, 13, seed=6)
    got = decode_gif(data)
    rng = np.random.default_rng(6)
    exp = rng.integers(0, 256, size=(13, 41), dtype=np.uint8)
    assert got.shape == (13, 41, 3)
    for c in range(3):  # grayscale palette: every channel = the index
        assert np.array_equal(got[:, :, c], exp)
    # decode_media dispatches GIF to the real decoder now
    assert np.array_equal(decode_media(data), got)
