"""Perceptual image hashing: integer dHash invariants, PNG encoder
round trip, banded-LSH pair exactness vs brute force, and the
distributed-vs-replay path gate."""

import numpy as np

from kazu_ray.extras.imagehash import (
    BRIGHT_SHIFT,
    HAM_T,
    N_BANDS,
    N_GROUPS,
    VARIANTS,
    _group_base,
    _hamming64,
    brute_force_pairs,
    dhash64,
    encode_png_gray,
    reference_hashes,
    variant_payload,
)
from kazu_ray.extras.multimodal import decode_media, decode_png


def test_png_encoder_round_trip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    assert (decode_png(encode_png_gray(img)) == img).all()


def test_dhash_brightness_invariance_exact():
    """A global brightness shift below clipping cannot flip any bit:
    every cell sum moves by shift*area, so the cross-multiplied
    comparisons are unchanged."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 200, size=(41, 29), dtype=np.uint8)
    for shift in (1, BRIGHT_SHIFT, 40):
        assert dhash64(img) == dhash64((img.astype(np.int64) + shift).astype(np.uint8))


def test_dhash_hand_computed_tiny():
    """9x8-exact case: each grid cell is one pixel, so bit (r, c) is
    simply px[r, c] > px[r, c+1]."""
    img = np.zeros((8, 9), dtype=np.uint8)
    img[0, 0] = 10  # only bit (0, 0) set -> MSB
    expected = 1 << 63
    assert dhash64(img) == expected
    img2 = np.arange(72, dtype=np.uint8).reshape(8, 9)  # increasing rows
    assert dhash64(img2) == 0


def test_dhash_rgb_luma_path():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(24, 33), dtype=np.uint8)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    # (299g + 587g + 114g) // 1000 == g exactly for any integer g
    assert dhash64(rgb) == dhash64(gray)


def test_variant_payloads_decode_and_separate():
    """v0/v1 decode losslessly (PNG), dHash-equal; distinct groups stay
    far apart (the banded threshold can never bridge them)."""
    ref = reference_hashes(8)
    for g in range(8):
        base = _group_base(g)
        assert (decode_media(variant_payload(g, 0)) == base).all()
        assert ref[g * VARIANTS] == ref[g * VARIANTS + 1]
    hs = np.array([ref[g * VARIANTS] for g in range(8)], dtype=np.uint64)
    ia, ib = np.triu_indices(8, k=1)
    assert int(_hamming64(hs[ia], hs[ib]).min()) > HAM_T


def test_brute_force_pairs_threshold():
    hashes = {1: 0b1111, 2: 0b0111, 3: 0}  # d(1,2)=1 d(2,3)=3 d(1,3)=4
    pairs = brute_force_pairs(hashes, ham_t=3)
    assert pairs == {(1, 2, 1), (2, 3, 3)}


def test_imagehash_gate_end_to_end(ray_session):
    """Distributed hashes == replay, banded pairs == brute force, every
    planted brightness-shift duplicate found; pigeonhole sanity:
    HAM_T < N_BANDS."""
    from kazu_ray.extras.imagehash import q_imagehash_gate

    assert HAM_T < N_BANDS
    row = q_imagehash_gate("/root/testdata/sf0.001", n_groups=N_GROUPS).iloc[0]
    assert row["paths_equal"]
    assert row["pairs_equal"]
    assert row["planted_recall"] == 1.0
    assert row["passes"]
