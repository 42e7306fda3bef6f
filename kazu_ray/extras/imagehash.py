"""Perceptual image hashing (dHash) + banded-LSH near-duplicate
detection over REAL decoded pixels — the image-side twin of the text
MinHash/SimHash dedup family (LAION / DataComp curation dedupes images
by perceptual hash before training).

The hash is the classic difference hash (dHash): grayscale -> 8x9 area
downsample -> compare horizontally adjacent cell means -> 64 bits.
Every step here is INTEGER arithmetic (grayscale via the ITU-R 601
integer weights, cell means compared by cross-multiplying block sums
with block areas instead of dividing), so the distributed path, the
single-process reference replay and the brute-force verifier are
bit-exact by construction — no float rounding seam at all.

Near-dup candidate generation is the MinHash-LSH shape (dedup.py):
split the 64-bit hash into ``N_BANDS`` 8-bit bands; by pigeonhole any
pair within Hamming distance ``HAM_T`` < N_BANDS collides on at least
one untouched band, so a groupby on (band_idx, band_val) surfaces every
true pair; candidates are then verified with the exact popcount.
Recall at the threshold is therefore structurally 1.0 — gated every
round (``imagehash_pairs_exact`` proves the banded set EQUALS the
all-pairs brute force on the test corpus).

Scale design (100 TB): decode+hash is an actor-pool ``map_batches``
stage (decoder state per actor, binary payloads in small batches — the
multimodal.py contract); each image reduces to one 8-byte hash, so the
banding exchange moves N_BANDS x 24 B per image regardless of pixel
volume, and verification touches only same-bucket pairs.  A cluster of
k true duplicates produces one k-sized bucket (quadratic only in the
duplicate-cluster size, not the corpus); production deployments cap
bucket fan-out with a representative-per-bucket union-find, noted
inline.  No all-pairs work anywhere.

Corpus: the synthetic test corpus plants ``VARIANTS`` re-encodings of
each source image — the PNG original, a brightness-shifted PNG (dHash
is exactly invariant to global brightness shifts until clipping), and
a baseline-JPEG re-encode (quality loss flips at most a few bits) —
exercising the real PNG and JPEG codecs end-to-end.  Re-encoded /
brightness-edited copies are precisely the near-dup class perceptual
hashing exists to catch.

Reference seam: KAZU has no image operators (SURVEY §2l
beyond-the-reference training-data surface).
"""
from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

N_GROUPS = 32          # planted source images in the synthetic corpus
VARIANTS = 3           # re-encodings per source (png / bright / jpeg)
HAM_T = 7              # near-dup Hamming threshold
N_BANDS = 8            # 8-bit LSH bands; HAM_T < N_BANDS => recall 1.0
BAND_BITS = 64 // N_BANDS
BRIGHT_SHIFT = 4       # brightness delta for the shifted variant

HASH_SCHEMA = pa.schema(
    [
        ("img_id", pa.int64()),
        ("group", pa.int64()),
        ("variant", pa.int64()),
        ("hash_hex", pa.string()),
    ]
)


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal valid 8-bit grayscale PNG from an arbitrary pixel array
    (filter 0 scanlines + zlib), decodable by multimodal.decode_png."""
    import struct

    h, w = img.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        raw = tag + body
        return struct.pack(">I", len(body)) + raw + struct.pack(
            ">I", zlib.crc32(raw)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _group_dims(group: int) -> tuple[int, int]:
    """Deterministic per-group image size (>= 16 so the 8x9 grid always
    has non-empty cells), derived from the group id alone."""
    seed = int.from_bytes(
        hashlib.blake2b(f"imgbase:{group}".encode(), digest_size=4).digest(), "big"
    )
    return 24 + seed % 41, 24 + (seed >> 8) % 41  # (w, h) in [24, 64]


def _group_base(group: int) -> np.ndarray:
    """Seeded source image for one group: a coarse 8x9 random block
    pattern upsampled to the group's dimensions.  Coarse blocks make
    distinct groups far apart under dHash (each bit is an independent
    coin flip across groups — smooth gradients, by contrast, collide),
    survive JPEG quantization (block means are what q85 preserves), and
    cap at 240 so the +BRIGHT_SHIFT variant never clips — which is what
    makes dHash's brightness invariance EXACT, not approximate."""
    w, h = _group_dims(group)
    rng = np.random.default_rng(group * 7919 + 13)
    cells = rng.integers(0, 240, size=(8, 9), dtype=np.int64)
    r_edges = [i * h // 8 for i in range(8)]
    c_edges = [j * w // 9 for j in range(9)]
    r_sizes = np.diff(r_edges + [h])
    c_sizes = np.diff(c_edges + [w])
    return np.repeat(
        np.repeat(cells, r_sizes, axis=0), c_sizes, axis=1
    ).astype(np.uint8)


def variant_payload(group: int, variant: int) -> bytes:
    """Container bytes for one (group, variant) corpus image — all
    derived from the SAME seeded source pattern so variants of a
    group are true near-duplicates and distinct groups are not."""
    base = _group_base(group)
    if variant == 0:
        return encode_png_gray(base)
    if variant == 1:
        shifted = np.minimum(base.astype(np.int64) + BRIGHT_SHIFT, 255)
        return encode_png_gray(shifted.astype(np.uint8))
    from .jpeg import encode_jpeg_baseline

    return encode_jpeg_baseline(base, quality=85)


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash, pure integer arithmetic.

    Grayscale (ITU-R 601 integer weights, floor division), partition
    into an 8-row x 9-column grid of contiguous cells (np.add.reduceat
    block sums), then bit (r, c) = 1 iff cell (r, c) mean > cell
    (r, c+1) mean — compared exactly as
    ``sum[r,c] * area[r,c+1] > sum[r,c+1] * area[r,c]``."""
    a = img.astype(np.int64)
    if a.ndim == 3:  # RGB -> integer luma
        a = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    h, w = a.shape
    r_edges = [i * h // 8 for i in range(8)]
    c_edges = [j * w // 9 for j in range(9)]
    sums = np.add.reduceat(np.add.reduceat(a, r_edges, axis=0), c_edges, axis=1)
    r_sizes = np.diff(r_edges + [h])
    c_sizes = np.diff(c_edges + [w])
    areas = np.outer(r_sizes, c_sizes).astype(np.int64)
    left, right = sums[:, :8], sums[:, 1:]
    bits = (left * areas[:, 1:]) > (right * areas[:, :8])
    out = 0
    for k, b in enumerate(bits.ravel()):
        if b:
            out |= 1 << (63 - k)
    return out


def _hash_payload(payload: bytes) -> int:
    from .multimodal import decode_media

    decoded = decode_media(payload)
    if decoded is None:
        raise ValueError("undecodable image payload")
    return dhash64(decoded)


class ImageHasher:
    """Actor-pool UDF: (img_id, group, variant) rows -> dHash rows.
    Payload synthesis + decode run inside the actor (the FakeDecoder
    contract from multimodal.py — payloads never cross the wire); a
    real deployment swaps ``variant_payload`` for an object-store
    fetch keyed by media_ref."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        groups = batch.column("group").to_pylist()
        variants = batch.column("variant").to_pylist()
        hashes = [
            f"{_hash_payload(variant_payload(g, v)):016x}"
            for g, v in zip(groups, variants)
        ]
        return pa.table(
            {
                "img_id": batch.column("img_id"),
                "group": batch.column("group"),
                "variant": batch.column("variant"),
                "hash_hex": pa.array(hashes, pa.string()),
            }
        ).cast(HASH_SCHEMA)


def corpus_ds(n_groups: int = N_GROUPS):
    """The planted-variant image corpus as a Dataset of id rows; the
    pixel payloads materialize only inside the hashing actors."""
    import ray.data as rd

    ids = pa.table(
        {
            "img_id": pa.array(
                [g * VARIANTS + v for g in range(n_groups) for v in range(VARIANTS)],
                pa.int64(),
            ),
            "group": pa.array(
                [g for g in range(n_groups) for _ in range(VARIANTS)], pa.int64()
            ),
            "variant": pa.array(
                [v for _ in range(n_groups) for v in range(VARIANTS)], pa.int64()
            ),
        }
    )
    return rd.from_arrow(ids).repartition(4)


def hash_images(ds, concurrency=(1, 4)):
    """Actor-pool hash stage.  The pool AUTOSCALES from 1 so it can
    never deadlock the upstream repartition on a small CPU budget (a
    fixed pool of k actors reserves k CPUs before the all-to-all
    producing its input has run anywhere)."""
    return ds.map_batches(
        ImageHasher, batch_size=16, concurrency=concurrency, batch_format="pyarrow"
    )


PAIR_SCHEMA = pa.schema(
    [("img_a", pa.int64()), ("img_b", pa.int64()), ("hamming", pa.int64())]
)

_POP = np.array([bin(i).count("1") for i in range(65536)], dtype=np.int64)


def _hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(xor) over uint64 arrays via a 16-bit table."""
    x = a ^ b
    out = np.zeros(x.shape, dtype=np.int64)
    for s in (0, 16, 32, 48):
        out += _POP[((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)]
    return out


def dup_pairs(hash_ds, ham_t: int = HAM_T):
    """Banded-LSH near-dup pairs: (band_idx, band_val) groupby surfaces
    candidates, exact popcount verifies, pair-keyed groupby dedups the
    multi-band repeats.  Each image ships N_BANDS fixed-width rows; a
    k-duplicate cluster costs k^2/2 verifications inside its bucket
    only (production variant: keep one representative per bucket in a
    union-find to cap fan-out)."""
    import pandas as pd

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column("img_id").to_numpy()
        hs = np.array(
            [int(x, 16) for x in t.column("hash_hex").to_pylist()], dtype=np.uint64
        )
        n = len(ids)
        bi = np.repeat(np.arange(N_BANDS, dtype=np.int64), n)
        mask = np.uint64((1 << BAND_BITS) - 1)
        bv = np.concatenate(
            [
                ((hs >> np.uint64(BAND_BITS * b)) & mask).astype(np.int64)
                for b in range(N_BANDS)
            ]
        )
        return pa.table(
            {
                "band_idx": pa.array(bi, pa.int64()),
                "band_val": pa.array(bv, pa.int64()),
                "img_id": pa.array(np.tile(ids, N_BANDS), pa.int64()),
                "hash_hex": pa.array(t.column("hash_hex").to_pylist() * N_BANDS),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["img_id"].to_numpy()
        hs = np.array([int(x, 16) for x in g["hash_hex"]], dtype=np.uint64)
        order = np.argsort(ids)
        ids, hs = ids[order], hs[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({"img_a": [], "img_b": [], "hamming": []}).astype(
                {"img_a": "int64", "img_b": "int64", "hamming": "int64"}
            )
        ia, ib = np.triu_indices(n, k=1)
        d = _hamming64(hs[ia], hs[ib])
        keep = d <= ham_t
        return pd.DataFrame(
            {"img_a": ids[ia[keep]], "img_b": ids[ib[keep]], "hamming": d[keep]}
        )

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["img_a", "img_b"])[["img_a", "img_b", "hamming"]]

    return (
        hash_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_idx", "band_val"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["img_a", "img_b"])
        .map_groups(dedup, batch_format="pandas")
    )


# ----------------------------------------------------------------- #
# reference replay + gates                                           #
# ----------------------------------------------------------------- #


def reference_hashes(n_groups: int = N_GROUPS) -> dict[int, int]:
    """Single-process replay: the exact hash every corpus image must
    get — same integer pipeline, no Ray."""
    return {
        g * VARIANTS + v: _hash_payload(variant_payload(g, v))
        for g in range(n_groups)
        for v in range(VARIANTS)
    }


def brute_force_pairs(
    hashes: dict[int, int], ham_t: int = HAM_T
) -> set[tuple[int, int, int]]:
    ids = sorted(hashes)
    hs = np.array([hashes[i] for i in ids], dtype=np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    d = _hamming64(hs[ia], hs[ib])
    keep = d <= ham_t
    arr = np.array(ids, dtype=np.int64)
    return {
        (int(arr[a]), int(arr[b]), int(dd))
        for a, b, dd in zip(ia[keep], ib[keep], d[keep])
    }


def q_image_dhash(sf_dir: str, n_groups: int = N_GROUPS):
    """Query surface: the hash table of the planted-variant corpus
    (real PNG + JPEG decodes inside the actor pool)."""
    return hash_images(corpus_ds(n_groups)).sort("img_id")


def q_imagehash_gate(sf_dir: str, n_groups: int = N_GROUPS):
    """One-row gate frame: distributed-vs-replay hash equality, banded
    pair-set EQUALITY vs brute force, and planted-variant recall."""
    import pandas as pd

    got = {
        int(r["img_id"]): int(r["hash_hex"], 16)
        for r in q_image_dhash(sf_dir, n_groups).take_all()
    }
    ref = reference_hashes(n_groups)
    path_equal = got == ref

    found = {
        (int(r["img_a"]), int(r["img_b"]), int(r["hamming"]))
        for r in dup_pairs(hash_images(corpus_ds(n_groups))).take_all()
    }
    truth = brute_force_pairs(ref)
    pairs_equal = found == truth

    # every planted same-group (png, bright-png) pair must be found:
    # a global brightness shift below clipping cannot flip a dHash bit
    found_ab = {(a, b) for a, b, _ in found}
    planted = [
        (g * VARIANTS + 0, g * VARIANTS + 1) for g in range(n_groups)
    ]
    recall = sum((a, b) in found_ab for a, b in planted) / len(planted)
    # informational: how many lossy JPEG re-encodes land inside HAM_T
    # (quality-dependent, not gated — the structural guarantees above are)
    jpeg = [(g * VARIANTS + 0, g * VARIANTS + 2) for g in range(n_groups)]
    jpeg_recall = sum((a, b) in found_ab for a, b in jpeg) / len(jpeg)
    return pd.DataFrame(
        [
            {
                "paths_equal": path_equal,
                "pairs_equal": pairs_equal,
                "planted_recall": recall,
                "jpeg_recall": jpeg_recall,
                "n_pairs": len(found),
                "gate": 1.0,
                "passes": bool(path_equal and pairs_equal and recall == 1.0),
            }
        ]
    )
