"""Distributed Bloom filter: cross-corpus membership at blocklist scale.

`extras/passages.decontaminate` broadcasts an EXACT gram/key set — the
right call while the blocklist fits in worker memory.  When the small
side stops being small (a billion-key dedup blocklist, a full previous
crawl), the standard scale path is a Bloom filter: ~10 bits/key at 1%
false positives instead of ~50+ bytes/key for an exact hash set, with
zero false negatives — so a Bloom PRE-filter never drops a true match
and only lets a bounded fraction of non-members through to (optional)
exact confirmation.

Build (:func:`build_bloom`) is one exchange pass, Ray-Data-first:
- map_batches: k bit positions per key (double hashing from two salted
  md5-64 halves — same `_key_hash64` primitive as extras/sampling, so
  positions are engine-reproducible), pre-keyed by RANGE partition
  (``pos // range_size``) so each partition owns a contiguous bit span;
- groupby(range): per-partition DISTINCT positions → one dense packed
  sub-bitmap row (bytes) per range;
- bounded assembly: ≤ P sub-bitmap rows concatenate into the final
  m-bit array — which must fit in one worker's memory anyway, because
  the whole point is to broadcast it.

Probe (:func:`bloom_filter`) broadcasts the bitmap once via ``ray.put``
and tests each batch vectorized (numpy gather + bit AND): rows whose k
positions are all set survive.  ``negate=True`` keeps definite
non-members (Bloom anti-join: guaranteed-new keys).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .sampling import _key_hash64

_SALT_A = "bloom-a"
_SALT_B = "bloom-b"


def optimal_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) minimizing size for a target false-positive rate."""
    m = max(64, int(-n_keys * math.log(fpr) / (math.log(2) ** 2)))
    k = max(1, round(m / max(1, n_keys) * math.log(2)))
    return m, k


def _positions(keys, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) uint64 bit positions via double hashing."""
    h1 = _key_hash64(keys, _SALT_A)
    h2 = _key_hash64(keys, _SALT_B) | np.uint64(1)  # odd → full-period step
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def build_bloom(
    ds,
    key: str = "doc_id",
    m_bits: int | None = None,
    k: int | None = None,
    n_keys_hint: int | None = None,
    fpr: float = 0.01,
    num_partitions: int | None = None,
):
    """Build the filter over ``ds[key]`` → (bitmap ndarray, m_bits, k).

    ``m_bits``/``k`` default to the optimum for ``n_keys_hint`` (one
    exact ``count()`` if absent) at ``fpr``."""
    from ..context import shuffle_partitions

    if m_bits is None or k is None:
        n = n_keys_hint if n_keys_hint is not None else ds.count()
        m_bits, k = optimal_params(n, fpr)
    m_words = (m_bits + 63) // 64
    nparts = num_partitions or shuffle_partitions()
    words_per_part = (m_words + nparts - 1) // nparts
    range_bits = words_per_part * 64

    def emit(batch: pa.Table) -> pa.Table:
        pos = _positions(batch.column(key).to_pylist(), m_bits, k).ravel()
        pos = np.unique(pos)
        return pa.table(
            {
                "pos": pa.array(pos, pa.uint64()),
                "part": pa.array(pos // np.uint64(range_bits), pa.int64()),
            }
        )

    def pack(group: pa.Table) -> pa.Table:
        pos = group.column("pos").to_numpy(zero_copy_only=False).astype(np.uint64)
        part = int(group.column("part")[0].as_py())
        local = pos - np.uint64(part * range_bits)
        words = np.zeros(words_per_part, dtype=np.uint64)
        np.bitwise_or.at(
            words, (local // np.uint64(64)).astype(np.int64),
            np.uint64(1) << (local % np.uint64(64)),
        )
        return pa.table(
            {"part": pa.array([part], pa.int64()),
             "bits": pa.array([words.tobytes()], pa.binary())}
        )

    rows = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pyarrow")
        .take_all()
    )  # bounded: ≤ nparts rows of words_per_part*8 bytes = m_bits total
    bitmap = np.zeros(m_words, dtype=np.uint64)
    for r in rows:
        part = r["part"]
        words = np.frombuffer(r["bits"], dtype=np.uint64)
        lo = part * words_per_part
        n = min(len(words), m_words - lo)
        bitmap[lo : lo + n] |= words[:n]
    return bitmap, m_bits, k


def _member_mask(keys, bitmap: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _positions(keys, m_bits, k)
    words = bitmap[(pos // np.uint64(64)).astype(np.int64)]
    hit = (words >> (pos % np.uint64(64))) & np.uint64(1)
    return hit.all(axis=1)


def bloom_filter(ds, bloom, key: str = "doc_id", negate: bool = False):
    """Keep rows whose key is (probably) in the filter — or, with
    ``negate``, rows that are DEFINITELY not in it.  The bitmap ships
    once per task via ``ray.put``, never per batch."""
    import ray

    bitmap, m_bits, k = bloom
    ref = ray.put(bitmap)

    class Probe:
        def __init__(self):
            self.bitmap = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = _member_mask(
                batch.column(key).to_pylist(), self.bitmap, m_bits, k
            )
            return batch.filter(pa.array(~mask if negate else mask))

    return ds.map_batches(Probe, concurrency=(1, 8), batch_format="pyarrow")
