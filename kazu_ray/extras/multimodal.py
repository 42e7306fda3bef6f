"""Multimodal span handling: media spans as opaque references/binary with
typed metadata, processed by actor-pool decode/feature stages.

The interleaved input schema carries media spans (kind in
{"image","table",...}, empty text, non-empty media_ref) through the KG
pipeline untouched (span-sequence invariant).  This module adds the
side path a multimodal corpus needs: decode -> feature-extract as a
``map_batches`` actor stage.

No image/audio codecs exist in this container, so the decode is STUBBED:
``RealDecoder`` raises NotImplementedError (wire PIL/ffmpeg there on a
real cluster); ``FakeDecoder`` produces a deterministic byte-hash
feature so the Ray-side plumbing — schema, batch size, actor signature,
output layout — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEATURE_DIM = 16

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("feature", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


class RealDecoder:
    """Placeholder for a real codec-backed decoder (PIL / torchvision /
    ffmpeg).  Not available in this container."""

    def decode(self, media_ref: str) -> bytes:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "use FakeDecoder or install a codec stack on the cluster"
        )


class FakeDecoder:
    """Deterministic stand-in: 'decodes' a media_ref into a seeded byte
    payload so feature extraction has real bytes to chew on."""

    def decode(self, media_ref: str) -> bytes:
        seed = hashlib.blake2b(media_ref.encode(), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(seed, "big"))
        return rng.bytes(256)


class MediaFeatureExtractor:
    """Actor-pool UDF: doc rows -> one row per media span with a feature
    vector.  Decoder is constructed once per actor; batches stay small
    because payloads are wide (SURVEY guidance on binary columns)."""

    def __init__(self, decoder: str = "fake"):
        self.decoder = FakeDecoder() if decoder == "fake" else RealDecoder()

    def _features(self, payload: bytes) -> list[float]:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        chunks = np.array_split(arr, FEATURE_DIM)
        return [float(round(c.mean() / 255.0, 6)) for c in chunks]

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, span_idxs, kinds, refs, feats = [], [], [], [], []
        for doc_id, spans in zip(
            batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
        ):
            for i, sp in enumerate(spans):
                if sp["media_ref"]:
                    payload = self.decoder.decode(sp["media_ref"])
                    doc_ids.append(doc_id)
                    span_idxs.append(i)
                    kinds.append(sp["kind"])
                    refs.append(sp["media_ref"])
                    feats.append(self._features(payload))
        return pa.Table.from_pydict(
            {
                "doc_id": doc_ids,
                "span_idx": pa.array(span_idxs, type=pa.int32()),
                "kind": kinds,
                "media_ref": refs,
                "feature": pa.array(feats, type=pa.list_(pa.float32(), FEATURE_DIM)),
            },
            schema=MEDIA_FEATURES_SCHEMA,
        )


def q_media_features(sf_dir: str):
    """Media spans -> features; counts by kind (rows-only check)."""
    from ray.data.aggregate import Count

    from ..sources.interleave import interleaved_docs

    ds = interleaved_docs(sf_dir)
    feats = ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_args=("fake",),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 2),
        num_cpus=1,
    )
    return feats.groupby("kind").aggregate(Count(alias_name="n_media")).sort("kind")
