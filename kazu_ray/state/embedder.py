"""Deterministic string embedder — the SapBERT stand-in.

The reference encodes strings with a distilled SapBERT transformer
(/root/reference/kazu/utils/sapbert.py:84-254) and compares them by
cosine similarity (string_similarity_scorers.py:94-132).  Torch is not
available in this environment, so this module provides a deterministic,
dependency-free embedding with the same *interface and pipeline shape*:
batched encode -> L2-normalised float32 vectors -> cosine top-k by
matrix multiply.  Swapping in a real transformer changes only
``HashedNgramEmbedder.encode_batch`` (load the model in the actor
``__init__``, run a forward pass per batch on GPU).

The embedding itself is a hashed character-trigram random projection:
similar surface forms get similar vectors, so it behaves sensibly as a
string-similarity scorer for synonym clustering (threshold 0.70,
reference base.py:895-997) and embedding-confirmation linking.
"""

from __future__ import annotations

import zlib

import numpy as np

DIM = 64


class HashedNgramEmbedder:
    """Stateful encoder; build once per actor, call per batch."""

    # cap on the whole-string vector memo (labels/terms repeat heavily in
    # compile + linking loops; bounded so long-running actors don't grow)
    _VEC_CACHE_MAX = 200_000

    def __init__(self, dim: int = DIM, n: int = 3, seed: int = 1234):
        self.dim = dim
        self.n = n
        self.seed = seed
        self._gram_cache: dict[str, np.ndarray] = {}
        self._vec_cache: dict[str, np.ndarray] = {}

    def _gram_vec(self, gram: str) -> np.ndarray:
        v = self._gram_cache.get(gram)
        if v is None:
            h = zlib.crc32((gram + "\x00" + str(self.seed)).encode("utf-8"))
            rng = np.random.default_rng(h)
            v = rng.standard_normal(self.dim).astype(np.float32)
            self._gram_cache[gram] = v
        return v

    def encode(self, s: str) -> np.ndarray:
        cached = self._vec_cache.get(s)
        if cached is not None:
            return cached
        key = s
        s = f"^{s.lower().strip()}$"
        grams = [s[i : i + self.n] for i in range(max(1, len(s) - self.n + 1))]
        vec = np.zeros(self.dim, dtype=np.float32)
        for g in grams:
            vec += self._gram_vec(g)
        norm = float(np.linalg.norm(vec))
        out = vec / norm if norm > 0 else vec
        if len(self._vec_cache) < self._VEC_CACHE_MAX:
            self._vec_cache[key] = out
        return out

    def encode_batch(self, strings: list[str]) -> np.ndarray:
        if not strings:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self.encode(s) for s in strings])

    def similarity(self, a: str, b: str) -> float:
        """Cosine similarity of two strings (SapbertStringSimilarityScorer shape)."""
        return float(np.dot(self.encode(a), self.encode(b)))
