"""String embedders: the real-weights SapBERT analogue + the
TF-IDF-flavoured context vectorizer.

The reference encodes strings with a distilled SapBERT transformer
(/root/reference/kazu/utils/sapbert.py:84-254) and compares them by
cosine similarity (string_similarity_scorers.py:94-132).  Torch is not
available in this environment, so :class:`NumpyBertEmbedder` runs a
REAL checked-in tiny-BERT checkpoint (kazu_ray/assets/tiny_bert_embed,
trained by scripts/train_tiny_embedder.py with a SapBERT-style synonym
metric objective) through the pure-numpy transformer forward of
:mod:`kazu_ray.state.numpy_bert`: WordPiece -> encoder -> mean-pool ->
trained linear projection -> L2-normalised vector.  Its cosines depend
on actual weights — zero-lexical-overlap synonym pairs ("aspirin" /
"acetylsalicylic acid") score HIGH and ambiguous-symbol label pairs
(the p27 trio) score LOW, neither of which a character-ngram hash can
express.  On a GPU cluster you'd swap the forward for the HF SapBERT
model; the encode/similarity contract and every call site stay put.

:class:`HashedNgramEmbedder` remains as the CONTEXT vectorizer — a
hashed character-trigram random projection standing in for the
reference's TF-IDF vectorizers (TfIdfDisambiguationStrategy /
GildaTfIdfScorer, disambiguation/strategies.py:152-358), which are
bag-of-features models, not transformers; it is also the documented
fallback if the embed checkpoint is absent.
"""

from __future__ import annotations

import os
import re
import zlib

import numpy as np

DIM = 64

EMBED_CHECKPOINT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets",
    "tiny_bert_embed",
)

_WORD_RE = re.compile(r"[a-z0-9]+")


class NumpyBertEmbedder:
    """Real-weights string embedder (SapBERT role): checked-in tiny-BERT
    checkpoint through the numpy forward, mean-pooled, projected by the
    TRAINED metric head, L2-normalised.  Build once per actor
    (``__init__`` loads the weights), call per string/batch."""

    _VEC_CACHE_MAX = 200_000

    def __init__(self, model_dir: str = EMBED_CHECKPOINT):
        from .numpy_bert import NumpyBert, WordPieceTokenizer

        self.bert = NumpyBert(model_dir)
        self.tok = WordPieceTokenizer(os.path.join(model_dir, "vocab.txt"))
        w = self.bert.sd.get("projection.weight")
        # identity projection before training writes the head (the
        # train script extracts pooled features through this same path)
        self.proj = np.eye(self.bert.hidden) if w is None else np.asarray(w, np.float64).T
        self.dim = self.proj.shape[1]
        self._vec_cache: dict[str, np.ndarray] = {}

    def pooled(self, s: str) -> np.ndarray:
        """Mean-pooled final hidden states (pre-projection)."""
        ids = [self.tok.cls]
        for w in _WORD_RE.findall(s.lower()):
            ids.extend(self.tok.word_to_pieces(w))
        ids.append(self.tok.sep)
        hidden = self.bert.encode(ids)
        # pool the content positions (CLS/SEP excluded when present)
        core = hidden[1:-1] if len(hidden) > 2 else hidden
        return core.mean(axis=0)

    def encode(self, s: str) -> np.ndarray:
        cached = self._vec_cache.get(s)
        if cached is not None:
            return cached
        u = self.pooled(s) @ self.proj
        norm = float(np.linalg.norm(u))
        out = (u / norm if norm > 0 else u).astype(np.float32)
        if len(self._vec_cache) < self._VEC_CACHE_MAX:
            self._vec_cache[s] = out
        return out

    def encode_batch(self, strings: list[str]) -> np.ndarray:
        if not strings:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self.encode(s) for s in strings])

    def similarity(self, a: str, b: str) -> float:
        return float(np.dot(self.encode(a), self.encode(b)))


def default_embedder():
    """The production string embedder: the real-weights checkpoint when
    present (always, in this repo), hashed trigrams otherwise."""
    if os.path.exists(os.path.join(EMBED_CHECKPOINT, "pytorch_model.bin")):
        return NumpyBertEmbedder()
    return HashedNgramEmbedder()


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
