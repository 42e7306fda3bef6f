"""Char-n-gram TF-IDF index for fuzzy entity linking.

Re-realizes the reference's DictionaryIndex (sklearn TfidfVectorizer over
``create_char_ngrams`` of all term_norms + dense dot-product top-n,
/root/reference/kazu/utils/link_index.py:26-141, utils/utils.py:144-162)
without sklearn: hashed char-trigram features, idf from the synonym
corpus, an inverted postings index per parser, and numpy accumulation
for query scoring.  The postings form is the scale path: memory is
O(nnz), query cost is O(query grams x postings), and the whole index is
built once per actor from the compiled synonyms parquet.
"""

from __future__ import annotations

import math
import zlib

import numpy as np

N_FEATURES = 1 << 15
NGRAM = 3


def char_ngrams(s: str, n: int = NGRAM) -> list[str]:
    s = f" {s.lower()} "
    if len(s) < n:
        return [s]
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def _hash_gram(g: str) -> int:
    return zlib.crc32(g.encode("utf-8")) % N_FEATURES


class TfIdfIndex:
    """One per parser: term_norm list + inverted postings."""

    def __init__(self, term_norms: list[str]):
        self.terms = list(term_norms)
        self.term_pos = {t: i for i, t in enumerate(self.terms)}
        n_terms = len(self.terms)
        # document frequency per feature
        df = np.zeros(N_FEATURES, dtype=np.int32)
        term_feats: list[dict[int, int]] = []
        for t in self.terms:
            counts: dict[int, int] = {}
            for g in char_ngrams(t):
                counts[_hash_gram(g)] = counts.get(_hash_gram(g), 0) + 1
            term_feats.append(counts)
            for f in counts:
                df[f] += 1
        self.idf = np.zeros(N_FEATURES, dtype=np.float32)
        nz = df > 0
        self.idf[nz] = np.log((1 + n_terms) / (1 + df[nz])) + 1.0
        # build normalized postings: feature -> [(term_id, weight)]
        post_f: list[int] = []
        post_t: list[int] = []
        post_w: list[float] = []
        for tid, counts in enumerate(term_feats):
            feats = np.fromiter(counts.keys(), dtype=np.int64)
            tf = np.fromiter(counts.values(), dtype=np.float32)
            w = tf * self.idf[feats]
            norm = float(np.linalg.norm(w))
            if norm > 0:
                w /= norm
            post_f.extend(feats.tolist())
            post_t.extend([tid] * len(feats))
            post_w.extend(w.tolist())
        order = np.argsort(post_f, kind="stable")
        self._pf = np.asarray(post_f, dtype=np.int64)[order]
        self._pt = np.asarray(post_t, dtype=np.int64)[order]
        self._pw = np.asarray(post_w, dtype=np.float32)[order]
        # search offsets per feature
        self._starts = np.searchsorted(self._pf, np.arange(N_FEATURES))
        self._ends = np.searchsorted(self._pf, np.arange(N_FEATURES), side="right")

    def query(self, s: str, top_n: int = 20) -> list[tuple[str, float]]:
        """Top-n (term_norm, score in 0..100).  Exact match short-circuits
        at 100.0 (reference link_index.py:86-92)."""
        if s in self.term_pos:
            return [(s, 100.0)]
        counts: dict[int, int] = {}
        for g in char_ngrams(s):
            f = _hash_gram(g)
            counts[f] = counts.get(f, 0) + 1
        feats = np.fromiter(counts.keys(), dtype=np.int64)
        tf = np.fromiter(counts.values(), dtype=np.float32)
        w = tf * self.idf[feats]
        norm = float(np.linalg.norm(w))
        if norm == 0:
            return []
        w /= norm
        scores = np.zeros(len(self.terms), dtype=np.float32)
        for f, qw in zip(feats, w):
            s0, s1 = self._starts[f], self._ends[f]
            if s1 > s0:
                np.add.at(scores, self._pt[s0:s1], qw * self._pw[s0:s1])
        if not len(scores):
            return []
        k = min(top_n, len(scores))
        idxs = np.argpartition(-scores, k - 1)[:k]
        idxs = idxs[np.argsort(-scores[idxs], kind="stable")]
        return [
            (self.terms[i], float(scores[i]) * 100.0)
            for i in idxs
            if scores[i] > 0.0
        ]


def build_indices(synonyms_path: str) -> dict[str, TfIdfIndex]:
    """parser_name -> index over its term_norms (one matrix per parser,
    reference link_index.py:26-60)."""
    import pyarrow.parquet as pq

    table = pq.read_table(synonyms_path, columns=["parser_name", "term_norm"])
    by_parser: dict[str, list[str]] = {}
    for p, t in zip(
        table.column("parser_name").to_pylist(), table.column("term_norm").to_pylist()
    ):
        by_parser.setdefault(p, []).append(t)
    return {p: TfIdfIndex(sorted(set(ts))) for p, ts in by_parser.items()}
