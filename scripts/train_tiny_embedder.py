"""Build + train the repo's tiny STRING-EMBEDDING checkpoint.

Produces ``kazu_ray/assets/tiny_bert_embed/`` — an HF-layout checkpoint
(config.json + vocab.txt + pytorch_model.bin written WITHOUT torch via
kazu_ray.state.torch_pickle.save_state_dict) holding:

- a tiny BERT encoder with seeded-random weights (the same stand-in role
  as the reference's tests/test_assets/bert_test_model, and as this
  repo's NER checkpoint encoder), and
- a GENUINELY TRAINED ``projection.*`` metric head: a linear map fitted
  over the real numpy-BERT forward's mean-pooled hidden states with a
  cosine hinge loss over synonym groups of the synthetic ontology
  (kazu_ray/ontology/synth.py), so that cosine similarity of the
  projected embeddings realizes SapBERT's role in the pipeline
  (reference kazu/utils/sapbert.py:84-254 — self-alignment metric
  learning over synonym pairs, Liu et al. 2021):

  * same-concept surface forms score HIGH — including pairs with ZERO
    lexical overlap ("aspirin" / "acetylsalicylic acid", "influenza" /
    "flu"), which no character-ngram stand-in can do;
  * different-concept labels that share a symbolic synonym score LOW
    (the p27 trio CDKN1B/PAK2/ZNRD2 and the COX1 pair of reference
    base.py:895-905), so compile-time id clustering at the reference's
    0.70 threshold reproduces the reference's groupings.

The checkpoint exercises the full real path end-to-end — WordPiece
tokenization, the transformer forward, mean-pool, trained projection —
and its cosines depend on actual weights: any regression in the
numpy-BERT forward, the tokenizer, or the loader changes the scores and
fails the pinned gates (tests/test_embedder.py + the embedding_eval rows
of the approx_metrics query).

Also writes ``kazu_ray/assets/embed_eval_pairs.csv`` — the frozen
labeled pair set behind the queryable P/R metric.

Deterministic: re-running reproduces the same bytes.  Run from repo root:

    python scripts/train_tiny_embedder.py
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kazu_ray.functions.normalize import normalize  # noqa: E402
from kazu_ray.ontology.synth import _SOURCES, PARSERS  # noqa: E402
from kazu_ray.state.torch_pickle import save_state_dict  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "kazu_ray", "assets", "tiny_bert_embed"
)
EVAL_CSV = os.path.join(
    os.path.dirname(__file__), "..", "kazu_ray", "assets", "embed_eval_pairs.csv"
)

HIDDEN = 128
LAYERS = 2
HEADS = 4
INTERMEDIATE = 256
MAX_POS = 64
PROJ_DIM = 64
SEED = 20260818

_WORD = re.compile(r"[a-z0-9]+")

# hard negatives: different-concept label pairs that share a symbolic
# synonym in the ontology — compile-time clustering (threshold 0.70,
# reference base.py synonym_merge_threshold) MUST keep these apart
HARD_NEGATIVES = [
    ("CDKN1B", "PAK2"),
    ("CDKN1B", "ZNRD2"),
    ("PAK2", "ZNRD2"),
    (
        "prostaglandin-endoperoxide synthase 1",
        "mitochondrially encoded cytochrome c oxidase I",
    ),
    ("PTGS1", "MT-CO1"),
    # shared-word different concepts (reference-test shape: two diseases
    # sharing a symbolic synonym whose labels overlap lexically)
    ("pulmonary fibrosis", "cystic fibrosis"),
    ("pulmonary fibrosis", "cystic fybrosis"),
]

# concept groups beyond the synthetic ontology: morphological variants
# the golden fixtures exercise (the linker's fuzzy-hit confirmation must
# accept ASTHMATIC -> ASTHMA) and the typo'd-mention fixture for
# PreferNearestEmbeddingToDefaultLabel
EXTRA_GROUPS = [
    ["asthma", "asthmatic", "asthmatics"],
    ["cystic fibrosis", "cystic fybrosis"],
    ["pulmonary fibrosis"],
]


def words_of(s: str) -> tuple[str, ...]:
    return tuple(_WORD.findall(s.lower()))


def synonym_groups() -> list[list[str]]:
    """Per-concept surface-form groups (label + synonyms + their
    normalized forms), with cross-concept-ambiguous surfaces removed."""
    raw: list[dict[tuple[str, ...], str]] = []
    for parser, _idx, label, syns, _score in _SOURCES:
        ec = PARSERS[parser]
        surfaces = {label, *syns}
        surfaces |= {normalize(s, ec) for s in set(surfaces)}
        # one representative per word-tuple within the group (the
        # tokenizer lowercases, so "aspirin"/"ASPIRIN" are one string)
        by_words: dict[tuple[str, ...], str] = {}
        for s in sorted(surfaces):
            w = words_of(s)
            if w:
                by_words.setdefault(w, s)
        raw.append(by_words)
    # graft the extra fixture groups in: extend the matching ontology
    # group when one exists (asthma), else add a new group (fibrosis)
    for extra in EXTRA_GROUPS:
        extra_words = {words_of(s) for s in extra}
        host = next((g for g in raw if extra_words & g.keys()), None)
        if host is None:
            host = {}
            raw.append(host)
        for s in sorted(extra):
            host.setdefault(words_of(s), s)
    # drop surfaces ambiguous ACROSS groups (p27, COX1, ...): they
    # cannot be near all their concepts while the concepts stay apart
    seen: dict[tuple[str, ...], int] = {}
    for grp in raw:
        for w in grp:
            seen[w] = seen.get(w, 0) + 1
    return [sorted(s for w, s in grp.items() if seen[w] == 1) for grp in raw]


def build_vocab(groups: list[list[str]]) -> list[str]:
    """Whole lowercased words from every training surface, plus a full
    single-character fallback (a-z, 0-9, and their ##-continuations) so
    ANY string tokenizes without [UNK]."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    pieces: set[str] = set()
    for grp in groups:
        for s in grp:
            pieces.update(words_of(s))
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        pieces.add(c)
        pieces.add("##" + c)
    return vocab + sorted(pieces)


def init_encoder(rng: np.random.Generator, vocab_size: int) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}

    def nrm(*shape):
        return rng.normal(0.0, 0.02, size=shape).astype(np.float32)

    sd["bert.embeddings.word_embeddings.weight"] = nrm(vocab_size, HIDDEN)
    sd["bert.embeddings.position_embeddings.weight"] = nrm(MAX_POS, HIDDEN)
    sd["bert.embeddings.token_type_embeddings.weight"] = nrm(2, HIDDEN)
    sd["bert.embeddings.LayerNorm.weight"] = np.ones(HIDDEN, np.float32)
    sd["bert.embeddings.LayerNorm.bias"] = np.zeros(HIDDEN, np.float32)
    for li in range(LAYERS):
        p = f"bert.encoder.layer.{li}."
        for name in (
            "attention.self.query",
            "attention.self.key",
            "attention.self.value",
            "attention.output.dense",
        ):
            sd[p + name + ".weight"] = nrm(HIDDEN, HIDDEN)
            sd[p + name + ".bias"] = np.zeros(HIDDEN, np.float32)
        sd[p + "attention.output.LayerNorm.weight"] = np.ones(HIDDEN, np.float32)
        sd[p + "attention.output.LayerNorm.bias"] = np.zeros(HIDDEN, np.float32)
        sd[p + "intermediate.dense.weight"] = nrm(INTERMEDIATE, HIDDEN)
        sd[p + "intermediate.dense.bias"] = np.zeros(INTERMEDIATE, np.float32)
        sd[p + "output.dense.weight"] = nrm(HIDDEN, INTERMEDIATE)
        sd[p + "output.dense.bias"] = np.zeros(HIDDEN, np.float32)
        sd[p + "output.LayerNorm.weight"] = np.ones(HIDDEN, np.float32)
        sd[p + "output.LayerNorm.bias"] = np.zeros(HIDDEN, np.float32)
    return sd


def make_pairs(groups: list[list[str]], rng: np.random.Generator):
    """(i, j, is_positive, weight) index pairs over the flat string list."""
    strings: list[str] = []
    str_idx: dict[str, int] = {}
    group_of: list[int] = []
    for gi, grp in enumerate(groups):
        for s in grp:
            if s not in str_idx:
                str_idx[s] = len(strings)
                strings.append(s)
                group_of.append(gi)
    pos, neg, hard = [], [], []
    for gi, grp in enumerate(groups):
        idxs = [str_idx[s] for s in grp]
        for a in range(len(idxs)):
            for b in range(a + 1, len(idxs)):
                pos.append((idxs[a], idxs[b]))
    # generated negatives: group-label pairs with disjoint word sets
    # (lexically-overlapping different concepts — "lung cancer" vs
    # "cancer" — are separated downstream by boolean scorers and
    # disambiguation, not by the embedder; don't force the impossible)
    labels = [grp[0] for grp in groups if grp]
    label_words = [set(words_of(s)) for s in labels]
    for a in range(len(labels)):
        for b in range(a + 1, len(labels)):
            if label_words[a].isdisjoint(label_words[b]):
                if labels[a] in str_idx and labels[b] in str_idx:
                    neg.append((str_idx[labels[a]], str_idx[labels[b]]))
    for a, b in HARD_NEGATIVES:
        for s in (a, b):
            if s not in str_idx:
                str_idx[s] = len(strings)
                strings.append(s)
                group_of.append(-1)
        hard.append((str_idx[a], str_idx[b]))
    return strings, pos, neg, hard


def pooled_features(embedder, strings: list[str]) -> np.ndarray:
    return np.stack([embedder.pooled(s) for s in strings]).astype(np.float64)


def train_projection(X, pos, neg, hard, rng):
    """Adam on a cosine hinge loss; analytic gradient through the
    L2-normalization of the projected vectors."""
    n, d = X.shape
    W = rng.normal(0.0, 1.0 / np.sqrt(d), size=(d, PROJ_DIM))
    mw = np.zeros_like(W)
    vw = np.zeros_like(W)
    pairs = (
        [(i, j, 0.85, 4.0, +1) for i, j in pos]
        + [(i, j, 0.30, 1.0, -1) for i, j in neg]
        + [(i, j, 0.20, 8.0, -1) for i, j in hard]
    )
    pi = np.array([p[0] for p in pairs])
    pj = np.array([p[1] for p in pairs])
    margin = np.array([p[2] for p in pairs])
    weight = np.array([p[3] for p in pairs])
    sign = np.array([p[4] for p in pairs])  # +1: want cos>=margin
    lr0, b1, b2, eps = 0.02, 0.9, 0.999, 1e-8
    for step in range(1, 4001):
        lr = lr0 * 0.5 ** (step / 1000)  # decay for a stable endpoint
        U = X @ W
        norms = np.linalg.norm(U, axis=1, keepdims=True)
        Z = U / np.maximum(norms, 1e-12)
        cos = np.einsum("ij,ij->i", Z[pi], Z[pj])
        # hinge: positives penalize (margin - cos)+, negatives (cos - margin)+
        viol = np.where(sign > 0, margin - cos, cos - margin)
        active = viol > 0
        g_cos = np.where(sign > 0, -2.0, 2.0) * viol * weight * active
        # dcos/dU_i = (z_j - cos*z_i)/|u_i|
        gi = g_cos[:, None] * (Z[pj] - cos[:, None] * Z[pi]) / norms[pi]
        gj = g_cos[:, None] * (Z[pi] - cos[:, None] * Z[pj]) / norms[pj]
        G = np.zeros_like(U)
        np.add.at(G, pi, gi)
        np.add.at(G, pj, gj)
        dW = X.T @ G / len(pairs) + 1e-5 * W
        mw = b1 * mw + (1 - b1) * dW
        vw = b2 * vw + (1 - b2) * dW**2
        W -= lr * (mw / (1 - b1**step)) / (np.sqrt(vw / (1 - b2**step)) + eps)
        if step % 500 == 0:
            pmin = cos[sign > 0].min()
            nmax = cos[sign < 0].max()
            hmax = cos[-len(hard) :].max() if hard else float("nan")
            print(
                f"  step {step}: pos_min {pmin:.3f} neg_max {nmax:.3f} "
                f"hard_max {hmax:.3f} active {int(active.sum())}"
            )
    return W


EVAL_PAIRS = [
    # zero-lexical-overlap positives — require real trained weights
    ("aspirin", "acetylsalicylic acid", 1),
    ("paracetamol", "acetaminophen", 1),
    ("paracetamol", "Tylenol", 1),
    ("influenza", "flu", 1),
    ("imatinib", "Gleevec", 1),
    ("sildenafil", "Viagra", 1),
    ("trastuzumab", "Herceptin", 1),
    ("cholecalciferol", "vitamin D3", 1),
    ("amyotrophic lateral sclerosis", "Lou Gehrig disease", 1),
    ("TP53", "p53", 1),
    ("INS", "insulin", 1),
    ("EGFR", "epidermal growth factor receptor", 1),
    ("ERBB2", "HER2", 1),
    ("TNF", "tumor necrosis factor", 1),
    ("hemophilia B", "Christmas disease", 1),
    ("apoptotic process", "programmed cell death", 1),
    # surface-variant positives
    ("asthma", "asthmatics", 1),
    ("cystic fibrosis", "cystic fybrosis", 1),
    ("melanoma", "malignant melanoma", 1),
    ("lung cancer", "lung carcinoma", 1),
    ("hemophilia A", "haemophilia A", 1),
    ("diabetes mellitus", "diabetes", 1),
    ("T cell", "T lymphocyte", 1),
    ("cancer", "malignant neoplasm", 1),
    # hard negatives: distinct concepts sharing an ambiguous symbol
    ("CDKN1B", "PAK2", 0),
    ("CDKN1B", "ZNRD2", 0),
    ("PAK2", "ZNRD2", 0),
    (
        "prostaglandin-endoperoxide synthase 1",
        "mitochondrially encoded cytochrome c oxidase I",
        0,
    ),
    ("PTGS1", "MT-CO1", 0),
    ("pulmonary fibrosis", "cystic fibrosis", 0),
    # ordinary cross-concept negatives
    ("aspirin", "metformin", 0),
    ("lung", "liver", 0),
    ("brain", "heart", 0),
    ("T cell", "macrophage", 0),
    ("melanoma", "asthma", 0),
    ("EGFR", "KRAS", 0),
    ("influenza", "multiple sclerosis", 0),
    ("kinase activity", "nucleus", 0),
    ("imatinib", "ibuprofen", 0),
]


def main() -> None:
    out = os.path.abspath(OUT_DIR)
    os.makedirs(out, exist_ok=True)
    groups = synonym_groups()
    vocab = build_vocab(groups)
    rng = np.random.default_rng(SEED)
    sd = init_encoder(rng, len(vocab))

    config = {
        "architectures": ["BertModel"],
        "model_type": "bert",
        "hidden_size": HIDDEN,
        "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS,
        "intermediate_size": INTERMEDIATE,
        "max_position_embeddings": MAX_POS,
        "layer_norm_eps": 1e-12,
        "vocab_size": len(vocab),
        "hidden_act": "gelu",
        "type_vocab_size": 2,
        "pad_token_id": 0,
        "pooling": "mean",
        "projection_dim": PROJ_DIM,
    }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
    with open(os.path.join(out, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    save_state_dict(sd, os.path.join(out, "pytorch_model.bin"))

    # ---- features through the REAL production forward -----------------
    from kazu_ray.state.embedder import NumpyBertEmbedder

    embedder = NumpyBertEmbedder(out)  # identity projection at this point
    strings, pos, neg, hard = make_pairs(groups, rng)
    print(
        f"training projection: {len(strings)} strings, {len(pos)} pos / "
        f"{len(neg)} neg / {len(hard)} hard pairs"
    )
    X = pooled_features(embedder, strings)
    W = train_projection(X, pos, neg, hard, rng)

    sd["projection.weight"] = W.T.astype(np.float32)  # torch Linear layout
    save_state_dict(sd, os.path.join(out, "pytorch_model.bin"))

    # ---- verify through the production embedder ------------------------
    emb = NumpyBertEmbedder(out)
    bad = []
    for i, j in pos:
        c = emb.similarity(strings[i], strings[j])
        if c < 0.70:
            bad.append((strings[i], strings[j], c, "pos<0.70"))
    for i, j in hard:
        c = emb.similarity(strings[i], strings[j])
        if c >= 0.55:
            bad.append((strings[i], strings[j], c, "hard>=0.55"))
    nneg_bad = 0
    for i, j in neg:
        if emb.similarity(strings[i], strings[j]) >= 0.60:
            nneg_bad += 1
    for a, b, y in EVAL_PAIRS:
        c = emb.similarity(a, b)
        if (c >= 0.60) != bool(y):
            bad.append((a, b, c, f"eval label {y}"))
    for a, b, c, why in bad[:20]:
        print("VIOLATION", a, "|", b, c, why)
    print(f"violations: {len(bad)}; generated negatives >=0.60: {nneg_bad}")
    if bad or nneg_bad:
        raise SystemExit("trained embedder does not satisfy the gates")

    with open(os.path.abspath(EVAL_CSV), "w") as f:
        f.write("string_a,string_b,is_similar\n")
        for a, b, y in EVAL_PAIRS:
            f.write(f'"{a}","{b}",{y}\n')
    size = os.path.getsize(os.path.join(out, "pytorch_model.bin"))
    print(f"checkpoint written to {out} ({size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
