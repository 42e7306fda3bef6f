"""Build + train the repo's tiny token-classification checkpoint.

Produces ``kazu_ray/assets/tiny_bert_ner/`` — a standard HF-layout
checkpoint directory (config.json + vocab.txt + pytorch_model.bin in
the torch zip format, written WITHOUT torch via
kazu_ray.state.torch_pickle.save_state_dict) holding:

- a tiny BERT encoder with seeded-random weights (the same stand-in
  role as the reference's tests/test_assets/bert_test_model, which is
  also an untrained random tiny BERT), and
- a GENUINELY TRAINED ``classifier.*`` token-classification head:
  numpy softmax regression fitted over the real numpy-BERT forward's
  word-level hidden states on the labeled sentences below, trained to
  100% token accuracy.

The checkpoint therefore exercises the full real path end-to-end —
WordPiece tokenization, the 12-label BIO head, sliding-window forward,
logit merge, decode — and its predictions depend on actual weights: any
regression in the numpy-BERT forward, the tokenizer, or the checkpoint
loader changes the logits and fails the pinned golden tests.

Deterministic: re-running reproduces the same bytes (seeded init, fixed
training schedule).  Run from the repo root:

    python scripts/train_tiny_checkpoint.py
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from kazu_ray.stages.transformer_ner import LABELS  # noqa: E402
from kazu_ray.state.torch_pickle import save_state_dict  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "kazu_ray", "assets", "tiny_bert_ner")

HIDDEN = 64
LAYERS = 2
HEADS = 4
INTERMEDIATE = 128
MAX_POS = 192
SEED = 20260817

# ---------------------------------------------------------------------------
# labeled training sentences.  Markup: [surface|class] tags an entity
# mention; the first word gets B-class, the rest I-class; everything
# else (punctuation included) is O.  The entity surfaces include
# inflected forms ABSENT from both the dictionary-NER synonym automaton
# and the mock gazetteer, so golden rows built on them REQUIRE the
# trained checkpoint.
# ---------------------------------------------------------------------------
SENTENCES = [
    "Aggressive [melanomas|disease] were resected early .",
    "The patient presented with [melanoma|disease] of the skin .",
    "Two [asthmatics|disease] required steroids after exercise .",
    "Childhood [asthma|disease] improved with therapy .",
    "Both [lung cancers|disease] recurred within a year .",
    "Smoking causes [lung cancers|disease] in many patients .",
    "Screening found two [breast cancers|disease] this season .",
    "Seasonal [influenza|disease] spread through the ward .",
    "Low dose [aspirins|drug] were dispensed daily .",
    "He took [aspirin|drug] for the fever .",
    "Generic [paracetamols|drug] are cheap and effective .",
    "She received [metformin|drug] for glucose control .",
    "Oral [imatinib|drug] achieved remission .",
    "Mutations in [EGFR|gene] drive resistance .",
    "The [BRCA1|gene] variant was pathogenic .",
    "Wildtype [TP53|gene] suppresses tumors .",
    "Oncogenic [KRAS|gene] signals constitutively .",
    "The [liver|anatomy] enzymes were elevated .",
    "A biopsy of the [lung|anatomy] was scheduled .",
    "Cultured [hepatocytes|cell] secreted albumin .",
    "Impaired [apoptosis|go_bp] sustains the clone .",
    "Treatment of [melanomas|disease] with [aspirins|drug] failed .",
    "The [asthmatics|disease] avoided [aspirin|drug] exposure .",
    "Resected [lung cancers|disease] expressed [EGFR|gene] strongly .",
    "High [paracetamols|drug] doses stress the [liver|anatomy] badly .",
    "Plasma from [asthmatics|disease] showed markers .",
    "Advanced [melanomas|disease] metastasize to the [liver|anatomy] often .",
    "No mutations were found in controls .",
    "The study enrolled forty volunteers .",
    "Results were published after review .",
    "Placebo arms showed no change .",
    "Follow up visits happened monthly .",
]

_MARK = re.compile(r"\[([^|\]]+)\|([a-z_]+)\]")


def parse_sentence(s: str) -> tuple[list[str], list[str]]:
    words: list[str] = []
    labels: list[str] = []
    pos = 0
    for m in _MARK.finditer(s):
        for w in s[pos : m.start()].split():
            words.append(w)
            labels.append("O")
        ent_words = m.group(1).split()
        cls = m.group(2)
        for i, w in enumerate(ent_words):
            words.append(w)
            labels.append(("B-" if i == 0 else "I-") + cls)
        pos = m.end()
    for w in s[pos:].split():
        words.append(w)
        labels.append("O")
    return words, labels


def build_vocab(parsed) -> list[str]:
    """Whole words for stems, ##-pieces for the plural/adjective
    suffixes, so inflected surfaces exercise the WordPiece path."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    stems = set()
    for words, _labels in parsed:
        for w in words:
            lw = w.lower()
            # store inflected entity forms as stem + suffix pieces
            for stem, suffixes in (
                ("melanoma", ("s",)),
                ("asthmatic", ("s",)),
                ("cancer", ("s",)),
                ("aspirin", ("s",)),
                ("paracetamol", ("s",)),
            ):
                if lw == stem + suffixes[0]:
                    stems.add(stem)
                    stems.add("##" + suffixes[0])
                    break
            else:
                stems.add(lw)
    # "asthmatic" itself decomposes over "asthma" + "##tic"
    stems.update({"asthma", "##tic"})
    return vocab + sorted(stems)


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
        for name in ("attention.self.query", "attention.self.key", "attention.self.value",
                     "attention.output.dense"):
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


def main() -> None:
    out = os.path.abspath(OUT_DIR)
    os.makedirs(out, exist_ok=True)
    parsed = [parse_sentence(s) for s in SENTENCES]
    vocab = build_vocab(parsed)
    rng = np.random.default_rng(SEED)
    sd = init_encoder(rng, len(vocab))

    config = {
        "architectures": ["BertForTokenClassification"],
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
        "id2label": {str(i): l for i, l in enumerate(LABELS)},
        "label2id": {l: i for i, l in enumerate(LABELS)},
    }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
    with open(os.path.join(out, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    save_state_dict(sd, os.path.join(out, "pytorch_model.bin"))

    # ---- collect word hidden states through the REAL forward ----------
    from kazu_ray.state.numpy_bert import NumpyBert, WordPieceTokenizer

    bert = NumpyBert(out)
    tok = WordPieceTokenizer(os.path.join(out, "vocab.txt"))
    feats, targets = [], []
    for words, labels in parsed:
        ids = [tok.cls]
        first = []
        for w in words:
            pieces = tok.word_to_pieces(w)
            first.append(len(ids))
            ids.extend(pieces)
        ids.append(tok.sep)
        hidden = bert.encode(ids)
        for fpos, lab in zip(first, labels):
            feats.append(hidden[fpos])
            targets.append(LABELS.index(lab))
    X = np.asarray(feats, dtype=np.float64)
    y = np.asarray(targets)
    n, k = len(X), len(LABELS)
    print(f"training head: {n} tokens, {k} labels, hidden={HIDDEN}")

    # ---- softmax regression, full-batch gradient descent --------------
    W = np.zeros((HIDDEN, k))
    b = np.zeros(k)
    onehot = np.eye(k)[y]
    lr, l2 = 0.5, 1e-5
    for step in range(4000):
        logits = X @ W + b
        z = logits - logits.max(1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(1, keepdims=True)
        g = (p - onehot) / n
        W -= lr * (X.T @ g + l2 * W)
        b -= lr * g.sum(0)
        if step % 500 == 0:
            acc = float((logits.argmax(1) == y).mean())
            print(f"  step {step}: acc {acc:.4f}")
    acc = float(((X @ W + b).argmax(1) == y).mean())
    margin = float(np.sort(X @ W + b, axis=1)[:, -1].min())
    print(f"final train accuracy: {acc:.4f} (min top logit {margin:.3f})")
    if acc < 1.0:
        raise SystemExit("head did not reach 100% train accuracy; adjust capacity")

    sd["classifier.weight"] = W.T.astype(np.float32)
    sd["classifier.bias"] = b.astype(np.float32)
    save_state_dict(sd, os.path.join(out, "pytorch_model.bin"))

    # ---- verify through the production tagger -------------------------
    from kazu_ray.state.numpy_bert import NumpyBertTagger

    tagger = NumpyBertTagger(out, n_labels=k)
    bad = 0
    for words, labels in parsed:
        pred = tagger.logits(words).argmax(1)
        for p_i, lab in zip(pred, labels):
            bad += LABELS[p_i] != lab
    print(f"tagger verification: {bad} mismatches")
    if bad:
        raise SystemExit("production tagger disagrees with training labels")
    size = os.path.getsize(os.path.join(out, "pytorch_model.bin"))
    print(f"checkpoint written to {out} ({size/1024:.0f} KiB)")


if __name__ == "__main__":
    main()
