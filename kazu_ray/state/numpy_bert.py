"""Pure-numpy BERT encoder + WordPiece tokenizer: the real-model path
for the transformer NER stage in a torch-less container.

The reference runs TinyBERN via HF AutoModelForTokenClassification
(kazu/steps/ner/hf_token_classification.py:29-284).  Torch is not
installed here, so this module implements the public BERT architecture
(Devlin et al. 2018; HF ``BertModel`` layer layout) directly in numpy
over weights loaded by :mod:`kazu_ray.state.torch_pickle`.  On a GPU
cluster you'd swap this for the HF model — the Tagger contract
(``logits(words) -> (n_words, n_labels)``) is identical, and the
windowing/decode stages don't change.

A checkpoint with a ``classifier.*`` head uses it; a bare ``BertModel``
checkpoint (like the reference's tests/test_assets/bert_test_model)
gets a deterministic seeded linear head so the full forward path stays
exercisable end-to-end — documented, and irrelevant to decode-contract
correctness, which only needs *some* (n_words, n_labels) logits.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .torch_pickle import load_state_dict


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a vocab.txt (public
    BERT tokenization algorithm)."""

    def __init__(self, vocab_path: str, lowercase: bool = True):
        self.vocab: dict[str, int] = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.lowercase = lowercase
        self.unk = self.vocab.get("[UNK]", 0)
        self.cls = self.vocab.get("[CLS]", 0)
        self.sep = self.vocab.get("[SEP]", 0)

    def word_to_pieces(self, word: str) -> list[int]:
        if self.lowercase:
            word = word.lower()
        pieces: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            pieces.append(cur)
            start = end
        return pieces or [self.unk]


def _gelu(x: np.ndarray) -> np.ndarray:
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def _layer_norm(x: np.ndarray, w: np.ndarray, b: np.ndarray, eps: float) -> np.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _softmax(x: np.ndarray) -> np.ndarray:
    z = x - x.max(-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(-1, keepdims=True)


class NumpyBert:
    """BERT encoder forward over a loaded state dict."""

    def __init__(self, model_dir: str):
        with open(os.path.join(model_dir, "config.json")) as f:
            cfg = json.load(f)
        self.n_layers = cfg["num_hidden_layers"]
        self.n_heads = cfg["num_attention_heads"]
        self.hidden = cfg["hidden_size"]
        self.eps = cfg.get("layer_norm_eps", 1e-12)
        self.max_pos = cfg.get("max_position_embeddings", 512)
        sd = load_state_dict(os.path.join(model_dir, "pytorch_model.bin"))
        # HF prefixes vary ("bert." for headed models, bare for BertModel)
        self.sd = { (k[5:] if k.startswith("bert.") else k): v for k, v in sd.items() }
        self.classifier = None
        if "classifier.weight" in sd:
            self.classifier = (sd["classifier.weight"], sd.get("classifier.bias"))

    @classmethod
    def from_components(cls, cfg: dict, sd: dict) -> "NumpyBert":
        """Construct from an in-memory config dict + state dict (no
        files) — used by the distillation stage to run a seeded student
        body before any checkpoint is exported."""
        self = cls.__new__(cls)
        self.n_layers = cfg["num_hidden_layers"]
        self.n_heads = cfg["num_attention_heads"]
        self.hidden = cfg["hidden_size"]
        self.eps = cfg.get("layer_norm_eps", 1e-12)
        self.max_pos = cfg.get("max_position_embeddings", 512)
        self.sd = {
            (k[5:] if k.startswith("bert.") else k): v for k, v in sd.items()
        }
        self.classifier = None
        if "classifier.weight" in sd:
            self.classifier = (sd["classifier.weight"], sd.get("classifier.bias"))
        return self

    def _p(self, name: str) -> np.ndarray:
        return self.sd[name]

    def encode(self, input_ids: list[int]) -> np.ndarray:
        """(seq,) token ids -> (seq, hidden) final hidden states."""
        ids = np.asarray(input_ids)[: self.max_pos]
        seq = len(ids)
        x = (
            self._p("embeddings.word_embeddings.weight")[ids]
            + self._p("embeddings.position_embeddings.weight")[:seq]
            + self._p("embeddings.token_type_embeddings.weight")[0]
        )
        x = _layer_norm(
            x,
            self._p("embeddings.LayerNorm.weight"),
            self._p("embeddings.LayerNorm.bias"),
            self.eps,
        )
        hd = self.hidden // self.n_heads
        for li in range(self.n_layers):
            p = f"encoder.layer.{li}."
            q = x @ self._p(p + "attention.self.query.weight").T + self._p(p + "attention.self.query.bias")
            k = x @ self._p(p + "attention.self.key.weight").T + self._p(p + "attention.self.key.bias")
            v = x @ self._p(p + "attention.self.value.weight").T + self._p(p + "attention.self.value.bias")
            q = q.reshape(seq, self.n_heads, hd).transpose(1, 0, 2)
            k = k.reshape(seq, self.n_heads, hd).transpose(1, 0, 2)
            v = v.reshape(seq, self.n_heads, hd).transpose(1, 0, 2)
            att = _softmax((q @ k.transpose(0, 2, 1)) / np.sqrt(hd))
            ctx = (att @ v).transpose(1, 0, 2).reshape(seq, self.hidden)
            ctx = ctx @ self._p(p + "attention.output.dense.weight").T + self._p(
                p + "attention.output.dense.bias"
            )
            x = _layer_norm(
                x + ctx,
                self._p(p + "attention.output.LayerNorm.weight"),
                self._p(p + "attention.output.LayerNorm.bias"),
                self.eps,
            )
            inter = _gelu(
                x @ self._p(p + "intermediate.dense.weight").T
                + self._p(p + "intermediate.dense.bias")
            )
            out = inter @ self._p(p + "output.dense.weight").T + self._p(p + "output.dense.bias")
            x = _layer_norm(
                x + out,
                self._p(p + "output.LayerNorm.weight"),
                self._p(p + "output.LayerNorm.bias"),
                self.eps,
            )
        return x


class NumpyBertTagger:
    """Tagger-protocol adapter: word-level logits from a BERT checkpoint.

    Each word is WordPiece-tokenized; the WORD's logits are its first
    sub-token's, matching the reference's word-alignment convention
    (hf_token_classification.py's first-subword labeling).
    """

    def __init__(self, model_dir: str, n_labels: int, head_seed: int = 13):
        self.bert = NumpyBert(model_dir)
        self.tok = WordPieceTokenizer(os.path.join(model_dir, "vocab.txt"))
        self.n_labels = n_labels
        if self.bert.classifier is not None:
            w, b = self.bert.classifier
            self.head_w = np.asarray(w, dtype=np.float64).T
            self.head_b = np.zeros(w.shape[0]) if b is None else np.asarray(b, dtype=np.float64)
        else:
            # bare-BertModel checkpoint: deterministic seeded head (see
            # module docstring)
            rng = np.random.default_rng(head_seed)
            self.head_w = rng.standard_normal((self.bert.hidden, n_labels))
            self.head_b = np.zeros(n_labels)

    def logits(self, words: list[str]) -> np.ndarray:
        piece_ids = [self.tok.cls]
        first_piece_pos = []
        for w in words:
            pieces = self.tok.word_to_pieces(w)
            first_piece_pos.append(len(piece_ids))
            piece_ids.extend(pieces)
        piece_ids.append(self.tok.sep)
        hidden = self.bert.encode(piece_ids)
        # positions beyond max_pos were truncated by encode()
        sel = np.minimum(first_piece_pos, len(hidden) - 1)
        word_hidden = hidden[sel]
        return (word_hidden @ self.head_w + self.head_b).astype(np.float32)
