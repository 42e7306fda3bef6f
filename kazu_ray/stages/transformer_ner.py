"""Transformer token-classification NER stage (TinyBERN-shaped).

Re-realizes TransformersModelForTokenClassificationNerStep (reference
steps/ner/hf_token_classification.py:29-284): sliding-window tokenization
(max_sequence_length=128, stride=16 — conf default.yaml), per-window
model forward, overlap-trimmed logit merge (:140-233), argmax BIO decode
with span-breaking chars and suffix stripping
(tokenized_word_processor.py:166-463), and numerical-list entity
splitting (entity_post_processing.py:96-167).

Torch/transformers are not installed in this environment, so the model
forward is behind the ``Tagger`` interface: ``MockBioTagger`` is a
deterministic gazetteer-backed stand-in producing one-hot logits with
the same (n_tokens, n_labels) contract a real
``AutoModelForTokenClassification`` head would produce.  On a GPU
cluster, implement ``Tagger.logits`` with the HF checkpoint loaded in
``__init__`` (once per actor) and nothing else changes — windowing,
merge, decode and splitting are model-agnostic and fully tested.

Deviation, documented: the reference's conjunction splitter
(SplitOnConjunctionPattern) requires a scispacy dependency parse; it is
out of scope here (no model), and non-contiguous split entities are
represented by their covering contiguous span.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..constants import NS_TRANSFORMER_NER, PROBABLE
from ..functions.normalize import normalize
from ..functions.tokens import Token, tokenize
from ..schemas import ENTITIES_COLUMN

CLASSES = ["gene", "disease", "drug", "anatomy", "cell", "go_bp"]
LABELS = ["O"] + [f"{p}-{c}" for c in CLASSES for p in ("B", "I")]
LABEL_IDX = {l: i for i, l in enumerate(LABELS)}

MAX_SEQ = 128  # reference conf: max_sequence_length
STRIDE = 16  # reference conf: stride (overlap tokens)

SPAN_BREAKERS = {"(", ")", ";"}
# reference conf strip_re for gene entities
_GENE_STRIP = re.compile(r"( (gene|protein)s?)+$")

# small gazetteer standing in for TinyBERN weights (see module docstring)
_GAZETTEER: dict[tuple[str, ...], str] = {
    ("egfr",): "gene",
    ("brca1",): "gene",
    ("brca2",): "gene",
    ("tp53",): "gene",
    ("kras",): "gene",
    ("pten",): "gene",
    ("epidermal", "growth", "factor", "receptor"): "gene",
    ("tumor", "necrosis", "factor"): "gene",
    ("melanoma",): "disease",
    ("asthma",): "disease",
    ("influenza",): "disease",
    ("breast", "cancer"): "disease",
    ("lung", "cancer"): "disease",
    ("aspirin",): "drug",
    ("metformin",): "drug",
    ("imatinib",): "drug",
    ("lung",): "anatomy",
    ("liver",): "anatomy",
    ("hepatocyte",): "cell",
    ("hepatocytes",): "cell",
    ("apoptosis",): "go_bp",
}
_GAZ_FIRST = {k[0] for k in _GAZETTEER}
_GAZ_MAXLEN = max(len(k) for k in _GAZETTEER)


class MockBioTagger:
    """Deterministic logits: one-hot BIO tags from the gazetteer."""

    n_labels = len(LABELS)

    def logits(self, tokens: list[str]) -> np.ndarray:
        n = len(tokens)
        out = np.zeros((n, self.n_labels), dtype=np.float32)
        out[:, 0] = 1.0  # O
        lowered = [t.lower() for t in tokens]
        i = 0
        while i < n:
            if lowered[i] in _GAZ_FIRST:
                for ln in range(min(_GAZ_MAXLEN, n - i), 0, -1):
                    cls = _GAZETTEER.get(tuple(lowered[i : i + ln]))
                    if cls is not None:
                        out[i, :] = 0.0
                        out[i, LABEL_IDX[f"B-{cls}"]] = 1.0
                        for j in range(i + 1, i + ln):
                            out[j, :] = 0.0
                            out[j, LABEL_IDX[f"I-{cls}"]] = 1.0
                        i += ln - 1
                        break
            i += 1
        return out


def window_logits(tagger, tokens: list[str], max_seq: int = MAX_SEQ, stride: int = STRIDE) -> np.ndarray:
    """Sliding-window forward + overlap-trimmed merge.

    Windows advance by (max_seq - stride); in the overlap between two
    consecutive windows, the first half of the overlap keeps the earlier
    window's logits, the second half the later one's (half-stride trim,
    reference hf_token_classification.py:195-233)."""
    n = len(tokens)
    if n <= max_seq:
        return tagger.logits(tokens)
    out = np.zeros((n, tagger.n_labels), dtype=np.float32)
    step = max_seq - stride
    starts = list(range(0, max(n - stride, 1), step))
    for wi, s in enumerate(starts):
        e = min(s + max_seq, n)
        logits = tagger.logits(tokens[s:e])
        lo = s if wi == 0 else s + stride // 2
        hi = e if e == n or wi == len(starts) - 1 else e - stride // 2
        out[lo:hi] = logits[lo - s : hi - s]
        if e >= n:
            break
    return out


def decode_spans(
    tokens: list[Token], logits: np.ndarray, text: str
) -> list[tuple[int, int, str]]:
    """Argmax BIO decode -> (start, end, entity_class) spans.

    Contiguous B-x/I-x runs of one class form a span; span-breaking
    characters close any open span (tokenized_word_processor.py:166-233)."""
    spans: list[tuple[int, int, str]] = []
    cur_cls, cur_start, cur_end = None, 0, 0
    for tok, row in zip(tokens, logits):
        label = LABELS[int(np.argmax(row))]
        if tok.text in SPAN_BREAKERS:
            if cur_cls:
                spans.append((cur_start, cur_end, cur_cls))
                cur_cls = None
            continue
        if label == "O":
            if cur_cls:
                spans.append((cur_start, cur_end, cur_cls))
                cur_cls = None
            continue
        prefix, cls = label.split("-", 1)
        if prefix == "B" or cls != cur_cls:
            if cur_cls:
                spans.append((cur_start, cur_end, cur_cls))
            cur_cls, cur_start = cls, tok.start
        cur_end = tok.end
    if cur_cls:
        spans.append((cur_start, cur_end, cur_cls))
    return spans


def strip_suffix(match: str, entity_class: str) -> str:
    if entity_class == "gene":
        return _GENE_STRIP.sub("", match)
    return match


_NUM_LIST = re.compile(r"^(?P<prefix>[A-Za-z][A-Za-z-]*?)(?P<first>\d+)(?P<rest>(/\d+)+)$")


def split_numerical_list(match: str) -> list[str]:
    """"BRCA1/2/3" -> ["BRCA1", "BRCA2", "BRCA3"]
    (SplitOnNumericalListPatternWithPrefix, entity_post_processing.py:96-167)."""
    m = _NUM_LIST.match(match)
    if not m:
        return [match]
    prefix = m.group("prefix")
    nums = [m.group("first")] + m.group("rest").strip("/").split("/")
    return [f"{prefix}{n}" for n in nums]


class TransformerNer:
    """Actor-pool UDF: extends the ``entities`` column with model spans.

    On a real cluster this is the GPU pool:
    ``map_batches(TransformerNer, concurrency=k, num_gpus=1, ...)`` with
    the checkpoint loaded once per actor."""

    def __init__(self, tagger: str = "mock"):
        self.tagger = MockBioTagger() if tagger == "mock" else _load_real_tagger(tagger)

    def tag_span_text(self, text: str, span_idx: int) -> list[dict]:
        toks = tokenize(text)
        if not toks:
            return []
        logits = window_logits(self.tagger, [t.text for t in toks])
        out = []
        for start, end, cls in decode_spans(toks, logits, text):
            raw = text[start:end]
            stripped = strip_suffix(raw, cls)
            end = start + len(stripped)
            for piece in split_numerical_list(stripped):
                out.append(
                    {
                        "span_idx": span_idx,
                        "start": start,
                        "end": end,
                        "match": piece,
                        "match_norm": normalize(piece, cls),
                        "entity_class": cls,
                        "namespace": NS_TRANSFORMER_NER,
                        "mention_confidence": PROBABLE,
                        "candidates": [],
                        "mappings": [],
                    }
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ents_col = batch.column("entities").to_pylist() if "entities" in batch.schema.names else [
            [] for _ in range(len(batch))
        ]
        new_col = []
        for spans, ents in zip(batch.column("spans").to_pylist(), ents_col):
            added = list(ents)
            for i, sp in enumerate(spans):
                if sp["text"]:
                    added.extend(self.tag_span_text(sp["text"], i))
            new_col.append(added)
        if "entities" in batch.schema.names:
            batch = batch.drop_columns(["entities"])
        return batch.append_column("entities", pa.array(new_col, type=ENTITIES_COLUMN))


def _load_real_tagger(spec: str):
    raise NotImplementedError(
        "torch/transformers are not available in this environment; "
        "plug a HF AutoModelForTokenClassification here on a GPU cluster"
    )
