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

Conjunction splitting ("skin, lung and breast cancer" -> skin cancer /
lung cancer / breast cancer) follows SplitOnConjunctionPattern
(entity_post_processing.py:29-93) with a rule-based anchor-head-noun
fallback instead of the scispacy dependency parse: the last
conjunct phrase is the anchor, its final token the shared head noun.
Covers the "X, Y and Z HEAD" shapes the reference tests pin; true
dep-parse chunking remains a model-pack upgrade.
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


_CONJ_WORDS = ("and", "or", "nor")
# ", and " (Oxford comma) must be ONE separator, not a comma split that
# leaves "and X" as an item
_CONJ_SPLIT = re.compile(r"\s*,\s*(?:(?:and|or|nor)\s+)?|\s+(?:and|or|nor)\s+")


def split_conjunction(match: str) -> list[str]:
    """Conjunction split (reference SplitOnConjunctionPattern,
    entity_post_processing.py:29-93 — spacy noun-chunk version): the
    last conjunct phrase anchors the shared head noun, e.g.
    "skin, lung and breast cancer" -> ["breast cancer", "skin cancer",
    "lung cancer"].  Returns [] when no conjunction or no multiword
    anchor to borrow a head noun from.

    Round 5: the LEARNED POS chunker (functions/pos_chunker.py, trained
    perceptron tagger) takes precedence when its asset is shipped — it
    keeps these rule semantics for flat nominal coordination, VETOES
    non-nominal shapes (verbal/clausal coordination no longer
    distributes a bogus head), and adds head-FIRST "H of the A and B"
    coordination.  This string rule remains the asset-less fallback."""
    from ..functions.pos_chunker import split_conjunction_tagged

    tagged = split_conjunction_tagged(match)
    if tagged is not None:
        return tagged
    if not any(f" {w} " in match for w in _CONJ_WORDS):
        return []
    items = [x for x in _CONJ_SPLIT.split(match) if x]
    if len(items) < 2:
        return []
    anchor = items[-1]
    anchor_words = anchor.split()
    if len(anchor_words) < 2:
        # "lung and liver": no head noun to distribute
        return []
    head = anchor_words[-1]
    out = [anchor]
    for item in items[:-1]:
        out.append(f"{item} {head}")
    return out


# span-breaking chars for the smart finder include whitespace: every word
# boundary is a potential span start (reference SmartSpanFinder:247)
_SMART_BREAKERS = {"(", ")", ";", " "}


def _labels_above(probs_row: np.ndarray, threshold: float) -> set[tuple[str, str | None]]:
    out: set[tuple[str, str | None]] = set()
    for li in np.argwhere(probs_row > threshold).ravel():
        label = LABELS[int(li)]
        if label == "O":
            out.add(("O", None))
        else:
            bio, cls = label.split("-", 1)
            out.add((bio, cls))
    return out


def decode_spans_smart(
    tokens: list[Token], probs: np.ndarray, text: str, threshold: float = 0.15
) -> list[tuple[int, int, str]]:
    """Soft-label nested/overlapping span decode (reference
    SmartSpanFinder, tokenized_word_processor.py:236-321): every label
    above ``threshold`` is live, so one token sequence can yield
    overlapping spans of different classes and nested same-class spans
    (a B label inside an open span snapshots it).

    ``probs`` is (n_tokens, n_labels) softmax output.
    """
    active: list[dict] = []  # {"clazz": str, "toks": [Token]}
    closed: list[dict] = []

    def start_spans(labels, word):
        for bio, cls in labels:
            if bio == "B" and cls is not None:
                active.append({"clazz": cls, "toks": [word]})

    def update_active(labels, word):
        for span in active:
            for bio, cls in labels:
                if bio == "B" and cls == span["clazz"]:
                    closed.append({"clazz": span["clazz"], "toks": list(span["toks"])})
                if cls == span["clazz"]:
                    span["toks"].append(word)

    def close_all():
        nonlocal active
        closed.extend(s for s in active if s["toks"])
        active = []

    for wi, (tok, row) in enumerate(zip(tokens, probs)):
        labels = _labels_above(row, threshold)
        classes = {c for _b, c in labels if c is not None}
        if wi == 0 or not active:
            start_spans(labels, tok)
        else:
            prev_char = text[tok.start - 1] if tok.start > 0 else " "
            if prev_char not in _SMART_BREAKERS or classes:
                update_active(labels, tok)
                start_spans(labels, tok)  # subspans for every soft B
            else:
                close_all()
                start_spans(labels, tok)
    close_all()

    seen = set()
    out = []
    for s in closed:
        key = (s["toks"][0].start, s["toks"][-1].end, s["clazz"])
        if key not in seen:
            seen.add(key)
            out.append(key)
    return out


def softmax(logits: np.ndarray) -> np.ndarray:
    z = logits - logits.max(axis=-1, keepdims=True)
    e = np.exp(z)
    return e / e.sum(axis=-1, keepdims=True)


class TransformerNer:
    """Actor-pool UDF: extends the ``entities`` column with model spans.

    On a real cluster this is the GPU pool:
    ``map_batches(TransformerNer, concurrency=k, num_gpus=1, ...)`` with
    the checkpoint loaded once per actor."""

    def __init__(
        self,
        tagger: str = "mock",
        span_finder: str = "simple",
        smart_threshold: float = 0.15,
    ):
        self.tagger = MockBioTagger() if tagger == "mock" else _load_real_tagger(tagger)
        if span_finder not in ("simple", "smart"):
            raise ValueError(f"unknown span_finder {span_finder!r}")
        self.span_finder = span_finder
        self.smart_threshold = smart_threshold

    def _pieces(self, stripped: str, cls: str) -> list[str]:
        """NonContiguousEntitySplitter (entity_post_processing.py:169-193):
        numerical-list rule for every class (mirrors round-1 behavior);
        conjunction rule for disease/anatomy phrases."""
        pieces = split_numerical_list(stripped)
        if cls in ("disease", "anatomy"):
            conj = split_conjunction(stripped)
            if conj:
                # parent match kept too, as the reference keeps the
                # original entity alongside its splits
                pieces = pieces + conj
        return pieces

    def tag_span_text(self, text: str, span_idx: int) -> list[dict]:
        toks = tokenize(text)
        if not toks:
            return []
        logits = window_logits(self.tagger, [t.text for t in toks])
        if self.span_finder == "smart":
            spans = decode_spans_smart(
                toks, softmax(logits), text, self.smart_threshold
            )
        else:
            spans = decode_spans(toks, logits, text)
        out = []
        for start, end, cls in spans:
            raw = text[start:end]
            stripped = strip_suffix(raw, cls)
            end = start + len(stripped)
            for piece in self._pieces(stripped, cls):
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
    """Load a real BERT checkpoint directory as the tagger.

    Uses the pure-numpy forward (state/numpy_bert.py) so a HF-format
    checkpoint (config.json + pytorch_model.bin + vocab.txt) runs even
    without torch; on a GPU cluster, replace with HF
    AutoModelForTokenClassification — the Tagger contract is the same.
    """
    import os

    if os.path.isdir(spec) and os.path.isfile(os.path.join(spec, "pytorch_model.bin")):
        from ..state.numpy_bert import NumpyBertTagger

        return NumpyBertTagger(spec, n_labels=len(LABELS))
    raise NotImplementedError(
        f"tagger spec {spec!r} is not a checkpoint directory; torch/transformers "
        "are not available in this environment for hub names"
    )
