"""Sentence segmentation stage.

Re-realizes the reference's sentence-span machinery (StanzaStep writes
``section.sentence_spans``, /root/reference/kazu/steps/other/stanza.py:
14-117; Section._sentence_spans write-once semantics data.py:532-547) as
a vectorizable regex sentencizer producing a ``sent_spans`` column:
``list<list<struct<span_idx:int32, start:int32, end:int32>>>`` per doc.

The genia-trained Stanza model is not available here; the rule-based
splitter covers the biomedical-abstract shapes the pipeline consumes:
sentence break after . ! ? followed by whitespace + capital/digit,
suppressed after common scholarly/biomedical abbreviations ("Fig.",
"et al.", "i.e.", "ca.", "vs.", …) and after single-uppercase initials
("J. Smith"; species shorthand "E. coli" never matches the boundary
because the next word is lowercase).  A model-backed splitter would
slot into the same actor-pool stage.
"""

from __future__ import annotations

import re

import pyarrow as pa

SENT_STRUCT = pa.struct(
    [("span_idx", pa.int32()), ("start", pa.int32()), ("end", pa.int32())]
)

# break after terminal punctuation + whitespace when followed by an
# uppercase letter, digit or opening bracket; ALSO at the no-space
# joins common in concatenated PubMed abstracts ("prevalent.Although",
# "analyses.Objectives:"), recognized by period immediately followed by
# Uppercase+lowercase (decimals and identifiers like "0.51" / "CYP2C19"
# never match; abbreviations are suppressed by the shared check)
_BOUNDARY = re.compile(r"(?<=[.!?])(?:\s+(?=[A-Z0-9(\"])|(?=[A-Z][a-z]))")

# words whose trailing period is (almost) never a sentence end in
# scholarly/biomedical prose — checked lowercased, period stripped
_ABBREVIATIONS = frozenset(
    "fig figs al e.g i.e cf vs ca approx no nos st dr prof mr mrs ms "
    "ref refs eq eqs sec ch vol pp resp spp subsp var min max ed eds "
    "inc ltd".split()
)

# longest abbreviation we need to look back for ('mrs.' + brackets)
_MAX_ABBREV_LOOKBACK = 16


def _is_abbreviation_end(text: str, end: int) -> bool:
    """Is the word ending at ``end`` an abbreviation/initial?  Bounded
    backward scan — O(word length) per boundary, no prefix slicing."""
    i = end
    while i > 0 and not text[i - 1].isspace() and end - i < _MAX_ABBREV_LOOKBACK:
        i -= 1
    word = text[i:end].lstrip("([{\"'")
    if not word:
        return False
    bare = word[:-1] if word.endswith(".") else word
    if bare.lower().rstrip(".") in _ABBREVIATIONS or bare.lower() in _ABBREVIATIONS:
        return True
    # single uppercase initial: 'J. Smith' (start-of-text or after space)
    if len(bare) == 1 and bare.isupper() and word.endswith("."):
        return True
    return False


def sentence_spans(text: str) -> list[tuple[int, int]]:
    out = []
    start = 0
    for m in _BOUNDARY.finditer(text):
        if _is_abbreviation_end(text, m.start()):
            continue
        end = m.start()
        if end > start:
            out.append((start, end))
        start = m.end()
    if start < len(text):
        stripped = text[start:].rstrip()
        if stripped:
            out.append((start, start + len(stripped)))
    return out


def add_sentence_spans(batch: pa.Table) -> pa.Table:
    """map_batches UDF: adds ``sent_spans`` (write-once; spans column
    untouched — the per-row invariant holds)."""
    col = []
    for spans in batch.column("spans").to_pylist():
        doc_sents = []
        for i, sp in enumerate(spans):
            if sp["text"]:
                for s, e in sentence_spans(sp["text"]):
                    doc_sents.append({"span_idx": i, "start": s, "end": e})
        col.append(doc_sents)
    if "sent_spans" in batch.schema.names:
        raise ValueError("sent_spans already set (write-once, reference data.py:532-547)")
    return batch.append_column("sent_spans", pa.array(col, type=pa.list_(SENT_STRUCT)))
