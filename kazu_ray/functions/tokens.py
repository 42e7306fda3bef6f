"""Offset-preserving word tokenizer.

Mirrors the reference's customised spaCy English tokenizer semantics
(/root/reference/kazu/utils/spacy_pipeline.py:28-75): split on
whitespace, split off surrounding punctuation, split *inside* a token on
``(``, ``)``, ``/`` and on ``:<>=`` and letter-adjacent commas — but
crucially do NOT split on hyphens/dashes ("ALK-Abello", "EGFR-positive"
stay single tokens), and DO split a trailing ``.`` even after a single
uppercase letter ("Haemophilia A." -> "Haemophilia", "A", ".").

The token start/end sets define word-boundary validity for dictionary
matches (reference: memory_efficient_string_matching.py:97-100, 181-186)
and are reused by the Schwartz–Hearst abbreviation detector.
"""

from __future__ import annotations

import re
from typing import NamedTuple


class Token(NamedTuple):
    start: int  # char offset, inclusive
    end: int  # char offset, exclusive
    text: str


# characters that always become their own single-char token
_HARD_SPLIT = frozenset("()[]{}<>=/;:!?\"“”‘’")
# characters that split only between certain neighbours
_SOFT_COMMA = ","
_SOFT_QUOTE = "'"
_SOFT_DOT = "."

_CHUNK = re.compile(r"\S+")
# chunks containing none of these need no further splitting (fast path)
_NEEDS_SPLIT = re.compile(r"[()\[\]{}<>=/;:!?\"“”‘’',.]")


def _split_chunk(chunk: str, base: int, out: list[Token]) -> None:
    n = len(chunk)
    run_start = 0
    i = 0
    while i < n:
        c = chunk[i]
        split_here = False
        if c in _HARD_SPLIT:
            split_here = True
        elif c == _SOFT_COMMA:
            # keep commas inside digit groups: 1,000
            prev_digit = i > 0 and chunk[i - 1].isdigit()
            next_digit = i + 1 < n and chunk[i + 1].isdigit()
            split_here = not (prev_digit and next_digit)
        elif c == _SOFT_DOT:
            # a dot splits at token end or before more punctuation; interior
            # dots in e.g. "1.5" or "e.g" are kept
            at_end = i == n - 1
            before_punct = i + 1 < n and not chunk[i + 1].isalnum()
            split_here = at_end or before_punct
        elif c == _SOFT_QUOTE:
            # possessive/contraction apostrophes stay ("Alzheimer's");
            # quoting apostrophes at the edges split
            split_here = i == 0 or i == n - 1
        if split_here:
            if run_start < i:
                out.append(Token(base + run_start, base + i, chunk[run_start:i]))
            out.append(Token(base + i, base + i + 1, c))
            run_start = i + 1
        i += 1
    if run_start < n:
        out.append(Token(base + run_start, base + n, chunk[run_start:n]))


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    for m in _CHUNK.finditer(text):
        chunk = m.group()
        if _NEEDS_SPLIT.search(chunk) is None:  # plain word: common case
            out.append(Token(m.start(), m.end(), chunk))
        else:
            _split_chunk(chunk, m.start(), out)
    return out


def boundary_sets(text: str) -> tuple[set[int], set[int]]:
    """(starts, ends-exclusive) char-offset sets for word-boundary checks."""
    starts: set[int] = set()
    ends: set[int] = set()
    for t in tokenize(text):
        starts.add(t.start)
        ends.add(t.end)
    return starts, ends
