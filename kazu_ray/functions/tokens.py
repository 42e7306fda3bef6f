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


def is_token_start(text: str, s: int) -> bool:
    """O(1) equivalent of ``s in boundary_sets(text)[0]`` — lets a
    batch matcher validate word boundaries per match without tokenizing
    the whole span (property-tested against the tokenizer)."""
    n_len = len(text)
    if s <= 0:
        return s == 0
    if s >= n_len:
        return False
    c = text[s]
    # punctuation at s that forms its own token starts a token there
    if c in _HARD_SPLIT:
        return True
    if c == _SOFT_COMMA and not (
        text[s - 1].isdigit() and s + 1 < n_len and text[s + 1].isdigit()
    ):
        return True
    if c == _SOFT_DOT and (s + 1 >= n_len or not text[s + 1].isalnum()):
        return True
    if c == _SOFT_QUOTE and (s + 1 >= n_len or text[s + 1].isspace()):
        return True
    p = text[s - 1]
    if p.isspace() or p in _HARD_SPLIT:
        return True
    if p == _SOFT_COMMA:
        # comma kept inside digit groups (1,000)
        return not (s >= 2 and text[s - 2].isdigit() and c.isdigit())
    if p == _SOFT_DOT:
        # the dot was split off iff the char after it is not alnum
        return not c.isalnum()
    if p == _SOFT_QUOTE:
        # apostrophe splits only at chunk edges (leading quote)
        return s < 2 or text[s - 2].isspace()
    return False


def is_token_end(text: str, e: int) -> bool:
    """O(1) equivalent of ``e in boundary_sets(text)[1]``."""
    n_len = len(text)
    if e >= n_len:
        return e == n_len
    if e <= 0:
        return False
    last = text[e - 1]
    # punctuation just before e that forms its own token ends a token at e
    if last in _HARD_SPLIT:
        return True
    if last == _SOFT_COMMA and not (
        e >= 2 and text[e - 2].isdigit() and text[e].isdigit()
    ):
        return True
    if last == _SOFT_DOT and not text[e].isalnum():
        return True
    if last == _SOFT_QUOTE and (e < 2 or text[e - 2].isspace()):
        return True
    n = text[e]
    if n.isspace() or n in _HARD_SPLIT:
        return True
    if n == _SOFT_COMMA:
        return not (last.isdigit() and e + 1 < n_len and text[e + 1].isdigit())
    if n == _SOFT_DOT:
        return e + 1 >= n_len or not text[e + 1].isalnum()
    if n == _SOFT_QUOTE:
        return e + 1 >= n_len or text[e + 1].isspace()
    return False
