"""spaCy-Matcher-subset token-pattern engine for disambiguation rules.

The reference's RulesBasedEntityClassDisambiguationFilterStep expresses
its tp/fp rules as spaCy ``Matcher`` patterns evaluated over the
sentence containing each mention, with a custom token extension per
entity class set by KazuToSpacyObjectMapper (reference
rules_based_disambiguation.py:37-260, spacy_object_mapper.py).  This
module implements the subset of the Matcher pattern language those
rules actually use (see conf/RulesBasedEntityClassDisambiguationFilterStep/
default.yaml) over our own offset-preserving tokenizer — which mirrors
the same customised-English tokenization (no hyphen infix split), see
functions/tokens.py:

- token attrs: ``ORTH`` / ``TEXT`` (exact), ``NORM`` (exact text; the
  basic pipeline has no norm exceptions that matter for these rules),
  ``LOWER``, ``IS_DIGIT``, ``IS_ALPHA``, ``IS_UPPER``, ``IS_LOWER``,
  ``LENGTH``;
- custom extensions: ``_: {<entity_class>: bool}`` — true when the
  token lies inside an entity span of that class;
- attr values: a literal, ``{"IN": [...]}``, ``{"NOT_IN": [...]}`` or
  ``{"REGEX": "..."}``;
- quantifiers: ``OP`` of ``"?"``, ``"*"`` or ``"+"`` (the default is
  exactly one).  Other OP values raise at compile time.
"""

from __future__ import annotations

import re
from typing import Any, NamedTuple

from .tokens import tokenize


class MatchToken(NamedTuple):
    text: str
    lower: str
    ent_classes: frozenset


def annotate_tokens(
    text: str, base_offset: int, entities: list[dict]
) -> list[MatchToken]:
    """Tokenize ``text`` (whose first char sits at ``base_offset`` within
    the owning span) and mark each token with the entity classes whose
    spans cover it."""
    ents = [(e["start"], e["end"], e["entity_class"]) for e in entities]
    out = []
    for tok in tokenize(text):
        s, e = base_offset + tok.start, base_offset + tok.end
        classes = frozenset(c for es, ee, c in ents if es < e and s < ee)
        out.append(MatchToken(tok.text, tok.text.lower(), classes))
    return out


def _compile_value(attr: str, value: Any):
    """Return a predicate over the attribute's extracted string/flag."""
    if isinstance(value, dict):
        if "IN" in value:
            allowed = {str(v) for v in value["IN"]}
            return lambda s: s in allowed
        if "NOT_IN" in value:
            blocked = {str(v) for v in value["NOT_IN"]}
            return lambda s: s not in blocked
        if "REGEX" in value:
            rx = re.compile(value["REGEX"])
            return lambda s: rx.search(s) is not None
        raise ValueError(f"unsupported value spec for {attr}: {value!r}")
    sval = str(value)
    return lambda s: s == sval


def _compile_spec(spec: dict):
    """Compile one token spec dict into a predicate over MatchToken."""
    preds = []
    for attr, value in spec.items():
        if attr == "OP":
            continue
        if attr == "_":
            if not isinstance(value, dict):
                raise ValueError(f"custom-extension spec must be a dict: {value!r}")
            for cls, want in value.items():
                preds.append(
                    (lambda c, w: lambda t: (c in t.ent_classes) == bool(w))(cls, want)
                )
        elif attr in ("ORTH", "TEXT", "NORM"):
            p = _compile_value(attr, value)
            preds.append((lambda p: lambda t: p(t.text))(p))
        elif attr == "LOWER":
            p = _compile_value(attr, value)
            preds.append((lambda p: lambda t: p(t.lower))(p))
        elif attr == "IS_DIGIT":
            preds.append((lambda w: lambda t: t.text.isdigit() == w)(bool(value)))
        elif attr == "IS_ALPHA":
            preds.append((lambda w: lambda t: t.text.isalpha() == w)(bool(value)))
        elif attr == "IS_UPPER":
            preds.append((lambda w: lambda t: t.text.isupper() == w)(bool(value)))
        elif attr == "IS_LOWER":
            preds.append((lambda w: lambda t: t.text.islower() == w)(bool(value)))
        elif attr == "LENGTH":
            preds.append((lambda n: lambda t: len(t.text) == n)(int(value)))
        else:
            raise ValueError(f"unsupported Matcher attribute: {attr!r}")
    op = spec.get("OP", "1")
    if op not in ("1", "?", "*", "+"):
        raise ValueError(f"unsupported OP: {op!r}")
    test = (lambda ps: lambda t: all(p(t) for p in ps))(preds)
    return test, op


class TokenMatcher:
    """Boolean 'does any pattern match anywhere in the token sequence'."""

    def __init__(self, patterns: list[list[dict]]):
        self.compiled = [[_compile_spec(spec) for spec in pat] for pat in patterns]

    @staticmethod
    def _match_at(toks: list[MatchToken], i: int, specs, j: int) -> bool:
        if j == len(specs):
            return True
        test, op = specs[j]
        if op == "1":
            return i < len(toks) and test(toks[i]) and TokenMatcher._match_at(
                toks, i + 1, specs, j + 1
            )
        if op == "?":
            if i < len(toks) and test(toks[i]) and TokenMatcher._match_at(
                toks, i + 1, specs, j + 1
            ):
                return True
            return TokenMatcher._match_at(toks, i, specs, j + 1)
        # "+" = one required, then behaves like "*"
        if op == "+":
            if not (i < len(toks) and test(toks[i])):
                return False
            i += 1
        k = i
        while True:
            if TokenMatcher._match_at(toks, k, specs, j + 1):
                return True
            if k < len(toks) and test(toks[k]):
                k += 1
            else:
                return False

    def __call__(self, toks: list[MatchToken]) -> bool:
        for specs in self.compiled:
            for i in range(len(toks) + 1):
                if self._match_at(toks, i, specs, 0):
                    return True
        return False

    @staticmethod
    def _ends(toks: list[MatchToken], i: int, specs, j: int, memo: dict) -> set[int]:
        """All token positions where ``specs[j:]`` can finish when started
        at position ``i`` (memoized — patterns and sentences are small)."""
        key = (i, j)
        hit = memo.get(key)
        if hit is not None:
            return hit
        out: set[int] = set()
        if j == len(specs):
            out.add(i)
        else:
            test, op = specs[j]
            ok = i < len(toks) and test(toks[i])
            if op in ("1", "+") and ok:
                nxt = j + 1 if op == "1" else j
                out |= TokenMatcher._ends(toks, i + 1, specs, nxt, memo)
            if op == "+" and ok:
                out |= TokenMatcher._ends(toks, i + 1, specs, j + 1, memo)
            if op in ("?", "*"):
                out |= TokenMatcher._ends(toks, i, specs, j + 1, memo)
                if ok:
                    nxt = j + 1 if op == "?" else j
                    out |= TokenMatcher._ends(toks, i + 1, specs, nxt, memo)
        memo[key] = out
        return out

    def find_spans(self, toks: list[MatchToken]) -> list[tuple[int, int]]:
        """Non-overlapping (start, end) token ranges, longest-match-wins
        with earlier-start tie-break — spaCy ``util.filter_spans``
        semantics over all raw Matcher hits."""
        raw: list[tuple[int, int]] = []
        for specs in self.compiled:
            for i in range(len(toks)):
                memo: dict = {}
                ends = self._ends(toks, i, specs, 0, memo)
                ends.discard(i)  # zero-width matches are not entities
                if ends:
                    raw.append((i, max(ends)))
        raw.sort(key=lambda se: (-(se[1] - se[0]), se[0]))
        taken: list[tuple[int, int]] = []
        for s, e in raw:
            if all(e <= ts or te <= s for ts, te in taken):
                taken.append((s, e))
        taken.sort()
        return taken
