"""Canonical string normalization: surface form -> ``term_norm`` key.

This is THE key function of the engine: the same normalizer keys the
ontology synonym table at dictionary-compile time and the entity matches
at run time, so the two sides agree exactly.

Behavioral parity with the reference normalizer
(/root/reference/kazu/utils/string_normalizer.py:44-445, Gilda
depluralization rules :529-570 — published in Gyori et al. 2022,
"Gilda: biomedical entity text normalization", BSD-licensed public
algorithm) is asserted by the golden vectors in
tests/test_normalize.py, which were produced by running the reference
implementation on a probe set of biomedical strings.

Everything here is a pure scalar function; the hot path wraps it in an
lru_cache per worker process and calls it inside ``map_batches`` UDFs.
"""

from __future__ import annotations

import re
from functools import lru_cache

import regex as _regex

from .lang import DASH_CHARS, GREEK_TO_NAME

# ---------------------------------------------------------------------------
# building-block scalar transforms (applied in a fixed order per entity class)
# ---------------------------------------------------------------------------

# substring rewrites, applied first and in this exact order (longest roman
# numerals first so e.g. VIII is not eaten by VII/III).
_LITERAL_SUBS: tuple[tuple[str, str], ...] = (
    ("(", " ("),
    (")", ") "),
    (",", " "),
    ("/", " "),
    ("VIII", " 8 "),
    ("VII", " 7 "),
    ("XII", " 12 "),
    ("III", " 3 "),
    ("VI", " 6 "),
    ("IV", " 4 "),
    ("IX", " 9 "),
    ("XI", " 11 "),
    ("II", " 2 "),
)

# regex rewrites applied after the literal ones: drop hyphens/minus signs
# unless bracket-wrapped, then digitize standalone roman I/V/X.
_REGEX_SUBS: tuple[tuple[re.Pattern[str], str], ...] = (
    (re.compile(r"(?<!\()-(?!\))"), " "),
    (re.compile(r"(?<!\()‐(?!\))"), " "),
    (re.compile(r"\sI\s|\sI$"), " 1 "),
    (re.compile(r"\sV\s|\sV$"), " 5 "),
    (re.compile(r"\sX\s|\sX$"), " 10 "),
)

# trailing single-letter A/B -> greek names, applied last (post upper-casing
# of greek chars, pre final whitespace collapse).
_AB_TO_GREEK: tuple[tuple[re.Pattern[str], str], ...] = (
    (re.compile(r"\sA\s|\sA$|^A\s"), " ALPHA "),
    (re.compile(r"\sB\s|\sB$|^B\s"), " BETA "),
)

_DIGIT_RUN = re.compile(r"(\d+)")
_ALLOWED_PUNCT = frozenset({" ", "(", ")", "+", "-", "‐"})
_ALL_CAPS = _regex.compile(r"^\p{Lu}+$")
_DASH_OR_SPACE = re.compile("[ " + "".join("\\-" if d == "-" else d for d in sorted(DASH_CHARS)) + "]+")


def rewrite_substrings(s: str) -> str:
    for lit, rep in _LITERAL_SUBS:
        if lit in s:
            s = s.replace(lit, rep)
    for pat, rep in _REGEX_SUBS:
        s = pat.sub(rep, s)
    return s


def pad_numbers(s: str) -> str:
    """Split digit runs out into their own whitespace-delimited tokens."""
    return " ".join(part.strip() for part in _DIGIT_RUN.split(s))


def spell_out_greek(s: str) -> str:
    for ch, name in GREEK_TO_NAME.items():
        if ch in s:
            s = s.replace(ch, f" {name.upper()} ")
    return s


def strip_non_alnum(s: str) -> str:
    return "".join(c for c in s if c.isalnum() or c in _ALLOWED_PUNCT)


def depluralize(word: str) -> tuple[str, str]:
    """Gilda depluralization: returns (singular, rule-tag).

    Rules (Gyori et al. 2022): keep non-s/-sis endings; -oes -> -o;
    -ies -> -y; -xes/-ses/-ches/-shes -> strip es; ALLCAPSs -> strip s;
    otherwise strip the final s.
    """
    if not word.endswith("s") or word.endswith("sis"):
        return word, "non_plural"
    if word.endswith("oes"):
        return word[:-2], "plural_oes"
    if word.endswith("ies"):
        return word[:-3] + "y", "plural_ies"
    if word.endswith(("xes", "ses", "ches", "shes")):
        return word[:-2], "plural_es"
    if _ALL_CAPS.match(word[:-1]):
        return word[:-1], "plural_caps_s"
    return word[:-1], "plural_s"


def greek_letter_abbrevs(s: str) -> str:
    for pat, rep in _AB_TO_GREEK:
        s = pat.sub(rep, s)
    return s


def split_on_dashes_or_space(s: str) -> list[str]:
    return _DASH_OR_SPACE.split(s)


# ---------------------------------------------------------------------------
# symbol-vs-noun-phrase classification
# ---------------------------------------------------------------------------


def _default_is_symbolic(s: str) -> bool:
    """Upper/lower + numeric/alpha ratio heuristic.

    Single short tokens, single tokens with mid-word capitals or digits,
    majority-uppercase strings and majority-numeric strings are symbols.
    """
    tokens = s.split(" ")
    single = len(tokens) == 1
    if single and len(s) <= 3:
        return True
    upper = lower = numeric = 0
    for i, c in enumerate(s):
        if c.isalpha():
            if c.isupper():
                upper += 1
                if i > 0 and single:
                    return True
            else:
                lower += 1
        elif c.isnumeric():
            if single:
                return True
            numeric += 1
    return upper >= lower or numeric >= (upper + lower)


def _gene_token_is_symbolic(tok: str) -> bool:
    """Per-token variant: lower-then-upper casing (erbB2) is symbolic."""
    upper = lower = numeric = 0
    starts_lower = bool(tok) and tok[0].islower()
    for c in tok:
        if c.isalpha():
            if c.isupper():
                if starts_lower:
                    return True
                upper += 1
            else:
                lower += 1
        elif c.isnumeric():
            numeric += 1
    return upper >= lower or numeric >= (upper + lower)


_GENE_NOUN_SUFFIXES = ("in", "ase", "an", "gen", "gon")


def _gene_is_symbolic(s: str) -> bool:
    toks = split_on_dashes_or_space(s)
    if len(toks) == 1 and not toks[0].endswith(_GENE_NOUN_SUFFIXES):
        return True
    return all(len(t) < 4 or _gene_token_is_symbolic(t) for t in toks)


_DISEASE_SHORT_NOUNS = frozenset({"flu", "Flu", "HIV", "STI", "NSCLC"})


def _disease_is_symbolic(s: str) -> bool:
    return s not in _DISEASE_SHORT_NOUNS and _default_is_symbolic(s)


def _company_is_symbolic(s: str) -> bool:
    return all(c.isupper() for c in s if c.isalpha())


# ---------------------------------------------------------------------------
# normalization recipes
# ---------------------------------------------------------------------------


def _norm_symbol(s: str) -> str:
    return " ".join(s.upper().split())


def _norm_noun_phrase(s: str) -> str:
    s = rewrite_substrings(s)
    s = pad_numbers(s)
    s = spell_out_greek(s)
    s = strip_non_alnum(s)
    if len(s) > 3:
        s = depluralize(s)[0]
    s = greek_letter_abbrevs(s)
    return " ".join(s.upper().split())


def _norm_gene_symbol(s: str) -> str:
    # strip a plural s only off otherwise-capitalised symbols (ERBBs -> ERBB,
    # but MDH-s and GASP10ps keep their s); then the noun-phrase recipe minus
    # depluralization.
    if len(s) >= 3 and s[-2].isupper():
        s = s.removesuffix("s")
    s = rewrite_substrings(s)
    s = pad_numbers(s)
    s = spell_out_greek(s)
    s = strip_non_alnum(s)
    s = greek_letter_abbrevs(s)
    return " ".join(s.upper().split())


def _norm_company_symbol(s: str) -> str:
    return s.upper()


# entity_class -> (is_symbolic, normalize_symbol, normalize_noun_phrase)
_CLASS_RULES: dict[str | None, tuple] = {
    "gene": (_gene_is_symbolic, _norm_gene_symbol, _norm_noun_phrase),
    "disease": (_disease_is_symbolic, _norm_symbol, _norm_noun_phrase),
    "anatomy": (lambda s: False, _norm_noun_phrase, _norm_noun_phrase),
    "company": (_company_is_symbolic, _norm_company_symbol, _norm_noun_phrase),
}
_DEFAULT_RULES = (_default_is_symbolic, _norm_symbol, _norm_noun_phrase)


@lru_cache(maxsize=20_000)
def classify_symbolic(s: str, entity_class: str | None = None) -> bool:
    return _CLASS_RULES.get(entity_class, _DEFAULT_RULES)[0](s)


@lru_cache(maxsize=20_000)
def normalize(s: str, entity_class: str | None = None) -> str:
    is_sym, sym_fn, phrase_fn = _CLASS_RULES.get(entity_class, _DEFAULT_RULES)
    return sym_fn(s) if is_sym(s) else phrase_fn(s)
