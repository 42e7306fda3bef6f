"""String-similarity scorers gating fuzzy linking candidates.

Re-implements the reference's boolean scorer suite
(kazu/language/string_similarity_scorers.py:27-91) and its per-class
wiring (kazu/conf/StringScorers/default.yaml), applied at fuzzy-search
time exactly where the reference applies them
(utils/link_index.py:113-121: ``reference_term`` = the entity's
match_norm, ``query_term`` = the candidate term_norm).

Also provides a dependency-free equivalent of
RapidFuzzStringSimilarityScorer (string_similarity_scorers.py:79-91):
rapidfuzz is not installed here, so ``ratio`` / ``token_sort_ratio`` /
``token_set_ratio`` / ``partial_ratio`` / ``wratio`` are implemented
from the public Indel-similarity + FuzzyWuzzy WRatio definitions.
Inputs are short normalized terms, so the O(n*m) DP is a non-issue —
and it runs once per (unique mention, candidate), inside the per-batch
dedup cache.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

# ---------------------------------------------------------------------------
# boolean scorers (reference string_similarity_scorers.py:27-77)
# ---------------------------------------------------------------------------

_NUMBER_FINDER = re.compile("[0-9]+")
_NUMERIC_CLASS_PHRASES = re.compile("TYPE (?:I|[0-9]+)")


def number_match_scorer(reference_term: str, query_term: str) -> bool:
    """All numbers in reference_term are represented in query_term (and
    vice versa — multiset equality, reference :27-37)."""
    return Counter(_NUMBER_FINDER.findall(reference_term)) == Counter(
        _NUMBER_FINDER.findall(query_term)
    )


def entity_subtype_scorer(reference_term: str, query_term: str) -> bool:
    """Every ``TYPE x`` phrase in reference_term appears at least as
    often in query_term (one-directional by design, reference :40-63:
    an NER match 'DIABETES' must keep 'DIABETES TYPE I/II' candidates
    for later context disambiguation)."""
    ref_counts = Counter(_NUMERIC_CLASS_PHRASES.findall(reference_term))
    query_counts = Counter(_NUMERIC_CLASS_PHRASES.findall(query_term))
    return all(
        phrase in query_counts and query_counts[phrase] >= count
        for phrase, count in ref_counts.items()
    )


class EntityNounModifierScorer:
    """Each configured modifier phrase must be in both terms or neither
    (reference :66-77)."""

    def __init__(self, noun_modifier_phrases: list[str]):
        self.noun_modifier_phrases = list(noun_modifier_phrases)

    def __call__(self, reference_term: str, query_term: str) -> bool:
        return all(
            (p in reference_term) == (p in query_term)
            for p in self.noun_modifier_phrases
        )


# per-entity-class boolean gates, mirroring conf/StringScorers/default.yaml
GENE_NOUN_MODIFIERS = ["LIKE", "SUBUNIT", "PSEUDOGENE", "RECEPTOR"]

DEFAULT_CLASS_SCORERS: dict[str, list] = {
    "gene": [
        number_match_scorer,
        EntityNounModifierScorer(GENE_NOUN_MODIFIERS),
        entity_subtype_scorer,
    ],
    "disease": [number_match_scorer, entity_subtype_scorer],
}


def apply_boolean_scorers(scorers: list, reference_term: str, query_term: str) -> bool:
    """AND over the class's scorers (reference link_index.py:62-70)."""
    return all(s(reference_term, query_term) for s in scorers)


# ---------------------------------------------------------------------------
# fuzz ratios (public Indel-similarity / FuzzyWuzzy definitions)
# ---------------------------------------------------------------------------


def _indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance = len(a)+len(b)-2*LCS."""
    if not a or not b:
        return len(a) + len(b)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    cur = np.empty_like(prev)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur[j] = prev[j - 1]
            else:
                cur[j] = min(prev[j], cur[j - 1]) + 1
        prev, cur = cur, prev
    return int(prev[len(b)])


def ratio(a: str, b: str) -> float:
    """Normalized Indel similarity x 100 (rapidfuzz fuzz.ratio)."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return 100.0 * (total - _indel_distance(a, b)) / total


def partial_ratio(a: str, b: str) -> float:
    """Best ratio of the shorter string against any same-length window
    of the longer."""
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    if not shorter:
        return 100.0 if not longer else 0.0
    best = 0.0
    n = len(shorter)
    for start in range(0, len(longer) - n + 1):
        best = max(best, ratio(shorter, longer[start : start + n]))
        if best == 100.0:
            return best
    return best


def _sorted_tokens(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(_sorted_tokens(a), _sorted_tokens(b))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(a.split()), set(b.split())
    inter = " ".join(sorted(ta & tb))
    combined_a = (inter + " " + " ".join(sorted(ta - tb))).strip()
    combined_b = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, combined_a), ratio(inter, combined_b), ratio(combined_a, combined_b))


def wratio(a: str, b: str) -> float:
    """Weighted combination (public FuzzyWuzzy WRatio algorithm):
    plain ratio vs scaled token ratios, partial variants for strongly
    length-mismatched inputs."""
    if not a or not b:
        return 0.0
    base = ratio(a, b)
    len_ratio = max(len(a), len(b)) / min(len(a), len(b))
    unbase_scale = 0.95
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(a, b) * unbase_scale,
            token_set_ratio(a, b) * unbase_scale,
        )
    partial_scale = 0.90 if len_ratio < 8 else 0.60
    return max(
        base,
        partial_ratio(a, b) * partial_scale,
        token_sort_ratio(a, b) * unbase_scale * partial_scale,
        token_set_ratio(a, b) * unbase_scale * partial_scale,
    )


def fuzz_scorer(reference_term: str, query_term: str) -> float:
    """RapidFuzzStringSimilarityScorer equivalent (reference :79-91):
    token_sort_ratio for long multi-token references, WRatio otherwise."""
    if len(reference_term) > 10 and len(reference_term.split(" ")) > 4:
        return token_sort_ratio(reference_term, query_term)
    return wratio(reference_term, query_term)
