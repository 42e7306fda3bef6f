"""Synonym generators: build-time surface-form expansion.

Re-realizes the reference's conf-driven generator suite
(/root/reference/kazu/ontology_preprocessing/synonym_generation.py:23-467)
as pure functions ``str -> set[str]`` composed by
``CombinatorialSynonymGenerator``.  Applied to the long-thin synonym
frame before the compile groupby, so generated forms flow through the
same term_norm resolution as curated ones.

``VerbPhraseVariantGenerator`` requires spaCy lemmatization and is out
of scope in this environment (documented gap).
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

Generator = Callable[[str], set[str]]

_PAREN = re.compile(r"\s*\([^)]*\)\s*")
_WS = re.compile(r"\s+")


def separator_expansion(syn: str) -> set[str]:
    """Expand bracketed/slashed forms: "X (Y)" -> {"X", "X Y"};
    "A/B" -> {"A", "B"} (reference SeparatorExpansion)."""
    out: set[str] = set()
    no_paren = _WS.sub(" ", _PAREN.sub(" ", syn)).strip()
    if no_paren and no_paren != syn:
        out.add(no_paren)
    if "/" in syn and "(" not in syn:
        parts = [p.strip() for p in syn.split("/") if p.strip()]
        if len(parts) > 1 and all(len(p) > 2 for p in parts):
            out.update(parts)
    return out


_STOPWORDS = ("of", "the", "and")
_STOP_RE = re.compile(r"\b(?:" + "|".join(_STOPWORDS) + r")\b", re.IGNORECASE)


def stopword_remover(syn: str) -> set[str]:
    """Drop common stopwords (reference StopWordRemover)."""
    stripped = _WS.sub(" ", _STOP_RE.sub(" ", syn)).strip()
    return {stripped} if stripped and stripped != syn else set()


def make_string_replacement(replacements: dict[str, list[str]]) -> Generator:
    """Each key substring replaced by each alternative
    (reference StringReplacement)."""

    def gen(syn: str) -> set[str]:
        out = set()
        for old, news in replacements.items():
            if old in syn:
                for new in news:
                    out.add(syn.replace(old, new))
        out.discard(syn)
        return out

    return gen


def make_suffix_replacement(suffixes: dict[str, list[str]]) -> Generator:
    """Swap trailing suffixes, e.g. "oma" <-> "omas"
    (reference SuffixReplacement)."""

    def gen(syn: str) -> set[str]:
        out = set()
        for old, news in suffixes.items():
            if syn.endswith(old):
                stem = syn[: -len(old)]
                for new in news:
                    out.add(stem + new)
        out.discard(syn)
        return out

    return gen


# British/American clinical spelling variants (reference
# SpellingVariationReplacement ships a json of these)
SPELLING_VARIANTS = {
    "haem": ["hem"],
    "hem": ["haem"],
    "our": ["or"],
    "aemia": ["emia"],
    "oesophag": ["esophag"],
    "paediatric": ["pediatric"],
}
spelling_variation = make_string_replacement(SPELLING_VARIANTS)


def ngram_hyphenation(syn: str) -> set[str]:
    """Toggle hyphenation of adjacent token pairs: "non small" <->
    "non-small" (reference NgramHyphenation)."""
    out = set()
    toks = syn.split(" ")
    for i in range(len(toks) - 1):
        hyphenated = " ".join(toks[:i] + [toks[i] + "-" + toks[i + 1]] + toks[i + 2 :])
        out.add(hyphenated)
    if "-" in syn:
        out.add(syn.replace("-", " "))
    out.discard(syn)
    return out


def make_verb_phrase_variants(
    tense_templates: list[str],
    lemmas_to_consider: dict[str, list[str]],
) -> Generator:
    """Verb-phrase tense variants (reference VerbPhraseVariantGenerator,
    synonym_generation.py:392-467).  The reference lemmatizes with
    spaCy; spaCy is absent here, so lemma matching is rule-based over
    the configured lemma dictionary itself — a token matches lemma L
    when it equals L, is one of L's configured surface forms, or is a
    regular English inflection of L (s/ed/ing/d).  That covers the
    configured-lemma use case exactly (the generator only ever fires on
    lemmas_to_consider keys by construction).

    Templates use the reference's placeholders: ``{NOUN}``, ``{TARGET}``:

        make_verb_phrase_variants(["{NOUN} {TARGET}", "{TARGET} in {NOUN}"],
                                  {"increase": ["increasing", "increased"]})
    """
    # lemma lookup: surface form -> lemma
    form_to_lemma: dict[str, str] = {}
    for lemma, forms in lemmas_to_consider.items():
        form_to_lemma[lemma] = lemma
        for f in forms:
            form_to_lemma[f.lower()] = lemma
        for suffix in ("s", "d", "ed", "ing"):
            form_to_lemma.setdefault(lemma + suffix, lemma)
        if lemma.endswith("e"):
            form_to_lemma.setdefault(lemma[:-1] + "ing", lemma)

    def gen(syn: str) -> set[str]:
        toks = syn.split()
        out: set[str] = set()
        for i, tok in enumerate(toks):
            lemma = form_to_lemma.get(tok.lower())
            if lemma is None:
                continue
            noun = " ".join(toks[:i] + toks[i + 1 :])
            if not noun:
                continue
            for template in tense_templates:
                for form in [lemma] + list(lemmas_to_consider[lemma]):
                    out.add(template.format(NOUN=noun, TARGET=form))
        out.discard(syn)
        return out

    return gen


class CombinatorialSynonymGenerator:
    """Apply each generator to the originals and (one round of) their
    outputs, union everything (reference synonym_generation.py:380-467)."""

    def __init__(self, generators: Iterable[Generator]):
        self.generators = list(generators)

    def __call__(self, syn: str) -> set[str]:
        first = set()
        for g in self.generators:
            first |= g(syn)
        second = set()
        for s in first:
            for g in self.generators:
                second |= g(s)
        return (first | second) - {syn, ""}


DEFAULT_GENERATORS = CombinatorialSynonymGenerator(
    [separator_expansion, stopword_remover, spelling_variation, ngram_hyphenation]
)


def expand_frame(df, generator: CombinatorialSynonymGenerator = DEFAULT_GENERATORS):
    """Long-thin synonym frame -> same + generated rows
    (mapping_type='generated')."""
    import pandas as pd

    rows = []
    seen = set(zip(df["parser_name"], df["syn"]))
    for _, r in df.iterrows():
        for new_syn in generator(r["syn"]):
            if (r["parser_name"], new_syn) not in seen:
                seen.add((r["parser_name"], new_syn))
                rows.append(
                    (r["parser_name"], r["idx"], r["default_label"], new_syn,
                     "generated", r["entity_class"])
                )
    if not rows:
        return df
    gen_df = pd.DataFrame(rows, columns=list(df.columns))
    return pd.concat([df, gen_df], ignore_index=True)
