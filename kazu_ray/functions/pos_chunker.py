"""Tiny learned POS tagger + noun-phrase-aware conjunction splitting.

The reference splits conjoined entity mentions with a scispacy
dependency parse (SplitOnConjunctionPattern,
entity_post_processing.py:29-93: noun_chunks + conj deps anchor the
shared head).  No parser ships in this container, so round 4 used a
pure string rule (transformer_ner.split_conjunction).  Round 5 upgrades
it with a LEARNED component — the Punkt playbook: an averaged
perceptron POS tagger (Collins 2002) trained from scratch by
scripts/train_tiny_pos.py, weights checked in as
``kazu_ray/assets/tiny_pos.json``, held-out-fixture-gated in
tests/test_pos_chunker.py.

What the tagger buys over the bare rule:

- **false-split rejection**: coordination of verbs / adverbs /
  full clauses ("diagnosed and treated promptly",
  "slow and steady wins the race") no longer distributes a bogus
  "head noun" — every conjunct item and the anchor must be nominal.
- **head-FIRST coordination** (deviation family (a) of the round-4
  note): "carcinoma of the skin and lung" → ["skin carcinoma",
  "lung carcinoma"] via the NOUN+ head, ADP/DET bridge, nominal
  conjunct pattern.

Flat head-LAST coordination keeps the round-4 rule semantics exactly
(the property-tested family: last conjunct anchors, its final word
distributes) — the tagger only VETOES non-nominal shapes there.
Families still out of scope without a true dependency parse: anchors
whose final noun is not the semantic head ("breast cancer patients"
distributes "patients"), and attachment/scope ambiguity.
"""

from __future__ import annotations

import json
import os
import re

# deterministic tag order for argmax tie-breaks
TAGSET = (
    "ADJ",
    "ADP",
    "ADV",
    "CC",
    "DET",
    "NOUN",
    "NUM",
    "PRON",
    "PUNCT",
    "VERB",
    "X",
)

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "tiny_pos.json")


def features(words: list[str], i: int, prev: str, prev2: str) -> list[str]:
    """Feature extraction shared by trainer and runtime (must stay in
    lockstep — the asset's keys are these strings)."""
    w = words[i]
    lw = w.lower()
    feats = [
        "b",  # bias
        f"w={lw}",
        f"s1={lw[-1:]}",
        f"s2={lw[-2:]}",
        f"s3={lw[-3:]}",
        f"s4={lw[-4:]}",
        f"p1={lw[:1]}",
        f"t1={prev}",
        f"t2={prev2}",
        f"t12={prev}|{prev2}",
        f"t1w={prev}|{lw}",
    ]
    if i > 0:
        feats.append(f"w-1={words[i - 1].lower()}")
    if i + 1 < len(words):
        feats.append(f"w+1={words[i + 1].lower()}")
    if any(c.isdigit() for c in w):
        feats.append("hasdigit")
    if "-" in w:
        feats.append("hyphen")
    if w[:1].isupper():
        feats.append("cap")
    return feats


class PosTagger:
    """Averaged-perceptron tagger over the shipped weights; greedy
    left-to-right decode (the training-time decode order)."""

    def __init__(self, weights_path: str = _ASSET):
        with open(weights_path) as f:
            asset = json.load(f)
        self.weights: dict[str, dict[str, float]] = asset["weights"]
        # unambiguous training words (perceptron weights only exist for
        # words that ever caused an update; the lexicon covers the rest)
        self.lexicon: dict[str, str] = asset["lexicon"]

    def tag(self, words: list[str]) -> list[str]:
        out: list[str] = []
        p2 = p1 = "-START-"
        for i in range(len(words)):
            scores = dict.fromkeys(TAGSET, 0.0)
            for f in features(words, i, p1, p2):
                fw = self.weights.get(f)
                if fw:
                    for t, w in fw.items():
                        scores[t] += w
            guess = max(TAGSET, key=lambda t: (scores[t], t))
            out.append(guess)
            p2, p1 = p1, guess
        return out


_TAGGER: list[PosTagger | None] = []


def get_tagger() -> PosTagger | None:
    """Shared tagger instance; None when the asset is absent (then the
    caller falls back to the round-4 string rule)."""
    if not _TAGGER:
        try:
            _TAGGER.append(PosTagger())
        except OSError:
            _TAGGER.append(None)
    return _TAGGER[0]


_NOMINAL = {"NOUN", "ADJ", "NUM", "DET"}
_CONJ_WORDS = ("and", "or", "nor")
_CONJ_SPLIT = re.compile(r"\s*,\s*(?:(?:and|or|nor)\s+)?|\s+(?:and|or|nor)\s+")


def lexical_tag(tagger: PosTagger, word: str) -> str | None:
    """Context-free tag preference of a word: the training lexicon for
    attested unambiguous words, else the argmax over the word's
    context-free features (form, prefixes/suffixes — the learned
    morphology).  None when nothing fires.  Used for the nominal VETO:
    contextual tags mis-fire on unusual modifier orders ("gastric skin
    renal cancer"), but a word known lexically or morphologically as a
    verb/adverb/pronoun is strong evidence the coordination is clausal,
    not nominal."""
    lw = word.lower()
    if lw in tagger.lexicon:
        return tagger.lexicon[lw]
    feats = [f"w={lw}", f"s1={lw[-1:]}", f"s2={lw[-2:]}", f"s3={lw[-3:]}",
             f"s4={lw[-4:]}", f"p1={lw[:1]}"]
    scores = dict.fromkeys(TAGSET, 0.0)
    hit = False
    for f in feats:
        fw = tagger.weights.get(f)
        if fw:
            hit = True
            for t, w in fw.items():
                scores[t] += w
    if not hit:
        return None
    top = max(TAGSET, key=lambda t: (scores[t], t))
    if top not in _NOMINAL:
        # morphology alone must be CONFIDENT to call an OOV word
        # non-nominal (measured: real -ed/-ly forms win by 3-10 points,
        # ambiguous noun endings by <0.5) — a borderline call defaults
        # to nominal so OOV biomedical nouns never suppress a split
        best_nominal = max(scores[t] for t in _NOMINAL)
        if scores[top] - best_nominal < 2.0:
            return None
    return top


def _is_nominal_item(tagger: PosTagger, words: list[str]) -> bool:
    """A conjunct item must be nominal: no word lexically attested as
    VERB / ADV / PRON / ADP, and not a bare determiner."""
    if not words:
        return False
    lex = [lexical_tag(tagger, w) for w in words]
    if any(t in ("VERB", "ADV", "PRON", "ADP") for t in lex):
        return False
    return not (len(words) == 1 and lex[0] == "DET")


def split_conjunction_tagged(match: str) -> list[str] | None:
    """POS-validated conjunction split; None = no learned verdict
    (asset missing), [] = reject, list = split results.

    Handles (1) flat head-LAST coordination with the round-4 rule
    semantics gated on nominal POS shapes, and (2) head-FIRST
    "HEAD of (the)? A, B and C" coordination."""
    tagger = get_tagger()
    if tagger is None:
        return None
    if not any(f" {w} " in match for w in _CONJ_WORDS):
        return []
    # commas become their own PUNCT tokens (the tagger's training
    # tokenization); word features never see glued punctuation
    words = re.findall(r"[^\s,]+|,", match)
    tags = tagger.tag(words)

    # ---- head-first: NOUN+ ADP (DET)? item (, item)* CC item ----------
    n_head = 0
    while n_head < len(tags) and tags[n_head] == "NOUN":
        n_head += 1
    if 0 < n_head < len(tags) and tags[n_head] == "ADP":
        rest_i = n_head + 1
        if rest_i < len(tags) and tags[rest_i] == "DET":
            rest_i += 1
        rest_words = words[rest_i:]
        rest_tags = tags[rest_i:]
        if any(w in _CONJ_WORDS for w in rest_words):
            items: list[list[str]] = [[]]
            item_tags: list[list[str]] = [[]]
            for w, t in zip(rest_words, rest_tags):
                if w in _CONJ_WORDS or w == ",":
                    items.append([])
                    item_tags.append([])
                    continue
                items[-1].append(w)
                item_tags[-1].append(t)
            items = [it for it in items if it]
            item_tags = [it for it in item_tags if it]
            head = " ".join(words[:n_head])
            if len(items) >= 2 and all(
                _is_nominal_item(tagger, it) for it in items
            ):
                return [f"{' '.join(it)} {head}" for it in items]
        return []

    # ---- flat head-last: round-4 rule, POS-gated -----------------------
    str_items = [x for x in _CONJ_SPLIT.split(match) if x]
    if len(str_items) < 2:
        return []
    # every item must be lexically nominal (see lexical_tag)
    if not all(_is_nominal_item(tagger, it.split()) for it in str_items):
        return []
    anchor_words = str_items[-1].split()
    # the distributable head must not be lexically non-nominal
    if len(anchor_words) < 2 or lexical_tag(tagger, anchor_words[-1]) not in (
        "NOUN",
        None,
    ):
        return []
    head = anchor_words[-1]
    out = [str_items[-1]]
    for item in str_items[:-1]:
        out.append(f"{item} {head}")
    return out
