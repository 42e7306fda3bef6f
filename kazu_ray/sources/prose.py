"""Deterministic synthetic scholarly prose with known sentence spans.

Training/evaluation corpus for the unsupervised Punkt sentencizer
(stages/punkt.py): every document is a pure function of its ``doc_id``,
sentences are generated from a scholarly-register vocabulary with the
same abbreviation inventory the rule sentencizer suppresses
(stages/sentences.py), and the TRUE sentence spans are recorded at
generation time — so boundary precision/recall of a learned segmenter
is measurable exactly, with no external data (driver input_hint
discipline: synthesized deterministically at small scale).

Hard cases planted at controlled rates:
- mid-sentence abbreviations followed by lowercase ("approx. twenty"),
- abbreviations followed by numbers ("no. 7"),
- titles + initials before proper nouns ("dr. J. Smith"),
- decimals ("3.5") and comma numbers ("8,509"),
- proper nouns that also occur mid-sentence uppercase (so the
  orthographic heuristic must NOT fire after "Dr."),
- ordinary sentence ends followed by frequent starters ("The", "We").
"""

from __future__ import annotations

import random

import pyarrow as pa

_WORDS = (
    "patients results treatment values units analysis baseline cohort "
    "response groups increase decrease effect marker protein enzyme "
    "sample tissue dose levels outcome trial data model method signal "
    "ratio change onset phase score index rate risk mean median total "
    "subjects controls".split()
)
_FILLERS = (
    "showed higher lower stable significant measured observed reported "
    "compared adjusted pooled improved reduced combined matched".split()
)
_STARTERS = "the we these results this further overall".split()
_PROPER = "Smith London Keller Osaka Tanaka Berger".split()
# the scholarly abbreviation inventory (lowercase bare forms); usage is
# always mid-sentence followed by a lowercase word or a number
_ABBREVS = "approx vs e.g i.e fig no ca dr et_al spp".split()


def _abbrev_phrase(rng: random.Random) -> list[str]:
    a = rng.choice(_ABBREVS)
    if a == "et_al":
        return ["et", "al.", rng.choice(_FILLERS)]
    if a == "dr":
        # title + initial + proper noun: the segmenter must not break
        # after "Dr." or "J." even though "Smith" is capitalized
        return ["Dr.", rng.choice("JKMR") + ".", rng.choice(_PROPER)]
    if a == "no":
        return ["no.", str(rng.randint(2, 90))]
    if a == "fig":
        return ["fig.", str(rng.randint(1, 9))]
    return [a + ".", rng.choice(_WORDS)]


def _sentence(rng: random.Random) -> list[str]:
    n = rng.randint(6, 12)
    toks = [rng.choice(_STARTERS).capitalize()]
    while len(toks) < n:
        r = rng.random()
        if r < 0.22:
            toks.extend(_abbrev_phrase(rng))
        elif r < 0.30:
            toks.append(f"{rng.randint(0, 9)}.{rng.randint(1, 99)}")
        elif r < 0.36:
            toks.append(f"{rng.randint(1, 9)},{rng.randint(100, 999)}")
        elif r < 0.44:
            toks.append(rng.choice(_PROPER))
        elif r < 0.70:
            toks.append(rng.choice(_WORDS))
        else:
            toks.append(rng.choice(_FILLERS))
    # never end a sentence with an abbreviation / number (keeps the
    # generated boundary set unambiguous for exact scoring)
    if toks[-1][-1] == "." or not toks[-1].isalpha():
        toks.append(rng.choice(_WORDS))
    toks[-1] = toks[-1] + "."
    return toks


def prose_doc(doc_id: int) -> tuple[str, list[tuple[int, int]]]:
    """One document: (text, true sentence spans).  Span conventions
    match stages.sentences.sentence_spans — terminal period included,
    inter-sentence whitespace excluded."""
    rng = random.Random(78101 + doc_id * 9176)
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for _ in range(rng.randint(5, 10)):
        sent = " ".join(_sentence(rng))
        spans.append((pos, pos + len(sent)))
        parts.append(sent)
        pos += len(sent) + 1
    return " ".join(parts), spans


def prose_table(n_docs: int) -> pa.Table:
    texts = []
    for i in range(n_docs):
        text, _ = prose_doc(i)
        texts.append(text)
    return pa.table({"doc_id": pa.array(range(n_docs), type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})
