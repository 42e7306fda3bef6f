"""Regex mutation mention finder (SETH analogue).

The reference's SethStep (kazu/steps/ner/seth.py:20-131) calls SETH
(Thomas et al. 2016, "SETH detects and normalizes genetic variants in
text") over a py4j JVM bridge; each hit becomes an Entity of class
``mutation`` with the SETH mutation dict in metadata and a
self-referential PROBABLE Mapping.  No JVM exists in this environment,
so this module re-implements the detection layer in the style of the
public MutationFinder system (Caporaso et al. 2007) — an ordered regex
alternation over HGVS-style and free-form mutation mentions — plus
SETH-style type classification and normalization.

The combined pattern is deliberately restricted to RE2-compatible
syntax (no lookarounds, no backreferences) so the *same* pattern string
drives both the Ray stage (Python ``re``) and the DuckDB oracle query
(``regexp_extract_all``), giving an end-to-end cross-engine parity
gate.  Both engines use leftmost-first alternation semantics, so
alternatives are ordered most-specific-first.

Known not-covered shapes (documented deviations from SETH): greek-delta
forms ("ΔF508"), parenthesised HGVS ("p.(Arg97fs)"), free-text
substitutions ("valine to glutamate at codon 600"), and one-letter
substitutions at 1-digit positions (too many false positives without a
dictionary gate).
"""

from __future__ import annotations

import re

# three-letter amino-acid codes (IUPAC) and the one-letter map
_AA3 = (
    "Ala|Arg|Asn|Asp|Cys|Gln|Glu|Gly|His|Ile|Leu|Lys|Met|Phe|Pro|Ser|Thr|"
    "Trp|Tyr|Val"
)
AA3_TO_1 = {
    "Ala": "A", "Arg": "R", "Asn": "N", "Asp": "D", "Cys": "C", "Gln": "Q",
    "Glu": "E", "Gly": "G", "His": "H", "Ile": "I", "Leu": "L", "Lys": "K",
    "Met": "M", "Phe": "F", "Pro": "P", "Ser": "S", "Thr": "T", "Trp": "W",
    "Tyr": "Y", "Val": "V", "Ter": "*",
}
_AA1 = "[ACDEFGHIKLMNPQRSTVWY]"

# ordered alternation — most specific first; every alternative ends in a
# word character so one trailing \b suffices (RE2-safe: no lookarounds)
MUTATION_REGEX = (
    r"\b(?:"
    r"rs\d+"                                                  # dbSNP id
    rf"|p\.(?:{_AA3})\d+(?:fs(?:Ter\d+)?|(?:{_AA3})|Ter)"     # p.Val600Glu / p.Arg97fs
    rf"|(?:{_AA3})\d+(?:fs(?:Ter\d+)?|(?:{_AA3})|Ter)"        # Val600Glu
    rf"|p\.{_AA1}\d+(?:fs|{_AA1})"                            # p.V600E
    r"|[cgmn]\.\d+(?:[+-]\d+)?(?:_\d+(?:[+-]\d+)?)?"
    r"(?:delins|del|ins|dup|inv)[ACGTacgt0-9]*"               # c.123_124delAT
    r"|[cgmn]\.\d+(?:[+-]\d+)?[ACGT]>[ACGT]"                  # c.1799T>A
    r"|IVS\d+[+-]\d+[ACGT]>[ACGT]"                            # IVS2+1G>A
    rf"|{_AA1}\d\d+(?:fs|{_AA1})"                             # V600E / R97fs
    r")\b"
)

_COMPILED = re.compile(MUTATION_REGEX)

# SETH MutationMention types (seth.py java bridge dict "type" values)
T_SUB = "SUBSTITUTION"
T_DEL = "DELETION"
T_INS = "INSERTION"
T_DELINS = "DELETION_INSERTION"
T_DUP = "DUPLICATION"
T_INV = "INVERSION"
T_FS = "FRAMESHIFT"
T_DBSNP = "DBSNP_MENTION"

# classification over the matched surface — expressed as ordered
# (regex, type) tests so the DuckDB oracle can mirror it with a CASE
# chain of regexp_matches over identical patterns
CLASSIFY_RULES: tuple[tuple[str, str], ...] = (
    (r"^rs\d+$", T_DBSNP),
    (r"delins", T_DELINS),
    (r"fs", T_FS),
    (r"del", T_DEL),
    (r"ins", T_INS),
    (r"dup", T_DUP),
    (r"inv", T_INV),
)
_CLASSIFY_COMPILED = [(re.compile(rx), t) for rx, t in CLASSIFY_RULES]


def classify(match: str) -> str:
    for rx, t in _CLASSIFY_COMPILED:
        if rx.search(match):
            return t
    return T_SUB


_P_SUB3 = re.compile(rf"^(?:p\.)?({_AA3})(\d+)({_AA3}|Ter)$")
_P_SUB1 = re.compile(rf"^(?:p\.)?({_AA1})(\d\d*)({_AA1})$")
_P_FS = re.compile(rf"^(?:p\.)?(?:({_AA3})|({_AA1}))(\d+)fs(?:Ter\d+)?$")
_P_DNA = re.compile(r"^([cgmn])\.(\d+(?:[+-]\d+)?)([ACGT])>([ACGT])$")


def normalize_mutation(match: str) -> dict:
    """SETH-style normalization dict: wild-type residue, mutated residue,
    position and a canonical one-letter HGVS-ish string where the form
    allows it (protein substitutions / frameshifts, DNA substitutions).
    Returns at least ``{"norm": ...}``; unparsed forms normalize to the
    surface itself."""
    m = _P_SUB3.match(match) or _P_SUB1.match(match)
    if m:
        wt, pos, mut = m.group(1), m.group(2), m.group(3)
        wt1 = AA3_TO_1.get(wt, wt)
        mut1 = AA3_TO_1.get(mut, mut)
        return {"norm": f"p.{wt1}{pos}{mut1}", "wt": wt1, "mut": mut1, "pos": int(pos)}
    m = _P_FS.match(match)
    if m:
        wt = m.group(1) or m.group(2)
        wt1 = AA3_TO_1.get(wt, wt)
        return {"norm": f"p.{wt1}{m.group(3)}fs", "wt": wt1, "mut": "fs", "pos": int(m.group(3))}
    m = _P_DNA.match(match)
    if m:
        return {
            "norm": f"{m.group(1)}.{m.group(2)}{m.group(3)}>{m.group(4)}",
            "wt": m.group(3),
            "mut": m.group(4),
            "pos": int(re.match(r"\d+", m.group(2)).group()),
        }
    if match.startswith("rs"):
        return {"norm": match, "wt": "", "mut": "", "pos": int(match[2:])}
    return {"norm": match, "wt": "", "mut": "", "pos": -1}


def find_mutations(text: str) -> list[dict]:
    """All mutation mentions in ``text`` with char offsets, SETH-style
    type and normalization."""
    out = []
    for m in _COMPILED.finditer(text):
        s = m.group()
        d = {"start": m.start(), "end": m.end(), "match": s, "mutation_type": classify(s)}
        d.update(normalize_mutation(s))
        out.append(d)
    return out
