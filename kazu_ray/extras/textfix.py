"""Unicode text repair — NFKC normalization + ftfy-style mojibake
fixing (encoding round-trip repair).

Web crawls are full of text that was UTF-8 on the wire but got decoded
as Latin-1/cp1252 somewhere ("café" → "cafÃ©"), sometimes twice.
Every serious LLM-data pipeline runs a repair pass (ftfy is the public
reference; CCNet and C4 both normalize unicode).  This operator:

* **detects** mojibake by the round-trip property: re-encoding the
  text as Latin-1/cp1252 and decoding as UTF-8 SUCCEEDS on mojibake
  but fails on genuine accented text (real text's Latin-1 bytes are
  almost never valid UTF-8 multi-byte sequences);
* **accepts** a repair only if it strictly reduces the non-ASCII
  character count (a true un-mojibake always collapses 2-3 byte
  artifacts into one char), which makes the fixpoint iteration safe
  and idempotent;
* repeats up to 3 rounds (double-encoded text needs two), then
  applies NFKC.

Distributed shape: a pure per-row function under ``map_batches`` with
an ``isascii()`` fast path (the overwhelming majority of web text rows
skip all work) — zero shuffle, trivially scale-safe.

Correctness gate (``textfix_recovery`` row of approx_metrics) — an
INDEPENDENT ground-truth oracle, not a replay: the query
deterministically plants accented characters in a doc_id-keyed subset
of the corpus, corrupts some once and some twice with the exact
Latin-1 mis-decode web servers commit, runs the repair, and checks
bit-exact recovery of the known original — plus idempotence and
no-op-on-clean-docs over the whole corpus.  Not SQL-expressible
(encoding round-trips don't exist in DuckDB).

Reference scope note: KAZU normalizes entity strings (Gilda rules,
functions/normalize.py) but has no corpus-level encoding repair; this
belongs to the training-data family (SURVEY.md §2l).
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa

TEXTFIX_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("rounds_injected", pa.int64()),
        ("rounds_fixed", pa.int64()),
        ("recovered", pa.bool_()),
        ("n_nonascii_before", pa.int64()),
        ("n_nonascii_after", pa.int64()),
    ]
)


def _nonascii(s: str) -> int:
    return sum(1 for c in s if ord(c) > 127)


def _fix_once(s: str) -> str | None:
    """One round of mojibake repair; None when no safe repair exists."""
    if s.isascii():
        return None
    before = _nonascii(s)
    for enc in ("latin-1", "cp1252"):
        try:
            b = s.encode(enc)
        except UnicodeEncodeError:
            continue
        try:
            d = b.decode("utf-8")
        except UnicodeDecodeError:
            continue
        if d != s and _nonascii(d) < before:
            return d
    return None


def fix_text(s: str, max_rounds: int = 3) -> tuple[str, int]:
    """(repaired NFKC text, repair rounds applied).  Idempotent:
    fix_text(fix_text(s)[0])[0] == fix_text(s)[0]."""
    rounds = 0
    for _ in range(max_rounds):
        d = _fix_once(s)
        if d is None:
            break
        s = d
        rounds += 1
    return unicodedata.normalize("NFKC", s), rounds


# deterministic corruption model for the ground-truth gate: plant
# accents, then mis-decode as Latin-1 once or twice (the classic
# double-encoding bug)
_ACCENTS = str.maketrans({"a": "á", "e": "é", "o": "ö", "u": "ü"})


def _corrupt_once(s: str) -> str:
    return s.encode("utf-8").decode("latin-1")


def inject(doc_id: int, text: str) -> tuple[str, str, int]:
    """(ground_truth, corrupted, rounds) for the gate corpus: doc_id %
    3 == 0 gets accents; of those, % 6 == 0 is mojibake'd once and
    % 12 == 0 twice.  Pure function of (doc_id, text)."""
    if doc_id % 3 != 0:
        return text, text, 0
    truth = text.translate(_ACCENTS)
    if doc_id % 6 != 0:
        return truth, truth, 0
    # vowel-free text stays ASCII after the accent pass, so the
    # mis-decode is a no-op — count only rounds that actually corrupt
    corrupted = _corrupt_once(truth)
    if corrupted == truth:
        return truth, truth, 0
    rounds = 1
    if doc_id % 12 == 0:
        corrupted = _corrupt_once(corrupted)
        rounds = 2
    return truth, corrupted, rounds


def _batch(t: pa.Table) -> pa.Table:
    rows = []
    for did, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        truth, corrupted, injected = inject(did, text)
        fixed, rounds_fixed = fix_text(corrupted)
        truth_norm = unicodedata.normalize("NFKC", truth)
        fixed2, _ = fix_text(fixed)
        rows.append(
            {
                "doc_id": did,
                "rounds_injected": injected,
                "rounds_fixed": rounds_fixed,
                # recovered = repaired text equals the known original
                # (NFKC'd) AND the repair is a fixpoint (idempotent)
                "recovered": fixed == truth_norm and fixed2 == fixed,
                "n_nonascii_before": _nonascii(corrupted),
                "n_nonascii_after": _nonascii(fixed),
            }
        )
    return pa.Table.from_pylist(rows, schema=TEXTFIX_SCHEMA)


def q_textfix(sf_dir: str):
    """Query surface: the mojibake-repair gate corpus — per-doc repair
    outcome vs planted ground truth.  The all-rows-recovered check is
    the textfix_recovery row of approx_metrics."""
    import ray.data as rd

    return (
        rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(_batch, batch_format="pyarrow")
        .sort("doc_id")
    )
