"""IUPAC-resolution stage — OpsinStep analogue.

Reference: OpsinStep (kazu/steps/ner/opsin.py:253-380) re-examines
``drug`` entities that failed dictionary linking (``len(mappings)==0``),
extends the match string through IUPAC break characters (transformer
NER tends to truncate IUPAC names at the first hyphen;
``extendString`` at opsin.py:312-348), and tries each candidate
longest-first against OPSIN.  The first parse success replaces the
entity with the extended span and a ``Mapping`` whose ``idx`` is the
canonical SMILES (source/parser "Opsin", HIGHLY_LIKELY;
``parseString`` at opsin.py:349-380).

Here the OPSIN+rdkit pair is replaced by the from-scratch grammar
parser + CANGEN canonicalizer in functions/iupac.py; everything else —
the unmapped-entity gate, the break-charset, the longest-first
candidate order, the entity replacement — follows the reference
semantics.  The stage is a stateless ``map_batches`` UDF (the parser
holds no model state, so a task pool suffices; no actor needed).
"""

from __future__ import annotations

from collections.abc import Iterable

import pyarrow as pa

from ..constants import HIGHLY_LIKELY, LINK_CERTAIN, NS_OPSIN
from ..functions.iupac import name_to_smiles
from ..functions.normalize import normalize
from ..schemas import ENTITIES_COLUMN

# IUPAC name break characters (reference opsin.py:20, citing the ACD
# IUPAC recommendations R-0.1.45 — names may contain spaces only at
# specific grammatical points, everything here terminates a name)
BREAKS = set(" !@#&?|\t\n\r")

ENTITY_CLASS = "drug"


def extend_string(text: str, start: int, end: int, spaces: int = 2
                  ) -> Iterable[tuple[str, int, int]]:
    """Candidate IUPAC strings around a (possibly truncated) entity
    span, longest first — reference ``OpsinStep.extendString``
    semantics (opsin.py:312-348): extend left to the previous break,
    extend right through up to ``spaces`` breaks, collecting a
    candidate at each break plus the final extent."""
    while start > 0 and text[start - 1] not in BREAKS:
        start -= 1
    res: list[tuple[str, int, int]] = []
    while end < len(text) and (text[end] not in BREAKS or spaces > 0):
        if text[end] in BREAKS:
            spaces -= 1
            res.append((text[start:end], start, end))
        end += 1
    last = (text[start:end], start, end)
    if not res or res[-1] != last:
        res.append(last)
    yield from reversed(res)


class OpsinStage:
    """map_batches UDF: resolve unmapped drug entities to SMILES.

    ``entity_class`` selects which entities to re-examine; ``spaces``
    is the extension break budget (reference default 2)."""

    def __init__(self, entity_class: str = ENTITY_CLASS, spaces: int = 2):
        self.entity_class = entity_class
        self.spaces = spaces

    def resolve(self, text: str, ent: dict) -> dict | None:
        for match, start, end in extend_string(
            text, ent["start"], ent["end"], self.spaces
        ):
            smiles = name_to_smiles(match)
            if smiles is not None:
                new = dict(ent)
                new["match"] = match
                new["match_norm"] = normalize(match, self.entity_class)
                new["start"] = start
                new["end"] = end
                new["mappings"] = [
                    {
                        "parser_name": "Opsin",
                        "source": "Opsin",
                        "idx": smiles,
                        "default_label": match,
                        "string_match_strategy": NS_OPSIN,
                        "string_match_confidence": LINK_CERTAIN,
                        "disambiguation_strategy": "",
                        "disambiguation_confidence": "",
                        "xref_source_parser_name": "",
                    }
                ]
                new["mention_confidence"] = HIGHLY_LIKELY
                return new
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        ents_col = batch.column("entities").to_pylist()
        new_col = []
        for spans, ents in zip(spans_col, ents_col):
            out_ents = []
            for ent in ents:
                if (
                    ent["entity_class"] == self.entity_class
                    and not ent["mappings"]
                    and 0 <= ent["span_idx"] < len(spans)
                    and spans[ent["span_idx"]]["text"]
                ):
                    resolved = self.resolve(spans[ent["span_idx"]]["text"], ent)
                    out_ents.append(resolved if resolved is not None else ent)
                else:
                    out_ents.append(ent)
            new_col.append(out_ents)
        batch = batch.drop_columns(["entities"])
        return batch.append_column(
            "entities", pa.array(new_col, type=ENTITIES_COLUMN)
        )


# ------------------------------------------------------------- query surface

# deterministic injection corpus for the queryable surface: names inside
# the grammar plus one OPSIN-unparseable form (reference doc table's
# failure row) — each appears space-delimited so extension terminates
INJECT_NAMES = (
    "2-chloropropane",
    "propan-2-ol",
    "1,4-dichlorobenzene",
    "cyclohexanecarboxylic acid",
    "4-methylpentan-2-one",
    "2-methoxyethanol",
    "(1-methylethyl)benzene",
    "hexanoic acid",
    "propanenitrile",
    "nitromethane",
    "buta-1,3-diene",
    # functional-class forms (resolved via the 2-break extension window)
    "dimethyl ether",
    "methyl ethanoate",
    "isopropyl alcohol",
    "1,4:3,6-dianhydro-2,5-di-o-nitro-d-glucitol",  # parse fails → no SMILES
)

SMILES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("match", pa.string()),
        ("smiles", pa.string()),
    ]
)


def _smiles_batch(batch: pa.Table) -> pa.Table:
    """Per-doc injection + truncated-entity simulation + resolution.

    Each document gets one injected IUPAC mention (cycled by doc_id);
    the simulated NER entity covers only the first 3 characters of the
    name — the transformer-truncation failure mode the reference step
    exists to repair — so this surface exercises extend_string and the
    parser end-to-end."""
    stage = OpsinStage()
    rows = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        name = INJECT_NAMES[doc_id % len(INJECT_NAMES)]
        aug = f"{text} compound {name} was isolated."
        start = len(text) + len(" compound ")
        ent = {
            "span_idx": 0,
            "start": start,
            "end": start + 3,
            "match": name[:3],
            "match_norm": name[:3],
            "entity_class": ENTITY_CLASS,
            "namespace": "TransformerNER",
            "mention_confidence": 50,
            "candidates": [],
            "mappings": [],
        }
        resolved = stage.resolve(aug, ent)
        if resolved is not None:
            rows.append(
                {
                    "doc_id": doc_id,
                    "match": resolved["match"],
                    "smiles": resolved["mappings"][0]["idx"],
                }
            )
    return pa.Table.from_pylist(rows, schema=SMILES_SCHEMA)


def q_chem_smiles(sf_dir: str):
    """Flat (doc_id, match, smiles) table over the documents corpus —
    the OpsinStep queryable surface (rows-only driver check; the
    name→SMILES engine itself is golden-pinned in pytest)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_smiles_batch, batch_format="pyarrow").sort(
        ["doc_id", "match"]
    )
