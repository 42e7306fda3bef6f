"""Interleaved text+media document corpus, derived deterministically from
the driver's ``documents.parquet``.

Input shape (BASELINE.json input_hint):
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Each driver document (bag-of-words filler text) becomes one interleaved
document: a title span + filler spans from the original text + 1..3
planted biomedical template sentences (dictionary surface forms,
abbreviation definitions, ambiguity traps — mirroring the reference's
inline NER fixtures, /root/reference/kazu/conftest.py:55-70 and golden
CSVs tests/test_assets/full_pipeline/) + ~12% interleaved media spans.
Everything is a pure function of ``(doc_id, text)``, so golden
annotations/triples are computable without running the pipeline — the
generator knows where it planted each mention and what the reference
cascade semantics ground it to.

A small set of hot entities ("cancer") appears in ~30% of documents
(Zipfian skew fixture, FIXTURES.md §6) to exercise skew handling in the
canonicalization shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..constants import NS_ABBREV, NS_DICT_NER
from ..schemas import DOCS_SCHEMA, GOLDEN_SCHEMA


@dataclass(frozen=True)
class M:
    """A planted mention with its expected final grounding."""

    surface: str
    entity_class: str
    curie: str | None  # None -> expected unmapped (or no entity at all)
    namespace: str = NS_DICT_NER
    expect_entity: bool = True


# Each template is a tuple of parts (literal text or planted mention).
# Groundings encode the expected *post-cascade* result.
TEMPLATES: list[tuple] = [
    ("Patients with ", M("NSCLC", "disease", "MONDO_0005233"),
     " were treated with ", M("imatinib", "drug", "CHEMBL941"), "."),
    (M("EGFR", "gene", "ENSG00000146648"), " is a gene implicated in ",
     M("lung cancer", "disease", "MONDO_0008903"), "."),
    ("Expression of ", M("p27", "gene", "ENSG00000111276"), " in ",
     M("CDKN1B", "gene", "ENSG00000111276"), " knockouts."),
    ("Levels of ", M("p27", "gene", "ENSG00000111276"), " were measured."),
    ("The role of ", M("COX1", "gene", None), " remains unclear."),
    (M("epidermal growth factor receptor", "gene", "ENSG00000146648"), " (",
     M("EGFR", "gene", "ENSG00000146648", namespace=NS_ABBREV), ") signaling in ",
     M("breast cancer", "disease", "MONDO_0007254"), "."),
    ("Treatment of ", M("acute lymphoblastic leukemia", "disease", "MONDO_0004967"),
     " (", M("ALL", "disease", "MONDO_0004967", namespace=NS_ABBREV),
     ") with chemotherapy."),
    ("Increased ", M("apoptosis", "go_bp", "GO_0006915"), " was observed in ",
     M("hepatocytes", "cell", "CL_0000182"), "."),
    (M("T cell", "cell", "CL_0000084"), " infiltration in the ",
     M("lung", "anatomy", "UBERON_0002048"), "."),
    (M("aspirin", "drug", "CHEMBL25"), " and ",
     M("paracetamol", "drug", "CHEMBL112"), " reduce fever."),
    (M("IL-6", "gene", "ENSG00000136244"), " and ", M("TNF", "gene", "ENSG00000232810"),
     " levels in ", M("influenza", "disease", "MONDO_0005812"), "."),
    ("Mutations in ", M("BRCA1", "gene", "ENSG00000012048"), " and ",
     M("BRCA2", "gene", "ENSG00000139618"), " predispose to ",
     M("breast cancer", "disease", "MONDO_0007254"), "."),
    (M("Herceptin", "drug", "CHEMBL1201585"), " targets ",
     M("HER2", "gene", "ENSG00000141736"), " in ",
     M("breast cancer", "disease", "MONDO_0007254"), " patients."),
    ("all patients received standard care after surgery.",
     ),  # lowercase "all" must NOT match the case-sensitive trap
    (M("type II diabetes", "disease", "MONDO_0005148"), " managed with ",
     M("metformin", "drug", "CHEMBL1431"), "."),
    (M("Alzheimer's disease", "disease", "MONDO_0004975"), " (",
     M("AD", "disease", "MONDO_0004975", namespace=NS_ABBREV), ") progression."),
    (M("melanoma", "disease", "MONDO_0005105"), " of the skin was resected."),
    (M("kinase activity", "go_mf", "GO_0016301"), " in the ",
     M("nucleus", "go_cc", "GO_0005634"), "."),
    (M("insulin", "gene", "ENSG00000254647"), " resistance in ",
     M("type II diabetes", "disease", "MONDO_0005148"), "."),
    ("Severe ", M("asthma", "disease", "MONDO_0004766"), " treated with ",
     M("ibuprofen", "drug", "CHEMBL521"), "."),
]

# the hot-key sentence: appears in ~30% of docs (skew fixture)
HOT_TEMPLATE: tuple = (M("cancer", "disease", "MONDO_0004992"),
                       " incidence increased in the cohort.")

_CURIE_SOURCE = {
    "MONDO": "MONDO", "ENSG": "ENSEMBL", "CHEMBL": "CHEMBL",
    "UBERON": "UBERON", "CL": "CL", "GO": "GO",
}


def curie_source(curie: str) -> str:
    for prefix, src in _CURIE_SOURCE.items():
        if curie.startswith(prefix):
            return src
    return "UNKNOWN"


@dataclass
class _DocBuild:
    doc_id: str
    spans: list[dict] = field(default_factory=list)
    goldens: list[dict] = field(default_factory=list)
    offset: int = 0

    def add_text_span(self, kind: str, text: str, mentions: list[tuple[int, M]] = ()):
        span_idx = len(self.spans)
        self.spans.append(
            {"kind": kind, "text": text, "media_ref": "", "offset": self.offset}
        )
        for start, m in mentions:
            if not m.expect_entity:
                continue
            self.goldens.append(
                {
                    "doc_id": self.doc_id,
                    "span_idx": span_idx,
                    "namespace": m.namespace,
                    "match": m.surface,
                    "entity_class": m.entity_class,
                    "start": start,
                    "end": start + len(m.surface),
                    "mapping_id": m.curie or "",
                }
            )
        self.offset += len(text)

    def add_media_span(self, kind: str, ref: str):
        self.spans.append(
            {"kind": kind, "text": "", "media_ref": ref, "offset": self.offset}
        )


def _render_template(parts: tuple) -> tuple[str, list[tuple[int, M]]]:
    text = ""
    mentions: list[tuple[int, M]] = []
    for part in parts:
        if isinstance(part, M):
            mentions.append((len(text), part))
            text += part.surface
        else:
            text += part
    return text, mentions


def build_doc(doc_id_int: int, filler_text: str) -> tuple[dict, list[dict]]:
    """Pure function (doc_id, filler) -> (doc row, golden annotation rows)."""
    rng = np.random.default_rng(doc_id_int * 9973 + 17)
    doc_id = f"doc-{doc_id_int:08d}"
    b = _DocBuild(doc_id=doc_id)

    words = filler_text.split()
    title = " ".join(words[:4]) if words else "untitled"
    b.add_text_span("title", title + ". ")

    n_templates = int(rng.integers(1, 4))
    chosen = rng.choice(len(TEMPLATES), size=n_templates, replace=False)
    sentences = [TEMPLATES[i] for i in chosen]
    if rng.random() < 0.30:
        sentences.append(HOT_TEMPLATE)

    filler_rest = " ".join(words[4:20])
    if filler_rest:
        b.add_text_span("text", filler_rest + ". ")

    media_kinds = ("image", "audio", "video")
    for parts in sentences:
        if rng.random() < 0.12:
            kind = media_kinds[int(rng.integers(len(media_kinds)))]
            b.add_media_span(kind, f"media://{doc_id}/{len(b.spans)}")
        text, mentions = _render_template(parts)
        kind = "abstract" if rng.random() < 0.5 else "text"
        b.add_text_span(kind, text + " ", mentions)

    if rng.random() < 0.08:
        b.add_media_span("table", f"media://{doc_id}/{len(b.spans)}")

    return {"doc_id": doc_id, "spans": b.spans}, b.goldens


def interleave_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """map_batches UDF: documents(doc_id:int64, text) -> interleaved docs.

    ``repeat`` > 1 synthesizes ``repeat`` distinct documents per input
    row (deterministic doc_id = base*repeat + r) — the corpus-scale
    amplifier used by the benchmark to stand in for the 10^12-doc corpus.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = [
        build_doc(i * repeat + r, t)[0]
        for i, t in zip(doc_ids, texts)
        for r in range(repeat)
    ]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def golden_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    rows = [g for i, t in zip(doc_ids, texts) for g in build_doc(i, t)[1]]
    return pa.Table.from_pylist(rows, schema=GOLDEN_SCHEMA)


def docs_from_texts(texts: list[str], prefix: str = "doc"):
    """Simple-document constructor (reference
    Document.create_simple_document, data.py:614-622): one text span per
    document."""
    import ray.data as rd

    rows = [
        {
            "doc_id": f"{prefix}-{i:08d}",
            "spans": [{"kind": "text", "text": t, "media_ref": "", "offset": 0}],
        }
        for i, t in enumerate(texts)
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))


def docs_from_sections(section_texts: list[dict[str, str]], prefix: str = "doc"):
    """Named-section constructor (reference
    Document.from_named_section_texts, data.py:624-631): one span per
    (name -> text) item, span kind = section name."""
    import ray.data as rd

    rows = []
    for i, sections in enumerate(section_texts):
        offset = 0
        spans = []
        for name, text in sections.items():
            spans.append({"kind": name, "text": text, "media_ref": "", "offset": offset})
            offset += len(text)
        rows.append({"doc_id": f"{prefix}-{i:08d}", "spans": spans})
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))


def read_interleaved(path: str):
    """Read an existing interleaved-docs table (parquet/lance dir)."""
    import ray.data as rd

    return rd.read_parquet(path)


def interleaved_docs(sf_dir: str, parallelism: int | None = None, repeat: int = 1):
    """documents.parquet -> Dataset[DOCS_SCHEMA], streaming transform."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if parallelism:
        ds = ds.repartition(parallelism)
    return ds.map_batches(
        interleave_batch, batch_format="pyarrow", fn_kwargs={"repeat": repeat}
    )


def golden_annotations(sf_dir: str):
    """Dataset of expected final entities (the correctness oracle)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(golden_batch, batch_format="pyarrow")


def golden_triples_table(sf_dir: str) -> pa.Table:
    """Expected deduplicated (subj, pred, obj) triples.

    For the known test scale factors this reads a FROZEN fixture
    (kazu_ray/sources/_golden/sf*.csv, generated once and checked in) so
    the oracle cannot co-vary with pipeline code — in round 1 the
    ``MENTION:`` subjects were built by calling the engine's own
    ``normalize()``, which let a normalizer bug cancel out of the
    maps-to comparison (VERDICT r1 item 8).  Unknown sf dirs fall back
    to the computed oracle."""
    import os

    import pyarrow.csv as pcsv

    frozen = os.path.join(
        os.path.dirname(__file__), "_golden", os.path.basename(os.path.normpath(sf_dir)) + ".csv"
    )
    if os.path.isfile(frozen):
        return pcsv.read_csv(frozen)

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    triples: set[tuple[str, str, str]] = set()
    for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()):
        _doc, goldens = build_doc(i, t)
        curies = sorted({g["mapping_id"] for g in goldens if g["mapping_id"]})
        doc_id = f"doc-{i:08d}"
        for c in curies:
            triples.add((doc_id, "mentions", c))
        for g in goldens:
            if g["mapping_id"]:
                from ..functions.normalize import normalize

                norm = normalize(g["match"], g["entity_class"])
                triples.add((f"MENTION:{norm}", "maps-to", g["mapping_id"]))
        for a_i in range(len(curies)):
            for b_i in range(a_i + 1, len(curies)):
                triples.add((curies[a_i], "co-occurs", curies[b_i]))
    rows = sorted(triples)
    return pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
        }
    )
