"""Deterministic synthetic ontology sources.

Stands in for the reference's 20+ ontology parsers
(/root/reference/kazu/ontology_preprocessing/parsers.py) which download
MONDO / CHEMBL / UBERON / CL / GO / OpenTargets dumps.  No external data
is allowed in this sandbox, so we synthesise small dictionaries *shaped*
like those sources: the canonical long-thin frame
``[parser_name, idx, default_label, syn, mapping_type, entity_class]``
(reference base.py:44-53, 784-787; DummyParser tests/utils.py:65-108).

Includes the reference test-suite's canonical traps:
- three genes sharing synonym "p27" (CDKN1B / PAK2 / ZNRD2,
  reference conftest.py:73-108) — ambiguity for the disambiguation cascade;
- case-sensitivity traps "ALL" and "AD" (reference data.py:926-955);
- a symbolic synonym shared by two dissimilar concepts ("COX1" ->
  PTGS1 / MT-CO1, the example in base.py:895-905) — exercises
  similarity-based id grouping;
- abbreviation-definition surface forms ("long form (LF)") for the
  Schwartz–Hearst step.
"""

from __future__ import annotations

import pandas as pd

# parser_name -> entity_class (mirrors conf/ontologies layout)
PARSERS: dict[str, str] = {
    "MONDO": "disease",
    "CHEMBL": "drug",
    "OT_TARGET": "gene",
    "UBERON": "anatomy",
    "CL": "cell",
    "GO_BP": "go_bp",
    "GO_MF": "go_mf",
    "GO_CC": "go_cc",
}

# (parser, idx, default_label, [synonyms...], annotation_score)
# the default label is always included as a synonym row with mapping_type
# "lbl"; extra synonyms get "hasExactSynonym".
_SOURCES: list[tuple[str, str, str, list[str], int]] = [
    # --- MONDO: diseases -------------------------------------------------
    ("MONDO", "MONDO_0005233", "non-small cell lung cancer",
     ["NSCLC", "non-small cell lung carcinoma", "NSCLC - non-small cell lung cancer"], 3),
    ("MONDO", "MONDO_0004992", "cancer", ["malignant neoplasm", "cancers"], 5),
    ("MONDO", "MONDO_0008903", "lung cancer", ["lung carcinoma", "cancer of lung"], 4),
    ("MONDO", "MONDO_0007254", "breast cancer", ["breast carcinoma", "malignant breast neoplasm"], 4),
    ("MONDO", "MONDO_0005105", "melanoma", ["malignant melanoma"], 3),
    ("MONDO", "MONDO_0005015", "diabetes mellitus", ["diabetes"], 4),
    ("MONDO", "MONDO_0005148", "type 2 diabetes mellitus",
     ["type II diabetes", "T2DM", "non-insulin dependent diabetes mellitus"], 3),
    ("MONDO", "MONDO_0004976", "amyotrophic lateral sclerosis", ["ALS", "Lou Gehrig disease"], 3),
    ("MONDO", "MONDO_0004967", "acute lymphoblastic leukemia", ["ALL", "acute lymphoid leukemia"], 3),
    ("MONDO", "MONDO_0005812", "influenza", ["flu"], 3),
    ("MONDO", "MONDO_0005709", "anorexia nervosa", [], 2),
    ("MONDO", "MONDO_0010602", "hemophilia A", ["haemophilia A", "factor VIII deficiency"], 2),
    ("MONDO", "MONDO_0010604", "hemophilia B", ["factor IX deficiency", "Christmas disease"], 2),
    ("MONDO", "MONDO_0004975", "Alzheimer disease", ["Alzheimer's disease", "AD"], 4),
    ("MONDO", "MONDO_0004766", "asthma", [], 3),
    ("MONDO", "MONDO_0005301", "multiple sclerosis", ["MS"], 3),
    # --- CHEMBL: drugs ---------------------------------------------------
    ("CHEMBL", "CHEMBL112", "paracetamol", ["acetaminophen", "Tylenol"], 5),
    ("CHEMBL", "CHEMBL25", "aspirin", ["acetylsalicylic acid"], 5),
    ("CHEMBL", "CHEMBL941", "imatinib", ["Gleevec", "imatinib mesylate"], 4),
    ("CHEMBL", "CHEMBL1201585", "trastuzumab", ["Herceptin"], 4),
    ("CHEMBL", "CHEMBL1431", "metformin", [], 4),
    ("CHEMBL", "CHEMBL192", "sildenafil", ["Viagra"], 3),
    ("CHEMBL", "CHEMBL1535", "hydroxychloroquine", [], 3),
    ("CHEMBL", "CHEMBL1042", "cholecalciferol", ["vitamin D3"], 3),
    ("CHEMBL", "CHEMBL521", "ibuprofen", [], 4),
    # --- OT_TARGET: genes ------------------------------------------------
    ("OT_TARGET", "ENSG00000146648", "EGFR",
     ["epidermal growth factor receptor", "ERBB1", "HER1"], 5),
    ("OT_TARGET", "ENSG00000141736", "ERBB2", ["HER2", "erbB2", "NEU"], 4),
    ("OT_TARGET", "ENSG00000012048", "BRCA1", ["breast cancer 1", "BRCC1"], 4),
    ("OT_TARGET", "ENSG00000139618", "BRCA2", ["breast cancer 2"], 4),
    ("OT_TARGET", "ENSG00000141510", "TP53", ["p53", "tumor protein p53"], 5),
    # the p27 ambiguity trio (reference conftest.py:73-108)
    ("OT_TARGET", "ENSG00000111276", "CDKN1B",
     ["p27", "KIP1", "cyclin-dependent kinase inhibitor 1B"], 5),
    ("OT_TARGET", "ENSG00000180370", "PAK2", ["p27", "PAK-2"], 3),
    ("OT_TARGET", "ENSG00000276023", "ZNRD2", ["p27", "SSSCA1"], 3),
    ("OT_TARGET", "ENSG00000136244", "IL6", ["IL-6", "interleukin-6", "interleukin 6"], 4),
    ("OT_TARGET", "ENSG00000232810", "TNF", ["TNFα", "tumor necrosis factor"], 4),
    ("OT_TARGET", "ENSG00000171862", "PTEN", ["phosphatase and tensin homolog"], 4),
    ("OT_TARGET", "ENSG00000133703", "KRAS", [], 4),
    ("OT_TARGET", "ENSG00000254647", "INS", ["insulin"], 4),
    # COX1 ambiguity across dissimilar concepts (reference base.py:895-905)
    ("OT_TARGET", "ENSG00000095303", "prostaglandin-endoperoxide synthase 1",
     ["PTGS1", "COX1", "COX-1"], 3),
    ("OT_TARGET", "ENSG00000198804", "mitochondrially encoded cytochrome c oxidase I",
     ["MT-CO1", "COX1"], 3),
    ("OT_TARGET", "ENSG00000073756", "prostaglandin-endoperoxide synthase 2",
     ["PTGS2", "COX2", "COX-2", "cyclooxygenase 2"], 3),
    # --- UBERON: anatomy -------------------------------------------------
    ("UBERON", "UBERON_0002048", "lung", [], 3),
    ("UBERON", "UBERON_0002107", "liver", [], 3),
    ("UBERON", "UBERON_0000955", "brain", [], 3),
    ("UBERON", "UBERON_0000948", "heart", [], 3),
    ("UBERON", "UBERON_0002113", "kidney", [], 3),
    ("UBERON", "UBERON_0000310", "breast", ["mammary gland"], 3),
    # --- CL: cell types --------------------------------------------------
    ("CL", "CL_0000084", "T cell", ["T-cell", "T lymphocyte"], 3),
    ("CL", "CL_0000236", "B cell", ["B-cell", "B lymphocyte"], 3),
    ("CL", "CL_0000182", "hepatocyte", ["hepatocytes"], 3),
    ("CL", "CL_0000235", "macrophage", [], 3),
    # --- GO --------------------------------------------------------------
    ("GO_BP", "GO_0006915", "apoptotic process", ["apoptosis", "programmed cell death"], 3),
    ("GO_BP", "GO_0008283", "cell population proliferation", ["cell proliferation"], 3),
    ("GO_MF", "GO_0016301", "kinase activity", [], 3),
    ("GO_CC", "GO_0005634", "nucleus", ["cell nucleus"], 3),
]


# cross-references between KBs (OXO-dump-shaped, reference
# steps/linking/post_processing/xref_manager.py:41-106): gene ENSG ids to
# HGNC CURIEs; diseases to a UMLS-shaped id
XREFS: list[tuple[str, str, str, str]] = [
    # (parser_name, idx, xref_source, xref_idx)
    ("OT_TARGET", "ENSG00000146648", "HGNC", "HGNC:3236"),
    ("OT_TARGET", "ENSG00000141736", "HGNC", "HGNC:3430"),
    ("OT_TARGET", "ENSG00000141510", "HGNC", "HGNC:11998"),
    ("OT_TARGET", "ENSG00000111276", "HGNC", "HGNC:1785"),
    ("OT_TARGET", "ENSG00000012048", "HGNC", "HGNC:1100"),
    ("MONDO", "MONDO_0005233", "UMLS", "UMLS:C0007131"),
    ("MONDO", "MONDO_0007254", "UMLS", "UMLS:C0006142"),
]


def xref_frame() -> pd.DataFrame:
    return pd.DataFrame(
        XREFS, columns=["parser_name", "idx", "xref_source", "xref_idx"]
    )


def find_kb(idx: str) -> str:
    """Derive the source KB from a CURIE prefix or OBO-style IRI
    (reference parsers' ``find_kb`` overrides, parsers.py; the IRI
    branch mirrors MondoOntologyParser.find_kb, parsers.py:902-908)."""
    if idx.startswith("http://") or idx.startswith("https://"):
        from urllib.parse import urlparse

        tail = urlparse(idx).path.split("/")[-1]
        kb = tail.split("_")[0]
        return kb if kb else "UNKNOWN"
    for prefix, kb in (
        ("MONDO_", "MONDO"), ("CHEMBL", "CHEMBL"), ("ENSG", "ENSEMBL"),
        ("UBERON_", "UBERON"), ("CL_", "CL"), ("GO_", "GO"),
    ):
        if idx.startswith(prefix):
            return kb
    return "UNKNOWN"


def synonym_frame() -> pd.DataFrame:
    """The canonical long-thin synonym frame (one row per surface form)."""
    rows = []
    for parser, idx, label, syns, _score in _SOURCES:
        ec = PARSERS[parser]
        rows.append((parser, idx, label, label, "lbl", ec))
        for s in syns:
            rows.append((parser, idx, label, s, "hasExactSynonym", ec))
    return pd.DataFrame(
        rows,
        columns=["parser_name", "idx", "default_label", "syn", "mapping_type", "entity_class"],
    )


def large_synonym_frame(n_ids: int = 20_000, seed: int = 7) -> pd.DataFrame:
    """Dictionary-scale synthetic ontology (~6 synonyms/id, so ~120k
    surface forms at the default size) for compile/matching stress tests.

    Real KAZU model packs carry ~10^6 synonyms across parsers
    (reference docs); this generator produces a deterministically-shaped
    corpus of that kind: symbols (GENE1234, GN-12/34), noun phrases
    ("<adj> <stem> <greek>"), plural/case/hyphen variants and shared
    ambiguous symbols — without external data.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    adjectives = ["acute", "chronic", "malignant", "benign", "familial",
                  "juvenile", "atypical", "recurrent"]
    stems = ["carcinoma", "lymphoma", "neuropathy", "dystrophy", "syndrome",
             "deficiency", "sclerosis", "dysplasia"]
    greeks = ["alpha", "beta", "gamma", "delta", ""]
    rows = []
    for i in range(n_ids):
        idx = f"SYNTH_{i:07d}"
        sym = f"SYN{i}"
        adj = adjectives[int(rng.integers(len(adjectives)))]
        stem = stems[int(rng.integers(len(stems)))]
        greek = greeks[int(rng.integers(len(greeks)))]
        label = f"{adj} {stem} {greek}".strip() + f" type {i % 97}"
        syns = [label, sym, f"{sym}-{i % 9}", label.replace(" ", "-", 1), label + "s"]
        if i % 50 == 0:  # shared ambiguous symbol every 50 ids
            syns.append(f"AMB{i // 50 % 100}")
        rows.append((idx, label, syns))
    out = []
    for idx, label, syns in rows:
        out.append(("SYNTH", idx, label, label, "lbl", "disease"))
        for s in syns[1:]:
            out.append(("SYNTH", idx, label, s, "hasExactSynonym", "disease"))
    return pd.DataFrame(
        out,
        columns=["parser_name", "idx", "default_label", "syn", "mapping_type", "entity_class"],
    )


def metadata_frame() -> pd.DataFrame:
    """Per-id metadata (reference MetadataDatabase, in_memory_db.py:23-74)."""
    rows = [
        (parser, idx, label, score, f"synthetic-{parser.lower()}")
        for parser, idx, label, _syns, score in _SOURCES
    ]
    return pd.DataFrame(
        rows,
        columns=["parser_name", "idx", "default_label", "annotation_score", "data_origin"],
    )
