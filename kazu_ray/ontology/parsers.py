"""Real ontology-format parsers -> the canonical long-thin synonym frame.

Round-1 shipped only synthetic-shaped sources (synth.py); a real user's
first act is pointing the compile job at a real ontology file (VERDICT
r1 item 3).  Each parser here reads a public format and emits the same
frame ``synth.synonym_frame`` produces — columns
``parser_name, idx, default_label, syn, mapping_type, entity_class`` —
which feeds :func:`kazu_ray.ontology.compile.compile_dictionaries`
unchanged.

Format semantics mirror the reference parsers (cited per class):

- :class:`TabularOntologyParser`  — reference
  kazu/ontology_preprocessing/parsers.py:1440-1506
- :class:`MondoJsonParser` (OBO-JSON) — parsers.py:897-950
- :class:`OboFlatParser` (Cellosaurus-style OBO) — parsers.py:1115-1195
- :class:`RdfParser` / :class:`SkosXlParser` (Turtle / N-Triples /
  RDF/XML) — parsers.py:453-608, 611-660.  rdflib is not installed in
  this container, so self-contained subset readers back them
  (:func:`parse_turtle`, :func:`parse_ntriples`, :func:`parse_rdf_xml`,
  dispatched by :func:`parse_rdf` on extension or explicit
  ``rdf_format``); if rdflib IS importable it is used instead, so any
  rdflib-supported serialization works wherever the dependency exists.
- :class:`ChemblSqliteParser` — parsers.py:1051-1078 (stdlib sqlite3,
  same SQL over molecule_dictionary / molecule_synonyms)
- :class:`MeddraParser` — parsers.py:1204-1330 ($-separated mdhier.asc
  + llt.asc, SOC exclusion, HLT/HLGT rows)

Parsing happens once at dictionary-compile time on small-by-design
inputs (ontologies are MBs, not TBs) — the distributed part of the
compile is the groupby shuffle in compile.py, not the file read.
"""

from __future__ import annotations

import json
import os
import re
import sqlite3
from dataclasses import dataclass, field

import pandas as pd

FRAME_COLUMNS = [
    "parser_name",
    "idx",
    "default_label",
    "syn",
    "mapping_type",
    "entity_class",
]


def _to_frame(parser_name: str, entity_class: str, rows: list) -> pd.DataFrame:
    """rows of (idx, default_label, syn, mapping_type) -> canonical frame."""
    df = pd.DataFrame(rows, columns=["idx", "default_label", "syn", "mapping_type"])
    df.insert(0, "parser_name", parser_name)
    df["entity_class"] = entity_class
    return df[FRAME_COLUMNS]


# ---------------------------------------------------------------------------
# Tabular (.tsv/.csv)
# ---------------------------------------------------------------------------


class TabularOntologyParser:
    """Already-tabulated data (reference parsers.py:1440-1506): the file
    must contain idx/default_label/syn/mapping_type columns; extra
    read_csv kwargs pass through."""

    def __init__(self, in_path: str, entity_class: str, name: str, **read_csv_kwargs):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self.read_csv_kwargs = read_csv_kwargs

    def parse_to_dataframe(self) -> pd.DataFrame:
        raw = pd.read_csv(self.in_path, **self.read_csv_kwargs)
        rows = list(
            zip(
                raw["idx"].astype(str),
                raw["default_label"].astype(str),
                raw["syn"].astype(str),
                raw["mapping_type"].astype(str),
            )
        )
        return _to_frame(self.name, self.entity_class, rows)


# ---------------------------------------------------------------------------
# OBO-JSON (Mondo-style)
# ---------------------------------------------------------------------------


class MondoJsonParser:
    """OBO-JSON graphs file (reference MondoOntologyParser,
    parsers.py:897-950): nodes filtered by a URI regex; the label plus
    hasExactSynonym entries become surface forms."""

    def __init__(
        self,
        in_path: str,
        entity_class: str,
        name: str,
        uri_regex: str = r"^http://purl\.obolibrary\.org/obo/(MONDO|HP)_[0-9]+$",
        allowed_predicates: frozenset = frozenset({"hasExactSynonym"}),
    ):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self._uri_regex = re.compile(uri_regex)
        self.allowed_predicates = allowed_predicates

    def parse_to_dataframe(self) -> pd.DataFrame:
        with open(self.in_path) as f:
            doc = json.load(f)
        nodes = doc["graphs"][0]["nodes"]
        rows = []
        for node in nodes:
            idx = node["id"]
            if not self._uri_regex.match(idx):
                continue
            default_label = node.get("lbl")
            if default_label is None:
                continue
            rows.append((idx, default_label, default_label, "lbl"))
            for syn_dict in node.get("meta", {}).get("synonyms", []):
                if syn_dict.get("pred") in self.allowed_predicates:
                    rows.append((idx, default_label, syn_dict["val"], syn_dict["pred"]))
        return _to_frame(self.name, self.entity_class, rows)


# ---------------------------------------------------------------------------
# OBO flat file (Cellosaurus-style)
# ---------------------------------------------------------------------------

_OBO_SYNONYM_RE = re.compile(
    r"""^synonym:
    \s*
    "(?P<syn>[^"]*)"
    \s*
    (?P<mapping>\w*)
    \s*
    (?:[\w:-]+\s*)?      # optional synonym-type id (OBO 1.4), e.g. OMO:0003005
    \[[^\]]*\]""",
    re.VERBOSE,
)


class OboFlatParser:
    """Line-based OBO (reference CellosaurusOntologyParser,
    parsers.py:1115-1195): ``id:`` / ``name:`` lines per stanza; with
    ``parse_synonyms=True`` also ``synonym: "..." EXACT [...]`` lines
    (the reference's documented regex — it disables this for
    cellosaurus, where the field is unreliable, so that stays the
    default).  ``strip_text_re`` reproduces the "cell line" removal."""

    def __init__(
        self,
        in_path: str,
        entity_class: str,
        name: str,
        parse_synonyms: bool = False,
        strip_text_re: re.Pattern | None = None,
    ):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self.parse_synonyms = parse_synonyms
        self.strip_text_re = strip_text_re

    def _clean(self, text: str) -> str:
        if self.strip_text_re is not None:
            return self.strip_text_re.sub("", text).strip()
        return text

    def parse_to_dataframe(self) -> pd.DataFrame:
        rows = []
        idx = ""
        default_label = ""
        with open(self.in_path) as f:
            for line in f:
                text = line.rstrip()
                if text.startswith("id:"):
                    idx = text.split(" ", 1)[1].strip()
                elif text.startswith("name:"):
                    default_label = self._clean(text[5:].strip())
                    rows.append((idx, default_label, default_label, "name"))
                elif self.parse_synonyms and text.startswith("synonym:"):
                    m = _OBO_SYNONYM_RE.match(text)
                    if m is None:
                        raise ValueError(f"unparseable OBO synonym line: {text!r}")
                    rows.append(
                        (idx, default_label, self._clean(m.group("syn")), m.group("mapping"))
                    )
        return _to_frame(self.name, self.entity_class, rows)


# ---------------------------------------------------------------------------
# Turtle / RDF
# ---------------------------------------------------------------------------

RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
OBO_EXACT_SYN = "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym"
SKOSXL_PREF = "http://www.w3.org/2008/05/skos-xl#prefLabel"
SKOSXL_ALT = "http://www.w3.org/2008/05/skos-xl#altLabel"
SKOSXL_LITERAL_FORM = "http://www.w3.org/2008/05/skos-xl#literalForm"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


@dataclass
class TripleStore:
    """Minimal in-memory triple store: subjects/objects are IRI or
    blank-node strings, literal objects are plain python strings tagged
    by being in ``literals``."""

    triples: set = field(default_factory=set)

    def add(self, s: str, p: str, o: str):
        self.triples.add((s, p, o))

    def objects(self, s: str, p) -> list:
        """Objects for subject+predicate; ``p`` may be a single IRI or a
        tuple of IRIs meaning a 2-step property path (SKOS-XL)."""
        if isinstance(p, tuple):
            first, rest = p[0], p[1:]
            out = []
            for mid in self.objects(s, first):
                out.extend(self.objects(mid, rest[0] if len(rest) == 1 else rest))
            return out
        return [o for (s2, p2, o) in self.triples if s2 == s and p2 == p]

    def subject_objects(self, p) -> list:
        if isinstance(p, tuple):
            out = []
            for s in {s for (s, _, _) in self.triples}:
                for o in self.objects(s, p):
                    out.append((s, o))
            return sorted(out)
        return sorted((s, o) for (s, p2, o) in self.triples if p2 == p)


_TTL_TOKEN = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*")
    | (?P<kw>@prefix|@base|\ba\b)
    | (?P<langtag>@[A-Za-z][A-Za-z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<bnode>_:[\w.-]+)
    | (?P<prefixed>[A-Za-z_][\w.-]*:[\w.-]*|:[\w.-]+)
    | (?P<punct>[;,.\[\]\(\)])
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)


_TTL_ESCAPE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|[tbnrf\"'\\])")
_TTL_ESCAPE_MAP = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _decode_ttl_escapes(s: str) -> str:
    """Turtle string-escape decoding on the TEXT (never via bytes —
    ``unicode_escape`` would mojibake all non-ASCII label content)."""

    def sub(m: re.Match) -> str:
        esc = m.group(1)
        if esc[0] in "uU":
            return chr(int(esc[1:], 16))
        return _TTL_ESCAPE_MAP[esc]

    return _TTL_ESCAPE.sub(sub, s)


def parse_turtle(path: str) -> TripleStore:
    """Self-contained reader for the Turtle subset real ontology exports
    use: @prefix, IRIs, prefixed names, ``a``, string literals with
    optional @lang / ^^datatype, ``;`` and ``,`` continuations, blank
    node labels (``_:b0``).  Falls back transparently when rdflib is
    available (then any rdflib-supported format works)."""
    try:
        import rdflib  # noqa: F401

        return _parse_with_rdflib(path)
    except ImportError:
        pass

    # utf-8-sig: tolerate a BOM, which real exports frequently carry
    text = open(path, encoding="utf-8-sig").read()
    tokens: list[tuple[str, str]] = []
    pos = 0
    for m in _TTL_TOKEN.finditer(text):
        if m.start() != pos:
            bad = text[pos : m.start()]
            raise ValueError(
                f"{path}: untokenizable turtle at offset {pos}: {bad[:40]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        # PN_LOCAL cannot end with '.', so a trailing dot on a prefixed
        # name is the statement terminator written without a space
        if kind in ("prefixed", "bnode") and val.endswith("."):
            tokens.append((kind, val[:-1]))
            tokens.append(("punct", "."))
            continue
        tokens.append((kind, val))

    if pos != len(text):
        raise ValueError(
            f"{path}: untokenizable turtle at offset {pos}: {text[pos:pos+40]!r}"
        )

    store = TripleStore()
    prefixes: dict[str, str] = {}
    i = 0

    def tok(j: int) -> tuple[str, str]:
        if j >= len(tokens):
            raise ValueError(f"{path}: truncated turtle (statement not terminated)")
        return tokens[j]

    def resolve(kind: str, val: str) -> str:
        if kind == "iri":
            return val[1:-1]
        if kind == "prefixed":
            pfx, _, local = val.partition(":")
            if pfx not in prefixes:
                raise ValueError(f"undefined prefix {pfx!r} in {path}")
            return prefixes[pfx] + local
        if kind == "bnode":
            return val
        if kind == "literal":
            return _decode_ttl_escapes(val[1:-1])
        if kind == "kw" and val == "a":
            return _RDF_TYPE
        raise ValueError(f"unexpected term {val!r}")

    while i < len(tokens):
        kind, val = tokens[i]
        if kind == "kw" and val == "@prefix":
            # @prefix pfx: <iri> .
            pfx_tok = tok(i + 1)[1]
            iri_tok = tok(i + 2)
            if tok(i + 3)[1] != ".":
                raise ValueError(f"{path}: @prefix statement not terminated with '.'")
            prefixes[pfx_tok.rstrip(":")] = iri_tok[1][1:-1]
            i += 4
            continue
        # subject
        subj = resolve(kind, val)
        i += 1
        while True:
            pred = resolve(*tok(i))
            i += 1
            while True:
                okind, oval = tok(i)
                obj = resolve(okind, oval)
                i += 1
                # swallow @lang / ^^datatype on literals
                while i < len(tokens) and tokens[i][0] in ("langtag", "dtype"):
                    if tokens[i][0] == "dtype":
                        i += 2  # ^^ + datatype iri
                    else:
                        i += 1
                store.add(subj, pred, obj)
                if tok(i)[1] == ",":
                    i += 1
                    continue
                break
            if tok(i)[1] == ";":
                i += 1
                # tolerate trailing ';' before '.'
                if tok(i)[1] == ".":
                    i += 1
                    break
                continue
            if tok(i)[1] == ".":
                i += 1
                break
        # next statement
    return store


def _parse_with_rdflib(path: str) -> TripleStore:
    import rdflib

    g = rdflib.Graph().parse(path)
    store = TripleStore()
    for s, p, o in g:
        store.add(str(s), str(p), str(o))
    return store


_NT_LINE = re.compile(
    r"""^\s*
    (?P<s><[^>]*>|_:[\w.-]+)\s+
    (?P<p><[^>]*>)\s+
    (?P<o><[^>]*>|_:[\w.-]+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?)
    \s*\.\s*$""",
    re.VERBOSE,
)


def parse_ntriples(path: str) -> TripleStore:
    """Self-contained N-Triples reader (one triple per line; IRIs,
    blank nodes, string literals with optional @lang / ^^datatype —
    tags swallowed like the turtle reader).  rdflib takes over when
    importable, identical to :func:`parse_turtle`."""
    try:
        import rdflib  # noqa: F401

        return _parse_with_rdflib(path)
    except ImportError:
        pass
    store = TripleStore()
    with open(path, encoding="utf-8-sig") as f:
        for lineno, line in enumerate(f, 1):
            if not line.strip() or line.lstrip().startswith("#"):
                continue
            m = _NT_LINE.match(line)
            if not m:
                raise ValueError(f"{path}:{lineno}: unparseable N-Triples line: {line[:60]!r}")

            def term(t: str) -> str:
                if t.startswith("<"):
                    return t[1:-1]
                if t.startswith("_:"):
                    return t
                lit = t[1 : t.rindex('"')]  # strip quotes + any @lang/^^dtype tail
                return _decode_ttl_escapes(lit)

            store.add(term(m.group("s")), term(m.group("p")), term(m.group("o")))
    return store


_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def parse_rdf_xml(path: str) -> TripleStore:
    """Self-contained RDF/XML reader for the subset real OWL/RDF
    exports use: rdf:Description and typed node elements (the element
    name becomes an rdf:type triple), rdf:about / rdf:nodeID subjects,
    property elements carrying rdf:resource IRIs, nested node
    elements, or text literals (xml:lang / rdf:datatype swallowed).
    rdf:parseType="Collection"/reification are outside the subset and
    raise.  rdflib takes over when importable."""
    try:
        import rdflib  # noqa: F401

        return _parse_with_rdflib(path)
    except ImportError:
        pass
    import xml.etree.ElementTree as ET

    root = ET.parse(path).getroot()
    store = TripleStore()
    counter = [0]

    def tag_iri(elem) -> str:
        if not elem.tag.startswith("{"):
            raise ValueError(f"{path}: un-namespaced element {elem.tag!r}")
        ns, local = elem.tag[1:].split("}", 1)
        return ns + local

    def node(elem) -> str:
        about = elem.get(f"{{{_RDF_NS}}}about")
        node_id = elem.get(f"{{{_RDF_NS}}}nodeID")
        if about is not None:
            subj = about
        elif node_id is not None:
            subj = "_:" + node_id
        else:
            subj = f"_:genid{counter[0]}"
            counter[0] += 1
        t = tag_iri(elem)
        if t != _RDF_NS + "Description":
            store.add(subj, _RDF_TYPE, t)
        for prop in elem:
            pred = tag_iri(prop)
            if prop.get(f"{{{_RDF_NS}}}parseType") is not None:
                raise ValueError(
                    f"{path}: rdf:parseType is outside the supported RDF/XML subset"
                )
            res = prop.get(f"{{{_RDF_NS}}}resource")
            children = list(prop)
            if res is not None:
                store.add(subj, pred, res)
            elif children:
                for child in children:
                    store.add(subj, pred, node(child))
            else:
                store.add(subj, pred, prop.text or "")
        return subj

    if tag_iri(root) == _RDF_NS + "RDF":
        for child in root:
            node(child)
    else:
        node(root)
    return store


def parse_rdf(path: str, rdf_format: str | None = None) -> TripleStore:
    """Format-dispatching RDF reader: explicit ``rdf_format`` ("ttl" /
    "nt" / "xml") or file-extension inference (.nt → N-Triples,
    .rdf/.owl/.xml → RDF/XML, anything else → Turtle) — mirroring the
    reference RDFGraphParser's rdflib format inference
    (parsers.py:453-608)."""
    fmt = rdf_format
    if fmt is None:
        ext = os.path.splitext(path)[1].lower()
        fmt = {".nt": "nt", ".rdf": "xml", ".owl": "xml", ".xml": "xml"}.get(ext, "ttl")
    if fmt == "nt":
        return parse_ntriples(path)
    if fmt == "xml":
        return parse_rdf_xml(path)
    return parse_turtle(path)


class RdfParser:
    """Turtle/RDF ontology parser (reference RDFGraphParser,
    parsers.py:453-608): subjects matching ``uri_regex`` whose
    ``label_predicate`` is present emit the label plus every
    ``synonym_predicates`` object as surface forms."""

    def __init__(
        self,
        in_path: str,
        entity_class: str,
        name: str,
        uri_regex: str,
        synonym_predicates: tuple = (OBO_EXACT_SYN,),
        label_predicate=RDFS_LABEL,
        include_entity_patterns: tuple = (),
        exclude_entity_patterns: tuple = (),
        rdf_format: str | None = None,
    ):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self._uri_regex = re.compile(uri_regex)
        self.synonym_predicates = synonym_predicates
        self.label_predicate = label_predicate
        self.include_entity_patterns = include_entity_patterns
        self.exclude_entity_patterns = exclude_entity_patterns
        # None = infer from extension (.nt / .rdf / .owl / .xml / .ttl)
        self.rdf_format = rdf_format

    def parse_to_dataframe(self) -> pd.DataFrame:
        store = parse_rdf(self.in_path, self.rdf_format)
        rows = []
        for sub, label in store.subject_objects(self.label_predicate):
            if not self._uri_regex.match(sub):
                continue
            if any(
                (sub, p, v) not in store.triples for p, v in self.include_entity_patterns
            ):
                continue
            if any((sub, p, v) in store.triples for p, v in self.exclude_entity_patterns):
                continue
            label_pred_str = (
                "/".join(self.label_predicate)
                if isinstance(self.label_predicate, tuple)
                else self.label_predicate
            )
            rows.append((sub, label, label, label_pred_str))
            for syn_pred in self.synonym_predicates:
                pred_str = "/".join(syn_pred) if isinstance(syn_pred, tuple) else syn_pred
                for syn in store.objects(sub, syn_pred):
                    rows.append((sub, label, syn, pred_str))
        return _to_frame(self.name, self.entity_class, rows)


class SkosXlParser(RdfParser):
    """SKOS-XL convenience parser (reference SKOSXLGraphParser,
    parsers.py:611-660): label/synonym predicates default to the 2-step
    skosxl:prefLabel/altLabel -> skosxl:literalForm property paths."""

    def __init__(self, in_path: str, entity_class: str, name: str, uri_regex: str):
        super().__init__(
            in_path,
            entity_class,
            name,
            uri_regex,
            synonym_predicates=((SKOSXL_ALT, SKOSXL_LITERAL_FORM),),
            label_predicate=(SKOSXL_PREF, SKOSXL_LITERAL_FORM),
        )


# ---------------------------------------------------------------------------
# ChEMBL sqlite
# ---------------------------------------------------------------------------


class ChemblSqliteParser:
    """ChEMBL sqlite dump (reference ChemblOntologyParser,
    parsers.py:1051-1078): molecule_dictionary joined to
    molecule_synonyms, plus pref_name rows; null pref_names dropped,
    exact duplicates eliminated."""

    def __init__(self, in_path: str, entity_class: str = "drug", name: str = "CHEMBL"):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name

    def parse_to_dataframe(self) -> pd.DataFrame:
        conn = sqlite3.connect(self.in_path)
        try:
            query = """
                SELECT chembl_id AS idx, pref_name AS default_label,
                       synonyms AS syn, syn_type AS mapping_type
                FROM molecule_dictionary AS md
                         JOIN molecule_synonyms ms ON md.molregno = ms.molregno
                UNION ALL
                SELECT chembl_id AS idx, pref_name AS default_label,
                       pref_name AS syn, 'pref_name' AS mapping_type
                FROM molecule_dictionary
            """
            df = pd.read_sql(query, conn)
        finally:
            conn.close()
        df = df.dropna(subset=["default_label"]).drop_duplicates()
        rows = list(
            zip(df["idx"], df["default_label"], df["syn"], df["mapping_type"])
        )
        return _to_frame(self.name, self.entity_class, rows)


# ---------------------------------------------------------------------------
# MedDRA $-separated .asc release
# ---------------------------------------------------------------------------

_MDHIER_COLS = (
    "pt_code",
    "hlt_code",
    "hlgt_code",
    "soc_code",
    "pt_name",
    "hlt_name",
    "hlgt_name",
    "soc_name",
    "soc_abbrev",
    "null_field",
    "pt_soc_code",
    "primary_soc_fg",
    "NULL",
)

_LLT_COLS = (
    "llt_code",
    "llt_name",
    "pt_code",
    "llt_whoart_code",
    "llt_harts_code",
    "llt_costart_sym",
    "llt_icd9_code",
    "llt_icd9cm_code",
    "llt_icd10_code",
    "llt_currency",
    "llt_jart_code",
    "NULL",
)

_DEFAULT_EXCLUDE_SOCS = (
    "Surgical and medical procedures",
    "Social circumstances",
    "Investigations",
)


class MeddraParser:
    """MedDRA release directory (reference MeddraOntologyParser,
    parsers.py:1204-1330): reads $-separated ``mdhier.asc`` +
    ``llt.asc``; PT rows carry their LLT names as synonyms; HLT and
    HLGT levels are added once each; excluded SOCs are dropped."""

    def __init__(
        self,
        in_path: str,
        entity_class: str = "disease",
        name: str = "MEDDRA",
        exclude_socs=_DEFAULT_EXCLUDE_SOCS,
    ):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self.exclude_socs = tuple(exclude_socs)

    def parse_to_dataframe(self) -> pd.DataFrame:
        hier_df = pd.read_csv(
            os.path.join(self.in_path, "mdhier.asc"),
            sep="$",
            header=None,
            names=_MDHIER_COLS,
            dtype="string",
        )
        hier_df = hier_df[~hier_df["soc_name"].isin(self.exclude_socs)]
        llt_df = pd.read_csv(
            os.path.join(self.in_path, "llt.asc"),
            sep="$",
            header=None,
            names=_LLT_COLS,
            usecols=("llt_name", "pt_code"),
            dtype="string",
        ).dropna(subset=["llt_name", "pt_code"])  # drop incomplete ROWS

        # vectorized join replaces the reference's per-row scan
        pt = hier_df[["pt_code", "pt_name"]]
        rows = [
            (r.pt_code, r.pt_name, r.pt_name, "meddra_link") for r in pt.itertuples()
        ]
        merged = llt_df.merge(pt, on="pt_code", how="inner")
        rows.extend(
            (r.pt_code, r.pt_name, r.llt_name, "meddra_link") for r in merged.itertuples()
        )
        for code_col, name_col in (("hlt_code", "hlt_name"), ("hlgt_code", "hlgt_name")):
            lvl = hier_df[[code_col, name_col]].drop_duplicates()
            rows.extend(
                (getattr(r, code_col), getattr(r, name_col), getattr(r, name_col), "meddra_link")
                for r in lvl.itertuples()
            )
        return _to_frame(self.name, self.entity_class, rows)


# ---------------------------------------------------------------------------
# JSON-lines ontologies: OpenTargets disease/target/molecule + HGNC
# ---------------------------------------------------------------------------


class JsonLinesParser:
    """One KB entry per line (reference JsonLinesOntologyParser,
    parsers.py:56-88).  ``in_path`` may be a directory (every ``*.json``
    / ``*.jsonl`` inside is read, the OpenTargets release layout) or a
    single file.  Subclasses implement :meth:`records`.

    Subclasses may also set ``grouping`` ("default" | "xref" | "label")
    and fill ``xrefs_by_idx`` during parse — the compile job's
    score_and_group_ids consults these to reproduce the reference's
    build-time id groupings (disease dbXRef intersection, target
    same-label grouping)."""

    grouping: str = "default"

    def __init__(self, in_path: str, entity_class: str, name: str):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name
        self.xrefs_by_idx: dict[str, frozenset] = {}
        self.annotation_score_by_idx: dict[str, int] = {}

    def read(self):
        if os.path.isdir(self.in_path):
            paths = sorted(
                os.path.join(self.in_path, f)
                for f in os.listdir(self.in_path)
                if f.endswith((".json", ".jsonl"))
            )
        else:
            paths = [self.in_path]
        for p in paths:
            with open(p) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        yield json.loads(line)

    def records(self, jsons_gen):
        raise NotImplementedError

    def parse_to_dataframe(self) -> pd.DataFrame:
        return _to_frame(self.name, self.entity_class, list(self.records(self.read())))


class OpenTargetsDiseaseParser(JsonLinesParser):
    """OpenTargets disease release (reference
    OpenTargetsDiseaseOntologyParser, parsers.py:91-250): top-level
    therapeutic areas are skipped, entries outside
    ``allowed_therapeutic_areas`` are skipped, and each entry yields its
    name plus hasExactSynonym rows.  Per-id dbXRefs (plus the id itself
    in CURIE form) are recorded for the compile-time xref grouping
    (parsers.py:145-211)."""

    grouping = "xref"

    def __init__(self, in_path: str, entity_class: str, name: str,
                 allowed_therapeutic_areas):
        super().__init__(in_path, entity_class, name)
        self.allowed_therapeutic_areas = set(allowed_therapeutic_areas)

    def records(self, jsons_gen):
        for d in jsons_gen:
            if d.get("ontology", {}).get("isTherapeuticArea"):
                continue
            if set(d.get("therapeuticAreas", ())).isdisjoint(
                self.allowed_therapeutic_areas
            ):
                continue
            idx = d["id"]
            label = d["name"]
            self.xrefs_by_idx[idx] = frozenset(
                d.get("dbXRefs", [])
            ) | {idx.replace("_", ":")}
            yield (idx, label, label, "name")
            for syn in d.get("synonyms", {}).get("hasExactSynonym", []):
                yield (idx, label, syn, "hasExactSynonym")


# annotation richness proxy (reference OpenTargetsTargetOntologyParser
# ANNOTATION_FIELDS, parsers.py:266-277)
_OT_TARGET_ANNOTATION_FIELDS = (
    "subcellularLocations", "tractability", "constraint",
    "functionDescriptions", "go", "hallmarks", "chemicalProbes",
    "safetyLiabilities", "pathways", "targetClass",
)


class OpenTargetsTargetParser(JsonLinesParser):
    """OpenTargets target release (reference
    OpenTargetsTargetOntologyParser, parsers.py:253-441): records
    without an approved symbol (id == approvedSymbol) and excluded
    biotypes are dropped; synonyms/obsoleteSymbols/obsoleteNames/
    proteinIds rows carry their source as mapping_type; approvedSymbol /
    approvedName / id are emitted as their own rows.  Ensembl ids of the
    same gene are grouped at compile time by default label
    (parsers.py:318-354); per-id annotation_score feeds the
    AnnotationLevel disambiguation strategy."""

    grouping = "label"

    def __init__(self, in_path: str, entity_class: str, name: str,
                 excluded_biotypes=()):
        super().__init__(in_path, entity_class, name)
        self.excluded_biotypes = set(excluded_biotypes)

    def records(self, jsons_gen):
        for d in jsons_gen:
            if d.get("biotype") in self.excluded_biotypes:
                continue
            if d["id"] == d["approvedSymbol"]:
                continue
            idx = d["id"]
            label = d["approvedSymbol"]
            self.annotation_score_by_idx[idx] = sum(
                1 for f in _OT_TARGET_ANNOTATION_FIELDS if len(d.get(f, [])) > 0
            )
            for key in ("synonyms", "obsoleteSymbols", "obsoleteNames", "proteinIds"):
                for rec in d.get(key, []):
                    if "label" in rec and "id" in rec:
                        raise ValueError(f"record {rec} has both id and label")
                    syn = rec["label"] if "label" in rec else rec["id"]
                    yield (idx, label, syn, rec["source"])
            yield (idx, label, d["approvedSymbol"], "approvedSymbol")
            yield (idx, label, d["approvedName"], "approvedName")
            yield (idx, label, idx, "opentargets_id")


class OpenTargetsMoleculeParser(JsonLinesParser):
    """OpenTargets molecule release (reference
    OpenTargetsMoleculeOntologyParser, parsers.py:416-452): synonyms +
    the name itself as mapping_type "synonyms", trade names as
    "tradeNames"."""

    def records(self, jsons_gen):
        for d in jsons_gen:
            idx = d["id"]
            label = d["name"]
            for syn in [*d.get("synonyms", []), label]:
                yield (idx, label, syn, "synonyms")
            for tn in d.get("tradeNames", []):
                yield (idx, label, tn, "tradeNames")


_HGNC_SYN_KEYS = (
    "name", "symbol", "uniprot_ids", "alias_name", "alias_symbol",
    "prev_name", "lncipedia", "prev_symbol", "vega_id",
    "refseq_accession", "hgnc_id", "mgd_id", "rgd_id", "ccds_id",
    "pseudogene.org",
)


class HGNCGeneParser:
    """hgnc_complete_set.json (reference HGNCGeneOntologyParser,
    parsers.py:953-1048): one whole-file json with response.docs; every
    doc with an ensembl_gene_id + name yields its deduplicated synonym
    strings across the fixed key list, keyed by the Ensembl id."""

    def __init__(self, in_path: str, entity_class: str = "gene", name: str = "HGNC"):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name

    def parse_to_dataframe(self) -> pd.DataFrame:
        with open(self.in_path) as f:
            data = json.load(f)
        rows = []
        for doc in data["response"]["docs"]:
            idx = doc.get("ensembl_gene_id")
            label = doc.get("name")
            if idx is None or label is None:
                continue
            seen = set()
            for key in _HGNC_SYN_KEYS:
                vals = doc.get(key, [])
                if not isinstance(vals, list):
                    vals = [vals]
                for syn in vals:
                    if (syn, key) not in seen:
                        seen.add((syn, key))
                        rows.append((idx, label, syn, key))
        return _to_frame(self.name, self.entity_class, rows)


class HGNCGeneFamilyParser:
    """HGNC gene-family TSV (reference HGNCGeneFamilyParser,
    parsers.py:1398-1437): rows grouped by Family ID; the single family
    name plus "Family alias" / "Common root gene symbol" values become
    synonyms."""

    syn_column_keys = ("Family alias", "Common root gene symbol")

    def __init__(self, in_path: str, entity_class: str = "gene_family",
                 name: str = "HGNC_GENE_FAMILY"):
        self.in_path = in_path
        self.entity_class = entity_class
        self.name = name

    def parse_to_dataframe(self) -> pd.DataFrame:
        df = pd.read_csv(self.in_path, sep="\t")
        rows = []
        for family_id, grp in df.groupby("Family ID"):
            names = set(grp["Family name"].dropna())
            assert len(names) == 1, f"multiple family names for {family_id}"
            label = next(iter(names))
            rows.append((family_id, label, label, "Family name"))
            for key in self.syn_column_keys:
                for syn in sorted(set(grp[key].dropna())):
                    rows.append((family_id, label, syn, key))
        return _to_frame(self.name, self.entity_class, rows)


def frames_from_parsers(parsers: list) -> pd.DataFrame:
    """Concatenate parser outputs into one compile-ready frame."""
    return pd.concat([p.parse_to_dataframe() for p in parsers], ignore_index=True)


def grouping_hints(parsers: list) -> dict:
    """Collect the compile-time grouping metadata the jsonl parsers
    expose: per-parser grouping mode, per-(parser, idx) xref sets, and
    per-(parser, idx) annotation scores.  Feed the result to
    ``compile_dictionaries(..., grouping=...)``."""
    modes = {}
    xrefs = {}
    scores = {}
    for p in parsers:
        mode = getattr(p, "grouping", "default")
        if mode != "default":
            modes[p.name] = mode
        for idx, xs in getattr(p, "xrefs_by_idx", {}).items():
            xrefs[(p.name, idx)] = xs
        for idx, sc in getattr(p, "annotation_score_by_idx", {}).items():
            scores[(p.name, idx)] = sc
    return {"modes": modes, "xrefs": xrefs, "annotation_scores": scores}
