"""Real ontology-format parsers (VERDICT r1 item 3): each format's
fixture compiles through the standard compile job and the resulting
frames match hand-computed expectations."""

import os
import re
import sqlite3

import pytest

from kazu_ray.ontology.parsers import (
    ChemblSqliteParser,
    MeddraParser,
    MondoJsonParser,
    OboFlatParser,
    RdfParser,
    SkosXlParser,
    TabularOntologyParser,
    frames_from_parsers,
    parse_turtle,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ontology")


def test_mondo_json_parser():
    p = MondoJsonParser(os.path.join(FIX, "mondo_sample.json"), "disease", "MONDO")
    df = p.parse_to_dataframe()
    # 2 MONDO nodes (1 skipped for no label, 1 filtered by regex) + 1 HP node
    ids = set(df["idx"])
    assert ids == {
        "http://purl.obolibrary.org/obo/MONDO_0004979",
        "http://purl.obolibrary.org/obo/MONDO_0005148",
        "http://purl.obolibrary.org/obo/HP_0002099",
    }
    asthma = df[df["default_label"] == "asthma"]
    # label + 2 exact synonyms; related synonym excluded
    assert sorted(asthma["syn"]) == ["asthma", "asthma bronchiale", "bronchial asthma"]
    assert set(asthma["mapping_type"]) == {"lbl", "hasExactSynonym"}
    assert "wheeze" not in set(df["syn"])
    assert list(df["entity_class"].unique()) == ["disease"]


def test_obo_flat_parser_names_only():
    p = OboFlatParser(os.path.join(FIX, "cello_sample.obo"), "cell_line", "CELLOSAURUS",
                      strip_text_re=re.compile("cell line", re.IGNORECASE))
    df = p.parse_to_dataframe()
    # synonyms disabled by default (reference behavior for cellosaurus)
    assert len(df) == 3
    assert sorted(df["syn"]) == ["A549", "HEK293", "HeLa"]  # "cell line" stripped
    assert set(df["idx"]) == {"CVCL_0030", "CVCL_0031", "CVCL_0045"}


def test_obo_flat_parser_with_synonyms():
    p = OboFlatParser(os.path.join(FIX, "cello_sample.obo"), "cell_line", "CELLOSAURUS",
                      parse_synonyms=True)
    df = p.parse_to_dataframe()
    hela = df[df["idx"] == "CVCL_0030"]
    assert sorted(hela["syn"]) == ["He La", "HeLa cell line", "Hela"]
    assert sorted(hela["mapping_type"]) == ["EXACT", "RELATED", "name"]


def test_turtle_parser_triples():
    store = parse_turtle(os.path.join(FIX, "disease_sample.ttl"))
    objs = store.objects(
        "http://purl.obolibrary.org/obo/MONDO_0002367",
        "http://www.geneontology.org/formats/oboInOwl#hasExactSynonym",
    )
    assert sorted(objs) == ["nephropathy", "renal disease"]


def test_rdf_parser_with_exclusion():
    p = RdfParser(
        os.path.join(FIX, "disease_sample.ttl"),
        "disease",
        "MONDO_TTL",
        uri_regex=r"^http://purl\.obolibrary\.org/obo/MONDO_[0-9]+$",
        exclude_entity_patterns=(
            ("http://www.w3.org/2002/07/owl#deprecated", "true"),
        ),
    )
    df = p.parse_to_dataframe()
    # deprecated node + wrong-namespace node excluded
    assert set(df["default_label"]) == {"kidney disease", "type 1 diabetes mellitus"}
    kidney = df[df["default_label"] == "kidney disease"]
    assert sorted(kidney["syn"]) == ["kidney disease", "nephropathy", "renal disease"]


def test_ntriples_and_rdfxml_match_turtle():
    # the same graph serialized three ways parses to the same triples
    from kazu_ray.ontology.parsers import parse_ntriples, parse_rdf, parse_rdf_xml

    ttl = parse_turtle(os.path.join(FIX, "disease_sample.ttl"))
    nt = parse_ntriples(os.path.join(FIX, "disease_sample.nt"))
    xml = parse_rdf_xml(os.path.join(FIX, "disease_sample.rdf"))
    assert nt.triples == ttl.triples
    assert xml.triples == ttl.triples
    # extension dispatch picks the right reader
    assert parse_rdf(os.path.join(FIX, "disease_sample.nt")).triples == ttl.triples
    assert parse_rdf(os.path.join(FIX, "disease_sample.rdf")).triples == ttl.triples


def test_rdf_parser_same_frame_across_serializations():
    # an arbitrary public ontology ingests identically from .ttl / .nt
    # / .rdf through the same include/exclude pattern surface
    frames = []
    for fname in ("disease_sample.ttl", "disease_sample.nt", "disease_sample.rdf"):
        p = RdfParser(
            os.path.join(FIX, fname),
            "disease",
            "MONDO_ANY",
            uri_regex=r"^http://purl\.obolibrary\.org/obo/MONDO_[0-9]+$",
            exclude_entity_patterns=(
                ("http://www.w3.org/2002/07/owl#deprecated", "true"),
            ),
        )
        frames.append(
            p.parse_to_dataframe()
            .sort_values(["idx", "syn", "mapping_type"])
            .reset_index(drop=True)
        )
    assert frames[0].equals(frames[1])
    assert frames[0].equals(frames[2])
    assert set(frames[0]["default_label"]) == {
        "kidney disease",
        "type 1 diabetes mellitus",
    }


def test_rdfxml_nested_and_bnode_subjects(tmp_path):
    from kazu_ray.ontology.parsers import parse_rdf_xml

    p = tmp_path / "nested.rdf"
    p.write_text(
        """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://example.org/">
  <ex:Thing rdf:about="http://example.org/a">
    <ex:linksTo rdf:resource="http://example.org/b"/>
    <ex:part>
      <ex:Piece rdf:nodeID="p1">
        <ex:name>inner</ex:name>
      </ex:Piece>
    </ex:part>
  </ex:Thing>
</rdf:RDF>"""
    )
    store = parse_rdf_xml(str(p))
    assert ("http://example.org/a", "http://example.org/linksTo", "http://example.org/b") in store.triples
    assert ("http://example.org/a", "http://example.org/part", "_:p1") in store.triples
    assert ("_:p1", "http://example.org/name", "inner") in store.triples
    assert (
        "_:p1",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://example.org/Piece",
    ) in store.triples


def test_skosxl_parser_property_paths():
    p = SkosXlParser(
        os.path.join(FIX, "skos_sample.ttl"),
        "disease",
        "MEDDRA_SKOS",
        uri_regex=r"^http://example\.org/meddra/[0-9]+$",
    )
    df = p.parse_to_dataframe()
    pain = df[df["default_label"] == "Abdominal pain"]
    assert sorted(pain["syn"]) == ["Abdominal pain", "Belly ache", "Stomach ache"]
    assert set(df[df["default_label"] == "Nausea"]["syn"]) == {"Nausea"}


def test_chembl_sqlite_parser(tmp_path):
    db = tmp_path / "chembl.db"
    conn = sqlite3.connect(db)
    conn.executescript(
        """
        CREATE TABLE molecule_dictionary (molregno INTEGER, chembl_id TEXT, pref_name TEXT);
        CREATE TABLE molecule_synonyms (molregno INTEGER, synonyms TEXT, syn_type TEXT);
        INSERT INTO molecule_dictionary VALUES (1, 'CHEMBL25', 'ASPIRIN');
        INSERT INTO molecule_dictionary VALUES (2, 'CHEMBL112', 'PARACETAMOL');
        INSERT INTO molecule_dictionary VALUES (3, 'CHEMBL999', NULL);
        INSERT INTO molecule_synonyms VALUES (1, 'Acetylsalicylic acid', 'TRADE_NAME');
        INSERT INTO molecule_synonyms VALUES (1, 'Aspirin', 'INN');
        INSERT INTO molecule_synonyms VALUES (2, 'Acetaminophen', 'INN');
        INSERT INTO molecule_synonyms VALUES (3, 'Mystery drug', 'INN');
        """
    )
    conn.commit()
    conn.close()
    df = ChemblSqliteParser(str(db)).parse_to_dataframe()
    # null pref_name dropped entirely
    assert "Mystery drug" not in set(df["syn"])
    aspirin = df[df["idx"] == "CHEMBL25"]
    assert sorted(aspirin["syn"]) == ["ASPIRIN", "Acetylsalicylic acid", "Aspirin"]
    assert "pref_name" in set(aspirin["mapping_type"])


def test_meddra_parser():
    p = MeddraParser(os.path.join(FIX, "meddra"))
    df = p.parse_to_dataframe()
    # Investigations SOC excluded -> Biopsy absent
    assert "Biopsy" not in set(df["syn"])
    pain = df[df["idx"] == "10001551"]
    assert sorted(pain["syn"]) == ["Abdominal pain", "Belly ache", "Stomach ache"]
    # HLT/HLGT levels present once each
    assert "GI signs" in set(df["syn"])
    assert "GI disorders NEC" in set(df["syn"])
    assert (df["mapping_type"] == "meddra_link").all()


def test_tabular_parser():
    p = TabularOntologyParser(
        os.path.join(FIX, "tabular_sample.tsv"), "gene", "GENE_TSV", sep="\t"
    )
    df = p.parse_to_dataframe()
    assert len(df) == 3
    assert set(df[df["idx"] == "GENE:1"]["syn"]) == {
        "epidermal growth factor receptor",
        "ERBB1",
    }


def test_formats_compile_end_to_end(ray_session, tmp_path):
    """All format parsers' frames flow through the standard compile job:
    the synonyms side table contains normalized terms from every format."""
    import pyarrow.parquet as pq

    from kazu_ray.functions.normalize import normalize
    from kazu_ray.ontology.compile import compile_dictionaries

    parsers = [
        MondoJsonParser(os.path.join(FIX, "mondo_sample.json"), "disease", "MONDO"),
        OboFlatParser(
            os.path.join(FIX, "cello_sample.obo"),
            "cell_line",
            "CELLOSAURUS",
            strip_text_re=re.compile("cell line", re.IGNORECASE),
        ),
        RdfParser(
            os.path.join(FIX, "disease_sample.ttl"),
            "disease",
            "MONDO_TTL",
            uri_regex=r"^http://purl\.obolibrary\.org/obo/MONDO_[0-9]+$",
        ),
        TabularOntologyParser(
            os.path.join(FIX, "tabular_sample.tsv"), "gene", "GENE_TSV", sep="\t"
        ),
    ]
    frame = frames_from_parsers(parsers)
    # metadata frame for these sources: idx -> default_label
    out = compile_dictionaries(str(tmp_path / "dicts"), source_df=frame)
    syn = pq.read_table(out.synonyms_path).to_pylist()
    by_parser = {}
    for row in syn:
        by_parser.setdefault(row["parser_name"], set()).add(row["term_norm"])
    assert normalize("bronchial asthma", "disease") in by_parser["MONDO"]
    assert normalize("HeLa", "cell_line") in by_parser["CELLOSAURUS"]
    assert normalize("renal disease", "disease") in by_parser["MONDO_TTL"]
    assert normalize("ERBB1", "gene") in by_parser["GENE_TSV"]
    # URL-shaped IRIs resolve their KB (find_kb IRI branch)
    mondo_rows = [r for r in syn if r["parser_name"] == "MONDO"]
    sources = {
        ids["source"]
        for r in mondo_rows
        for id_set in r["assoc_sets"]
        for ids in id_set
    }
    assert "MONDO" in sources or "HP" in sources


# --- round-2 review regression cases ---------------------------------------


def test_turtle_unicode_literals(tmp_path):
    from kazu_ray.ontology.parsers import parse_turtle

    p = tmp_path / "u.ttl"
    p.write_text(
        '@prefix ex: <http://e.org/> .\n'
        'ex:a ex:label "café disease" .\n'
        'ex:b ex:label "\\u03b1-synuclein" .\n',
        encoding="utf-8",
    )
    store = parse_turtle(str(p))
    objs = {o for (_s, _p, o) in store.triples}
    assert "café disease" in objs       # no mojibake
    assert "α-synuclein" in objs         # \u escape decoded


def test_turtle_truncated_raises_clean_error(tmp_path):
    from kazu_ray.ontology.parsers import parse_turtle

    p = tmp_path / "t.ttl"
    p.write_text('@prefix ex: <http://e.org/> .\nex:a ex:b "unterminated"', encoding="utf-8")
    with pytest.raises(ValueError, match="truncated"):
        parse_turtle(str(p))


def test_obo_synonym_type_id_accepted(tmp_path):
    from kazu_ray.ontology.parsers import OboFlatParser

    p = tmp_path / "s.obo"
    p.write_text(
        "[Term]\nid: X:1\nname: thing\n"
        'synonym: "Hela cell" EXACT OMO:0003005 []\n',
        encoding="utf-8",
    )
    df = OboFlatParser(str(p), "cell_line", "T", parse_synonyms=True).parse_to_dataframe()
    assert "Hela cell" in set(df["syn"])


def test_meddra_incomplete_llt_row_dropped(tmp_path):
    import os as _os

    from kazu_ray.ontology.parsers import MeddraParser

    d = tmp_path / "meddra"
    d.mkdir()
    (d / "mdhier.asc").write_text(
        "10000001$20000001$30000001$40000001$Pain$HLT$HLGT$SOC name$S$$40000001$Y$\n"
    )
    # second row has an empty pt_code -> row dropped, parse survives
    (d / "llt.asc").write_text(
        "10000002$Ache$10000001$$$$$$$Y$$\n"
        "10000003$Orphan$$$$$$$$Y$$\n"
    )
    df = MeddraParser(str(d)).parse_to_dataframe()
    assert "Ache" in set(df["syn"])
    assert "Orphan" not in set(df["syn"])


# --- JSON-lines parsers (OpenTargets + HGNC) -------------------------------


def test_ot_disease_parser_filters_and_xrefs():
    from kazu_ray.ontology.parsers import OpenTargetsDiseaseParser

    p = OpenTargetsDiseaseParser(
        os.path.join(FIX, "ot_disease_sample.jsonl"), "disease", "OT_DISEASE",
        allowed_therapeutic_areas=["MONDO_0045024"],
    )
    df = p.parse_to_dataframe()
    # therapeutic-area record skipped; disallowed-area record skipped
    assert "MONDO_0045024" not in set(df["idx"])
    assert "MONDO_0008" not in set(df["idx"])
    # related synonyms ignored (reference yields only hasExactSynonym)
    assert "asthma-ish" not in set(df["syn"])
    acute = df[df["idx"] == "MONDO_0001"]
    assert sorted(acute["syn"]) == ["acute asthma", "sudden asthma"]
    assert sorted(set(acute["mapping_type"])) == ["hasExactSynonym", "name"]
    # xref map records dbXRefs + the id itself in CURIE form
    assert p.xrefs_by_idx["MONDO_0001"] == {"UMLS:C0001", "DOID:111", "MONDO:0001"}


def test_ot_target_parser_records():
    from kazu_ray.ontology.parsers import OpenTargetsTargetParser

    p = OpenTargetsTargetParser(
        os.path.join(FIX, "ot_target_sample.jsonl"), "gene", "OT_TARGET",
        excluded_biotypes=["snRNA"],
    )
    df = p.parse_to_dataframe()
    # excluded biotype + no-approved-symbol records dropped
    assert "ENSG00000777777" not in set(df["idx"])
    assert "ENSG00000888888" not in set(df["idx"])
    egfr = df[df["idx"] == "ENSG00000146648"]
    assert set(egfr["syn"]) == {
        "ERBB1", "P00533", "EGFR",
        "epidermal growth factor receptor", "ENSG00000146648",
    }
    # mapping types carry the synonym's source / field
    mt = dict(zip(egfr["syn"], egfr["mapping_type"]))
    assert mt["ERBB1"] == "HGNC"
    assert mt["P00533"] == "uniprot_swissprot"
    assert mt["ENSG00000146648"] == "opentargets_id"
    # annotation richness: EGFR has go+pathways, KRAS has go, isoform none
    assert p.annotation_score_by_idx["ENSG00000146648"] == 2
    assert p.annotation_score_by_idx["ENSG00000133703"] == 1
    assert p.annotation_score_by_idx["ENSG00000999001"] == 0


def test_ot_molecule_parser_records():
    from kazu_ray.ontology.parsers import OpenTargetsMoleculeParser

    p = OpenTargetsMoleculeParser(
        os.path.join(FIX, "ot_molecule_sample.jsonl"), "drug", "OT_MOLECULE"
    )
    df = p.parse_to_dataframe()
    asp = df[df["idx"] == "CHEMBL25"]
    assert set(asp["syn"]) == {
        "ASPIRIN", "Acetylsalicylic acid", "2-Acetoxybenzoic acid",
        "Aspro", "Ecotrin",
    }
    mt = dict(zip(asp["syn"], asp["mapping_type"]))
    assert mt["Aspro"] == "tradeNames" and mt["ASPIRIN"] == "synonyms"


def test_hgnc_gene_parser():
    from kazu_ray.ontology.parsers import HGNCGeneParser

    df = HGNCGeneParser(os.path.join(FIX, "hgnc_sample.json")).parse_to_dataframe()
    # doc without ensembl_gene_id skipped
    assert set(df["idx"]) == {"ENSG00000146648", "ENSG00000133703"}
    egfr = df[df["idx"] == "ENSG00000146648"]
    assert {"EGFR", "ERBB1", "HER1", "P00533", "HGNC:3236",
            "epidermal growth factor receptor"} <= set(egfr["syn"])
    # scalar json values handled like single-element lists
    assert "OTTHUMG00000023661" in set(egfr["syn"])
    mt = dict(zip(egfr["syn"], egfr["mapping_type"]))
    assert mt["HER1"] == "alias_symbol" and mt["P00533"] == "uniprot_ids"


def test_hgnc_family_parser():
    from kazu_ray.ontology.parsers import HGNCGeneFamilyParser

    df = HGNCGeneFamilyParser(
        os.path.join(FIX, "hgnc_family_sample.tsv")
    ).parse_to_dataframe()
    ils = df[df["idx"] == 588]
    assert sorted(ils["syn"]) == ["IL", "ILs", "Interleukin family", "Interleukins"]
    rtk = df[df["idx"] == 471]
    # empty alias cells dropped, not emitted as NaN synonyms
    assert sorted(rtk["syn"]) == ["RTK", "Receptor tyrosine kinases"]


def test_jsonl_build_time_groupings_compile(ray_session, tmp_path):
    """The reference's build-time id groupings survive the compile job:
    OT disease groups ambiguous synonyms by dbXRef intersection (merging
    xref-linked ids, splitting unlinked ones, falling back on confused
    evidence); OT target groups Ensembl ids by default label; target
    annotation scores land in metadata.parquet."""
    import pyarrow.parquet as pq

    from kazu_ray.functions.normalize import normalize
    from kazu_ray.ontology.compile import compile_dictionaries
    from kazu_ray.ontology.parsers import (
        OpenTargetsDiseaseParser,
        OpenTargetsTargetParser,
        grouping_hints,
    )

    parsers = [
        OpenTargetsDiseaseParser(
            os.path.join(FIX, "ot_disease_sample.jsonl"), "disease", "OT_DISEASE",
            allowed_therapeutic_areas=["MONDO_0045024"],
        ),
        OpenTargetsTargetParser(
            os.path.join(FIX, "ot_target_sample.jsonl"), "gene", "OT_TARGET",
            excluded_biotypes=["snRNA"],
        ),
    ]
    frame = frames_from_parsers(parsers)  # fills xref/score maps
    out = compile_dictionaries(
        str(tmp_path / "dicts"), source_df=frame, grouping=grouping_hints(parsers)
    )
    syn = {
        (r["parser_name"], r["term_norm"]): r
        for r in pq.read_table(out.synonyms_path).to_pylist()
    }

    def id_sets(parser, term, cls):
        row = syn[(parser, normalize(term, cls))]
        return (
            sorted(sorted(m["idx"] for m in s) for s in row["assoc_sets"]),
            row["agg_strategy"],
        )

    # shared xref UMLS:C0001 -> one merged pair
    assert id_sets("OT_DISEASE", "sudden asthma", "disease") == (
        [["EFO_0002", "MONDO_0001"]], "RESOLVED_BY_XREF")
    # no shared xref -> SPLIT, where the default non-symbolic rule would merge
    assert id_sets("OT_DISEASE", "persistent wheeze", "disease") == (
        [["EFO_0004"], ["MONDO_0003"]], "RESOLVED_BY_XREF")
    # confused xref evidence (A~B via X1, B~C via X2) -> default fallback
    assert id_sets("OT_DISEASE", "mystery cough", "disease") == (
        [["EFO_0007", "MONDO_0005", "MONDO_0006"]], "MERGED_AS_NON_SYMBOLIC")
    # same approved symbol -> isoform Ensembl ids grouped as one gene
    assert id_sets("OT_TARGET", "EGFR", "gene") == (
        [["ENSG00000146648", "ENSG00000999001"]], "CUSTOM")
    # shared surface across DIFFERENT labels -> split by label
    assert id_sets("OT_TARGET", "ERBB1", "gene") == (
        [["ENSG00000133703"], ["ENSG00000146648"]], "CUSTOM")
    # annotation scores merged into the metadata side table
    meta = pq.read_table(out.metadata_path).to_pylist()
    scores = {m["idx"]: m["annotation_score"] for m in meta
              if m["parser_name"] == "OT_TARGET"}
    assert scores["ENSG00000146648"] == 2 and scores["ENSG00000999001"] == 0
