"""Cross-reference fan-out (reference xref_manager.py:41-106 semantics,
opt-in via the compiled xref table)."""


def test_xref_fan_out(compiled_dicts):
    from kazu_ray.stages.dict_ner import DictionaryNer
    from kazu_ray.stages.doc_post import DocPostProcessor

    ner = DictionaryNer(compiled_dicts.curations_path, compiled_dicts.synonyms_path)
    post = DocPostProcessor(
        compiled_dicts.synonyms_path,
        compiled_dicts.metadata_path,
        xrefs_path=compiled_dicts.xrefs_path,
    )
    spans = [{"kind": "text", "text": "EGFR is overexpressed.", "media_ref": "", "offset": 0}]
    ents = ner.match_span_text(spans[0]["text"], 0)
    out = post.process_doc(spans, ents)
    egfr = next(e for e in out if e["match"] == "EGFR")
    ids = {(m["source"], m["idx"]) for m in egfr["mappings"]}
    assert ("ENSEMBL", "ENSG00000146648") in ids
    assert ("HGNC", "HGNC:3236") in ids
    xref = next(m for m in egfr["mappings"] if m["idx"] == "HGNC:3236")
    assert xref["xref_source_parser_name"] == "OT_TARGET"


def test_xrefs_off_by_default(compiled_dicts):
    from kazu_ray.stages.dict_ner import DictionaryNer
    from kazu_ray.stages.doc_post import DocPostProcessor

    ner = DictionaryNer(compiled_dicts.curations_path, compiled_dicts.synonyms_path)
    post = DocPostProcessor(compiled_dicts.synonyms_path, compiled_dicts.metadata_path)
    spans = [{"kind": "text", "text": "EGFR is overexpressed.", "media_ref": "", "offset": 0}]
    out = post.process_doc(spans, ner.match_span_text(spans[0]["text"], 0))
    egfr = next(e for e in out if e["match"] == "EGFR")
    assert all(not m["idx"].startswith("HGNC") for m in egfr["mappings"])
