from kazu_ray.pipelines.config import STEP_GROUPS, PipelineConfig, build


def test_step_groups():
    assert "ner_only" in STEP_GROUPS and "linking_only" in STEP_GROUPS
    cfg = PipelineConfig.from_group("ner_only", concurrency=1)
    assert "doc_post" not in cfg.steps


def test_build_default(ray_session, compiled_dicts):
    import ray.data as rd
    import pyarrow as pa

    from kazu_ray.schemas import DOCS_SCHEMA

    docs = rd.from_arrow(
        pa.Table.from_pylist(
            [{"doc_id": "c0", "spans": [
                {"kind": "text", "text": "melanoma treated with aspirin",
                 "media_ref": "", "offset": 0}]}],
            schema=DOCS_SCHEMA,
        )
    )
    out = build(docs, compiled_dicts, PipelineConfig(concurrency=1))
    rows = out.take_all()
    matches = {e["match"] for e in rows[0]["entities"]}
    assert {"melanoma", "aspirin"} <= matches


def test_build_ner_only(ray_session, compiled_dicts):
    import ray.data as rd
    import pyarrow as pa

    from kazu_ray.schemas import DOCS_SCHEMA

    docs = rd.from_arrow(
        pa.Table.from_pylist(
            [{"doc_id": "c1", "spans": [
                {"kind": "text", "text": "melanoma present",
                 "media_ref": "", "offset": 0}]}],
            schema=DOCS_SCHEMA,
        )
    )
    cfg = PipelineConfig.from_group("ner_only", concurrency=1)
    rows = build(docs, compiled_dicts, cfg).take_all()
    ents = rows[0]["entities"]
    # no mapping cascade ran: candidates attached, mappings empty
    assert ents and all(e["mappings"] == [] for e in ents)
