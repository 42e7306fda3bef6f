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


def test_transformer_num_gpus_threads_to_map_batches(ray_session, compiled_dicts, monkeypatch):
    """The GPU seam: transformer_num_gpus > 0 must reach the transformer
    step's map_batches as num_gpus (and ONLY that step); 0.0 must omit
    the kwarg so a CPU-only cluster never blocks on GPU reservations."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data import Dataset

    from kazu_ray.schemas import DOCS_SCHEMA

    captured = []
    orig = Dataset.map_batches

    def spy(self, fn, *args, **kwargs):
        name = getattr(fn, "__name__", type(fn).__name__)
        captured.append((name, kwargs.get("num_gpus")))
        return orig(self, fn, *args, **kwargs)

    monkeypatch.setattr(Dataset, "map_batches", spy)
    docs = rd.from_arrow(
        pa.Table.from_pylist(
            [{"doc_id": "d1", "spans": [{"kind": "text", "text": "melanoma seen .", "media_ref": "", "offset": 0}]}],
            schema=DOCS_SCHEMA,
        )
    )
    # num_gpus=0.25 still schedules on this CPU-only box?  No — any
    # positive reservation would block.  Assert the kwarg WIRING only:
    # the lazy plan records kwargs at map_batches call time, so we can
    # inspect without executing.
    cfg = PipelineConfig.from_group(
        "ner_only", transformer_tagger="mock", transformer_num_gpus=0.5
    )
    build(docs, compiled_dicts, cfg)  # lazy: no execution happens here
    tr = [g for name, g in captured if name == "TransformerNer"]
    assert tr == [0.5]
    others = {name: g for name, g in captured if name != "TransformerNer"}
    assert all(g is None for g in others.values())

    captured.clear()
    cfg0 = PipelineConfig.from_group("ner_only", transformer_tagger="mock")
    out = build(docs, compiled_dicts, cfg0)
    tr0 = [g for name, g in captured if name == "TransformerNer"]
    assert tr0 == [None]
    assert out.count() == 1  # and the CPU-only pipeline actually runs
