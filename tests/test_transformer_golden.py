"""End-to-end gate for the REAL-checkpoint transformer path.

Round-2 verdict item #1: the numpy-BERT tagger + TfIdfLinker were only
unit-tested; the benched/golden pipelines ran dictionary-NER only.  This
pins the full-group pipeline (dict NER -> real tiny-BERT transformer NER
-> trigram linking -> mapping cascade) against FROZEN static fixtures
(kazu_ray/sources/_golden/transformer_*.csv).  Eight golden rows carry
surface forms unknown to the automaton and the mock gazetteer, so
recall 1.0 requires the trained checkpoint's forward pass end-to-end.
"""

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_checkpoint_is_checked_in():
    import os

    from kazu_ray.assets import TINY_BERT_NER

    for fname in ("config.json", "vocab.txt", "pytorch_model.bin"):
        assert os.path.isfile(os.path.join(TINY_BERT_NER, fname)), fname


def test_transformer_golden_precision_recall(compiled_dicts):
    from kazu_ray.sources.transformer_golden import evaluate_transformer_golden

    df = evaluate_transformer_golden(compiled_dicts)
    row = df.iloc[0]
    # the fixture must keep forcing the transformer path, or the gate
    # silently degrades to re-testing dictionary NER
    assert row.n_transformer_required >= 8
    assert row.n_golden >= 14
    assert row.precision == 1.0, df
    assert row.recall == 1.0, df


def test_golden_surfaces_unknown_to_dict_ner(compiled_dicts):
    """The transformer-required surface forms must NOT be resolvable by
    the dictionary automaton alone — run the pipeline with the
    transformer step removed and assert those rows disappear."""
    from kazu_ray.pipelines.config import PipelineConfig, build
    from kazu_ray.sources.transformer_golden import (
        transformer_golden_docs,
        transformer_golden_table,
    )

    from kazu_ray.pipelines.config import STEP_GROUPS

    cfg = PipelineConfig(
        steps=tuple(s for s in STEP_GROUPS["full"] if s != "transformer_ner"),
        concurrency=1,
    )
    got = set()
    for r in build(transformer_golden_docs(), compiled_dicts, cfg).take_all():
        for e in r["entities"]:
            got.add((r["doc_id"], e["match"]))
    g = transformer_golden_table()
    required = {
        (d, m)
        for d, m, ns in zip(
            g.column("doc_id").to_pylist(),
            g.column("match").to_pylist(),
            g.column("namespace").to_pylist(),
        )
        if ns == "TransformerNER"
    }
    assert required, "fixture lost its transformer-only rows"
    assert not (got & required), got & required
