"""Teacher→student distillation: soft-label stage shape, distributed vs
reference training bit-exactness, student checkpoint deployability, and
the full golden-pipeline quality gate (via approx_metrics in
test_metrics — here the fast-path invariants)."""

import numpy as np
import pyarrow as pa
import pytest


def _refs():
    import ray

    from kazu_ray.assets import TINY_BERT_NER
    from kazu_ray.stages.distill import sentences_dataset, soft_label_dataset

    mat = soft_label_dataset(sentences_dataset(), TINY_BERT_NER).materialize()
    return mat, mat.to_arrow_refs()


def test_soft_label_dataset_shape(ray_session):
    import ray

    from kazu_ray.stages.distill import LOGITS_SCHEMA, S_HIDDEN, distill_corpus

    mat, refs = _refs()
    tbl = pa.concat_tables([ray.get(r) for r in refs])
    assert tbl.schema.equals(LOGITS_SCHEMA)
    # one row per whitespace word of the corpus
    n_words = sum(len(s.split()) for s in distill_corpus())
    assert tbl.num_rows == n_words
    feat0 = tbl.column("s_feat")[0].as_py()
    assert len(feat0) == S_HIDDEN
    from kazu_ray.stages.transformer_ner import LABELS

    assert len(tbl.column("t_logits")[0].as_py()) == len(LABELS)


def test_fit_paths_bit_exact_and_worker_count_invariant(ray_session):
    from kazu_ray.stages.distill import fit_head_distributed, fit_head_reference
    from kazu_ray.stages.transformer_ner import LABELS

    mat, refs = _refs()
    k = len(LABELS)
    # short fit: enough steps for Adam state to matter, fast in CI
    W, b, losses = fit_head_distributed(refs, n_labels=k, steps=40)
    W_ref, b_ref, losses_ref = fit_head_reference(refs, n_labels=k, steps=40)
    assert np.abs(W - W_ref).max() == 0.0
    assert np.abs(b - b_ref).max() == 0.0
    assert losses == losses_ref
    assert losses[-1] < losses[0]
    # a different worker count is a different float-sum order: allowed
    # to differ only in rounding, never in substance
    W3, b3, _ = fit_head_distributed(refs, n_labels=k, steps=40, n_workers=3)
    W3_ref, b3_ref, _ = fit_head_reference(refs, n_labels=k, steps=40, n_workers=3)
    assert np.abs(W3 - W3_ref).max() == 0.0
    assert np.abs(W3 - W).max() < 1e-6


def test_logits_parquet_roundtrip(ray_session, tmp_path):
    import ray
    import ray.data as rd

    from kazu_ray.stages.distill import LOGITS_SCHEMA, write_logits_parquet

    mat, refs = _refs()
    out = str(tmp_path / "logits")
    write_logits_parquet(mat, out)
    back = rd.read_parquet(out)
    assert back.count() == mat.count()
    tbl = pa.concat_tables([ray.get(r) for r in back.materialize().to_arrow_refs()])
    assert sorted(tbl.column_names) == sorted(LOGITS_SCHEMA.names)


def test_student_checkpoint_loads_through_production_tagger(ray_session, tmp_path):
    """The exported student must run through the SAME loader/tagger
    path as the teacher (no student-specific code downstream)."""
    from kazu_ray.assets import TINY_BERT_NER
    from kazu_ray.stages.distill import (
        S_HIDDEN,
        export_student_checkpoint,
        fit_head_distributed,
    )
    from kazu_ray.stages.transformer_ner import LABELS
    from kazu_ray.state.numpy_bert import NumpyBertTagger

    mat, refs = _refs()
    k = len(LABELS)
    W, b, _ = fit_head_distributed(refs, n_labels=k, steps=40)
    out = export_student_checkpoint(str(tmp_path / "student"), TINY_BERT_NER, W, b)
    tagger = NumpyBertTagger(out, n_labels=k)
    logits = tagger.logits(["He", "took", "aspirin", "daily", "."])
    assert logits.shape == (5, k)
    # the head really is the trained one (float32-rounded)
    assert np.allclose(tagger.head_w, W, atol=1e-6)


def test_student_smaller_than_teacher(ray_session):
    import json
    import os

    from kazu_ray.assets import TINY_BERT_NER
    from kazu_ray.stages.distill import S_HEADS, S_HIDDEN, S_INTER, S_LAYERS

    with open(os.path.join(TINY_BERT_NER, "config.json")) as f:
        t = json.load(f)
    assert S_HIDDEN < t["hidden_size"]
    assert S_LAYERS < t["num_hidden_layers"]
    assert S_HEADS < t["num_attention_heads"]
    assert S_INTER < t["intermediate_size"]
