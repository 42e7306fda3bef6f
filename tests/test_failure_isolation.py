"""Per-row failure isolation: one bad document must never kill a batch
(mirror of the reference's document_iterating_step semantics,
step.py:60-151)."""

import pyarrow as pa

from kazu_ray.pipelines.kg import AnnotateEmitTriples
from kazu_ray.schemas import DOCS_SCHEMA


def _doc(doc_id, text):
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


def test_one_poison_doc_is_skipped(compiled_dicts, monkeypatch):
    actor = AnnotateEmitTriples(
        compiled_dicts.curations_path,
        compiled_dicts.synonyms_path,
        compiled_dicts.metadata_path,
    )
    real = actor.post.process_doc

    def poisoned(spans, ents, **kw):
        # the fused actor passes bare span texts
        texts = [sp["text"] if isinstance(sp, dict) else sp for sp in spans]
        if any("POISON" in t for t in texts):
            raise RuntimeError("boom")
        return real(spans, ents, **kw)

    monkeypatch.setattr(actor.post, "process_doc", poisoned)
    batch = pa.Table.from_pylist(
        [_doc("doc-poison", "POISON melanoma"), _doc("doc-good", "melanoma was resected")],
        schema=DOCS_SCHEMA,
    )
    out = actor(batch)
    assert actor.failed_docs == 1
    # actor output is partial edge rows; mentions edges carry doc_id as subj
    mention_subjects = {
        s for s, p in zip(out.column("subj").to_pylist(), out.column("pred").to_pylist())
        if p == "mentions"
    }
    assert mention_subjects == {"doc-good"}
    assert any(o == "MONDO_0005105" for o in out.column("obj").to_pylist())
