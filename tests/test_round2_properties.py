"""Property tests for round-2 components: hash_join vs pyarrow join,
fuzz-ratio invariants, Turtle parser round-trip, connected-components
invariants."""

import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# --- fuzz ratios -----------------------------------------------------------

words = st.text(alphabet="ABCDEFG 123", min_size=0, max_size=20)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_ratio_symmetric_and_bounded(a, b):
    from kazu_ray.functions.similarity_scorers import ratio

    r = ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == ratio(b, a)
    if a == b:
        assert r == 100.0


@given(words, words)
@settings(max_examples=100, deadline=None)
def test_token_sort_invariant_to_order(a, b):
    from kazu_ray.functions.similarity_scorers import token_sort_ratio

    a_rev = " ".join(reversed(a.split()))
    assert token_sort_ratio(a, b) == token_sort_ratio(a_rev, b)


@given(words, words)
@settings(max_examples=100, deadline=None)
def test_wratio_bounds(a, b):
    from kazu_ray.functions.similarity_scorers import wratio

    assert 0.0 <= wratio(a, b) <= 100.0


# --- boolean scorers -------------------------------------------------------


@given(words)
@settings(max_examples=100, deadline=None)
def test_number_match_reflexive(s):
    from kazu_ray.functions.similarity_scorers import (
        entity_subtype_scorer,
        number_match_scorer,
    )

    assert number_match_scorer(s, s)
    assert entity_subtype_scorer(s, s)


# --- simhash ---------------------------------------------------------------


@given(st.lists(st.text(alphabet="abcdef 123", max_size=30), max_size=8))
@settings(max_examples=50, deadline=None)
def test_simhash_batch_always_matches_scalar(texts):
    from kazu_ray.extras.dedup import simhash64, simhash64_batch

    batch = simhash64_batch(texts)
    assert [int(v) for v in batch] == [simhash64(t) for t in texts]


# --- minhash ---------------------------------------------------------------


@given(
    st.lists(
        st.text(alphabet="abC 12é-İ", max_size=40), min_size=1, max_size=8
    )
)
@settings(max_examples=50, deadline=None)
def test_minhash_batch_always_matches_scalar(texts):
    """The vectorized polars/reduceat signature path must equal the
    scalar spec doc-by-doc, including unicode lowering, <3-word docs,
    and empty strings."""
    import numpy as np

    from kazu_ray.extras.dedup import minhash_signature, minhash_signatures_batch

    batch = minhash_signatures_batch(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(batch[i], minhash_signature(t)), t


# --- turtle parser ---------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(0, 20),
            st.sampled_from(["label", "syn", "alt"]),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F
                ),
                min_size=1,
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
@settings(max_examples=50, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_turtle_roundtrip(tmp_path_factory, triples):
    """Serialize arbitrary (subject-id, predicate, literal) triples to
    Turtle, parse with the subset reader, and recover them exactly."""
    from kazu_ray.ontology.parsers import parse_turtle

    lines = ["@prefix ex: <http://example.org/> .", "@prefix p: <http://pred.org/> ."]
    expected = set()
    for sid, pred, lit in triples:
        lines.append(f'ex:n{sid} p:{pred} "{lit}" .')
        expected.add((f"http://example.org/n{sid}", f"http://pred.org/{pred}", lit))
    path = tmp_path_factory.mktemp("ttl") / "t.ttl"
    path.write_text("\n".join(lines), encoding="utf-8")
    store = parse_turtle(str(path))
    assert store.triples == expected


# --- hash_join vs pyarrow reference ---------------------------------------


@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=25),
    st.lists(st.tuples(st.integers(0, 8), st.integers(0, 100)), max_size=25),
    st.sampled_from(["inner", "left_outer", "left_semi", "left_anti"]),
)
@settings(max_examples=25, deadline=None)
def test_hash_join_matches_pyarrow(ray_session, left_rows, right_rows, how):
    import ray.data as rd

    from kazu_ray.joins import _ARROW_JOIN_TYPE, hash_join

    lt = pa.table(
        {"k": pa.array([r[0] for r in left_rows], pa.int64()),
         "lv": pa.array([r[1] for r in left_rows], pa.int64())}
    )
    rt = pa.table(
        {"rk": pa.array([r[0] for r in right_rows], pa.int64()),
         "rv": pa.array([r[1] for r in right_rows], pa.int64())}
    )
    expected = lt.join(
        rt, keys=["k"], right_keys=["rk"], join_type=_ARROW_JOIN_TYPE[how]
    )
    got = hash_join(
        rd.from_arrow(lt),
        rd.from_arrow(rt),
        left_on="k",
        right_on="rk",
        how=how,
        num_partitions=3,
        left_schema=lt.schema,
        right_schema=rt.schema,
    ).take_all()

    def norm(rows):
        return sorted(tuple(sorted(r.items())) for r in rows)

    assert norm(got) == norm(expected.to_pylist())


# --- kazu json round trip --------------------------------------------------

_conf = st.sampled_from([100, 50, 10])
_name = st.text(alphabet="abcXYZ :-_0123456789", min_size=0, max_size=15)


@given(
    st.lists(  # spans: (kind, text, media_ref)
        st.one_of(
            st.tuples(st.sampled_from(["text", "title"]), _name, st.just("")),
            st.tuples(st.sampled_from(["image", "video"]), st.just(""), st.just("media://x/1")),
        ),
        min_size=1,
        max_size=4,
    ),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_kazu_json_dict_roundtrip(spans, data):
    """row -> KAZU doc dict -> row preserves the span sequence and every
    entity/mapping field the schema carries."""
    from kazu_ray.sources.kazu_json import kazu_doc_dict_to_row, row_to_kazu_doc_dict

    text_span_idxs = [i for i, s in enumerate(spans) if not s[2]]
    entities = []
    if text_span_idxs:
        n_ents = data.draw(st.integers(0, 3))
        for _ in range(n_ents):
            si = data.draw(st.sampled_from(text_span_idxs))
            match = data.draw(_name.filter(bool))
            entities.append(
                {
                    "span_idx": si, "start": 0, "end": len(match), "match": match,
                    "match_norm": match.upper(), "entity_class": "disease",
                    "namespace": "t", "mention_confidence": data.draw(_conf),
                    "candidates": [],
                    "mappings": [
                        {
                            "parser_name": "P", "source": "S", "idx": "X:1",
                            "default_label": "L",
                            "string_match_strategy": "ExactMatchMappingStrategy",
                            "string_match_confidence": "HIGHLY_LIKELY",
                            "disambiguation_strategy": "", "disambiguation_confidence": "",
                            "xref_source_parser_name": "",
                        }
                    ],
                }
            )
    row = {
        "doc_id": "doc-1",
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
        "entities": entities,
    }
    back = kazu_doc_dict_to_row(row_to_kazu_doc_dict(row))
    assert [(s["kind"], s["text"], s["media_ref"]) for s in back["spans"]] == [
        (s["kind"], s["text"], s["media_ref"]) for s in row["spans"]
    ]
    orig_ents = sorted(
        (e["span_idx"], e["start"], e["end"], e["match"], e["mention_confidence"],
         tuple(m["idx"] for m in e["mappings"]))
        for e in entities
    )
    back_ents = sorted(
        (e["span_idx"], e["start"], e["end"], e["match"], e["mention_confidence"],
         tuple(m["idx"] for m in e["mappings"]))
        for e in back["entities"]
    )
    assert back_ents == orig_ents
