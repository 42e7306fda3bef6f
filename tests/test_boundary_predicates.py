"""Property test: the O(1) boundary predicates agree with the tokenizer
for every position that could start/end a dictionary match (non-space,
non-punct first/last chars — dictionary surfaces never start or end with
whitespace)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kazu_ray.functions.tokens import (
    boundary_sets,
    is_token_end,
    is_token_start,
    tokenize,
)

ALPHABET = "abcXY 09-‐(),.;:'\"/"
texts = st.text(alphabet=ALPHABET, min_size=0, max_size=40)


@settings(max_examples=500, deadline=None)
@given(texts)
def test_predicates_match_tokenizer(text):
    starts, ends = boundary_sets(text)
    for s in range(len(text) + 1):
        # only positions that can begin a match (non-space char there)
        if s < len(text) and not text[s].isspace():
            assert is_token_start(text, s) == (s in starts), (text, s)
    for e in range(len(text) + 1):
        if e > 0 and not text[e - 1].isspace():
            assert is_token_end(text, e) == (e in ends), (text, e)


def test_known_cases():
    t = "EGFR-positive (IL-6) 1,000 Alzheimer's end."
    starts, ends = boundary_sets(t)
    for s in starts:
        assert is_token_start(t, s)
    for e in ends:
        assert is_token_end(t, e)
    assert not is_token_end(t, 4)  # EGFR| inside EGFR-positive
