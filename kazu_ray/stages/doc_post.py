"""Document-local post-processing: one fused actor-pool ``map_batches``
stage that applies, per document row, in order:

1. Schwartz–Hearst abbreviation expansion (reference
   kazu/utils/abbreviation_detector.py:88-448, algorithm from
   Schwartz & Hearst 2003 / scispaCy's public implementation);
2. the mapping/disambiguation cascade (reference MappingStep +
   StrategyRunner, steps/linking/post_processing/strategy_runner.py:162-342
   and disambiguation/strategies.py — see SURVEY.md §2k);
3. cleanup (drop AMBIGUOUS mappings, drop low-confidence unmapped
   entities, strip URI ids — steps/other/cleanup.py:24-191);
4. overlapping-entity merge (steps/other/merge_overlapping_ents.py:54-140).

All four need whole-document state and nothing else, so fusing them into
one row-local stage reproduces the reference's sequential semantics
exactly while staying embarrassingly parallel across documents — the
Ray-idiomatic boundary (SURVEY.md §3).

The cascade mirrors the reference's confidence-ordered sequential
semantics (strategy_runner.py:254-342): entities are processed in
descending ``mention_confidence`` groups, and within each group the
unambiguous ladder pass runs before disambiguation of that group's
deferred entities (entity-key order).  Every non-AMBIGUOUS resolution —
including disambiguation results — immediately joins the document's
mapped-id state, so ``DefinedElsewhereInDocument`` in a later (lower
confidence) group observes mappings created by earlier groups, and a
higher-confidence group never observes a lower-confidence mapping (the
reference attaches mappings to the Document as each strategy yields,
and processes high-confidence groups first).  Remaining deviation,
documented: within one confidence group the reference interleaves by
(strategy index, entity key) while we run the full ladder per entity
(pass 1) before any in-group disambiguation (pass 2) — in-group
DefinedElsewhere therefore sees every in-group unambiguous resolution
regardless of key order, a superset visible only when an unambiguous
entity resolves at a LATER ladder index than a peer's disambiguation
AND sorts after it; no acceptance fixture distinguishes the two.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

import pyarrow as pa

from ..constants import (
    HIGHLY_LIKELY,
    LINK_AMBIGUOUS,
    LINK_CERTAIN,
    LINK_PROBABLE,
    NS_ABBREV,
    PROBABLE,
)
from ..functions.normalize import normalize
from ..functions.tokens import Token, tokenize
from ..schemas import ENTITIES_COLUMN
from ..state.embedder import HashedNgramEmbedder, default_embedder
from ..state.side_tables import SynRecord, load_metadata, load_synonyms

# merge preference, reference conf/MergeOverlappingEntsStep/default.yaml
# (reference classes cell_type / biological_process etc. map to our
# synthetic parser classes)
ENT_CLASS_PREFERRED_ORDER = [
    "disease", "drug", "gene", "anatomy", "cell", "go_bp", "go_mf", "go_cc",
]

CONTEXT_SIM_THRESHOLD = 0.70  # reference TfIdfDisambiguationStrategy threshold


def _span_texts(spans: list) -> list[str]:
    """Accept either span structs (dicts) or bare text strings."""
    if spans and isinstance(spans[0], dict):
        return [sp["text"] for sp in spans]
    return spans


# ---------------------------------------------------------------------------
# Schwartz–Hearst abbreviation detection
# ---------------------------------------------------------------------------


def backmatch_abbreviation(long_toks: list[Token], short_text: str) -> int | None:
    """Schwartz–Hearst character back-matching: return the index into
    ``long_toks`` where the long form starts, or None if no match.

    Each short-form character must appear in order (scanning backwards)
    in the long form; the first character must begin a word.
    """
    long_form = " ".join(t.text for t in long_toks)
    li = len(long_form) - 1
    si = len(short_text) - 1
    while si >= 0:
        c = short_text[si].lower()
        if not c.isalnum():
            si -= 1
            continue
        while (li >= 0 and long_form[li].lower() != c) or (
            si == 0 and li > 0 and long_form[li - 1].isalnum()
        ):
            li -= 1
        if li < 0:
            return None
        li -= 1
        si -= 1
    li += 1
    consumed = 0
    for i, tok in enumerate(long_toks):
        consumed += len(tok.text) + 1  # joined with single spaces
        if consumed > li:
            return i
    return None


def _short_form_ok(toks: list[Token]) -> bool:
    if not toks or not all(2 <= len(t.text) < 10 for t in toks):
        return False
    text = " ".join(t.text for t in toks)
    if sum(c.isalpha() for c in text) / len(text) < 0.5:
        return False
    return text[0].isalpha()


def find_abbreviation_definitions(
    toks: list[Token], text: str
) -> list[tuple[tuple[int, int], tuple[int, int], str]]:
    """Find (long_span, short_span, short_text) definition triples in one
    span's token stream (reference filter_matches semantics,
    abbreviation_detector.py:154-195)."""
    out = []
    open_idxs = [i for i, t in enumerate(toks) if t.text == "("]
    for oi in open_idxs:
        try:
            ci = next(j for j in range(oi + 1, len(toks)) if toks[j].text == ")")
        except StopIteration:
            continue
        content = toks[oi + 1 : ci]
        if not content or len(content) > 8 or oi == 0:
            continue
        if len(content) > 3:
            # long form inside the parens; short form is the word before
            if oi - 1 < 0:
                continue
            short_toks = [toks[oi - 1]]
            long_toks = content
        else:
            short_toks = content
            abbrev_len = sum(len(t.text) for t in content)
            max_words = min(abbrev_len + 5, abbrev_len * 2)
            long_toks = toks[max(oi - max_words, 0) : oi]
        if not long_toks or not _short_form_ok(short_toks):
            continue
        start_tok = backmatch_abbreviation(long_toks, " ".join(t.text for t in short_toks))
        if start_tok is None:
            continue
        long_span = (long_toks[start_tok].start, long_toks[-1].end)
        short_span = (short_toks[0].start, short_toks[-1].end)
        out.append((long_span, short_span, text[short_span[0] : short_span[1]]))
    return out


def expand_abbreviations(
    spans: list, entities: list[dict], span_toks: dict[int, list[Token]] | None = None
) -> list[dict]:
    """Document-wide abbreviation override (reference
    KazuAbbreviationDetector.__call__:263-286): for each detected
    definition whose long form is an entity, every occurrence of the
    short form anywhere in the document replaces its local entities with
    copies of the long-form entities."""
    texts = _span_texts(spans)
    # fast path: no parenthesis anywhere -> no definitions possible
    if not any("(" in t for t in texts):
        return entities
    # a definition lives inside a single span's text, so pass 1 only
    # needs tokens for spans that contain a "("; the rest of the doc is
    # tokenized lazily, only when a definition is actually found
    if span_toks is None:
        def_toks = {i: tokenize(t) for i, t in enumerate(texts) if t and "(" in t}
    else:
        def_toks = span_toks

    # index entities by (span_idx, start, end)
    ents_at: dict[tuple[int, int, int], list[dict]] = {}
    for e in entities:
        ents_at.setdefault((e["span_idx"], e["start"], e["end"]), []).append(e)

    # pass 1: collect unique definitions and their source entities
    short_to_sources: dict[str, list[dict]] = {}
    seen_long: set[str] = set()
    for si, toks in def_toks.items():
        for long_span, _short_span, short_text in find_abbreviation_definitions(
            toks, texts[si]
        ):
            long_text = texts[si][long_span[0] : long_span[1]]
            if long_text in seen_long or short_text in short_to_sources:
                continue
            seen_long.add(long_text)
            sources = ents_at.get((si, long_span[0], long_span[1]), [])
            short_to_sources[short_text] = sources
    if not short_to_sources:
        return entities
    if span_toks is None:  # pass 2 scans the whole doc: tokenize the rest
        span_toks = {
            i: def_toks.get(i) or tokenize(t) for i, t in enumerate(texts) if t
        }

    # pass 2: match every short-form occurrence document-wide, override
    removed: set[int] = set()
    added: list[dict] = []
    for si, toks in span_toks.items():
        for short_text, sources in short_to_sources.items():
            stoks = short_text.split(" ")
            n = len(stoks)
            for i in range(len(toks) - n + 1):
                if [t.text for t in toks[i : i + n]] != stoks:
                    continue
                start, end = toks[i].start, toks[i + n - 1].end
                for e in entities:
                    if (e["span_idx"], e["start"], e["end"]) == (si, start, end):
                        removed.add(id(e))
                for src in sources:
                    added.append(
                        {
                            **src,
                            "span_idx": si,
                            "start": start,
                            "end": end,
                            "match": short_text,
                            "match_norm": normalize(short_text, src["entity_class"]),
                            "namespace": NS_ABBREV,
                            "mention_confidence": HIGHLY_LIKELY,
                        }
                    )
    kept = [e for e in entities if id(e) not in removed]
    return kept + added


# ---------------------------------------------------------------------------
# mapping / disambiguation cascade
# ---------------------------------------------------------------------------


@dataclass
class _Resolution:
    id_set: frozenset[tuple[str, str]]
    strategy: str  # disambiguation strategy name
    confidence: str  # disambiguation confidence
    match_strategy: str = "ExactMatchMappingStrategy"
    match_confidence: str = LINK_CERTAIN


class MappingCascade:
    """Per-document candidate -> Mapping resolution (SURVEY.md §2k)."""

    def __init__(
        self,
        synonyms,
        metadata,
        embedder: HashedNgramEmbedder,
        id_contexts: dict | None = None,
        use_nearest_embedding_fallback: bool = False,
        string_embedder=None,
    ):
        self.synonyms = synonyms
        self.metadata = metadata
        # ``embedder`` is the CONTEXT vectorizer (TF-IDF stand-in for the
        # reference's TfIdf/GildaTfIdf disambiguation strategies);
        # ``string_embedder`` is the SapBERT-role string scorer (real
        # trained tiny checkpoint) used by PreferNearestEmbedding
        self.embedder = embedder
        self.string_embedder = string_embedder or embedder
        # PreferNearestEmbeddingToDefaultLabel is opt-in, mirroring the
        # reference where it is an available-but-not-default strategy
        # (conf/DisambiguationStrategies/default.yaml has no entry for it)
        self.use_nearest_embedding_fallback = use_nearest_embedding_fallback
        # (parser, idx) -> context text, from compile's contexts.parquet
        # (Gilda-style per-ID disambiguation, reference strategies.py:272-358)
        self.id_contexts = id_contexts or {}
        self._ctx_vec_cache: dict = {}
        # pass-1 memo: the string-match ladder + id-set resolution for an
        # entity is a pure function of (match_norm, candidate list), both
        # of which repeat across millions of occurrences of the same
        # surface (dictionary NER shares one candidate-template list per
        # surface).  Keyed on id(candidates) with an identity check — the
        # stored strong reference keeps the id from being recycled.
        # Mapping dicts in the memo are shared across entities; every
        # downstream consumer copies before modifying (cleanup_entities,
        # _fan_out_xrefs) or only reads.
        self._pass1_cache: dict = {}

    def _id_context_vec(self, key):
        v = self._ctx_vec_cache.get(key)
        if v is None:
            text = self.id_contexts.get(key)
            if text is None:
                return None
            v = self.embedder.encode(text)
            self._ctx_vec_cache[key] = v
        return v

    # Gilda-style per-ID context disambiguation (reference
    # GildaTfIdfDisambiguationStrategy, disambiguation/strategies.py:272-358):
    # rank every candidate id by cosine(doc context, id context); accept the
    # best id's set only if the first DIFFERENT set scores at least
    # ``delta`` lower.  Ids without a context score 0.0 (reference caution
    # note) — they sink to the bottom of the ranking.
    def _gilda_disambiguate(self, parser, sets, ctx_vec, delta: float = 0.01):
        idx_to_sets: dict[str, list[frozenset]] = {}
        for s in sets:
            for i, _src in s:
                idx_to_sets.setdefault(i, []).append(s)
        scored = []
        for i in idx_to_sets:
            v = self._id_context_vec((parser, i))
            scored.append((float(ctx_vec @ v) if v is not None else 0.0, i))
        scored.sort(key=lambda x: (-x[0], x[1]))
        best_score, best_idx = scored[0]
        best_sets = idx_to_sets[best_idx]
        if len(best_sets) != 1:
            return None
        best_set = best_sets[0]
        for score, i in scored[1:]:
            if best_set in idx_to_sets[i] and len(idx_to_sets[i]) == 1:
                continue  # lower-scoring id of the same set
            return best_set if (best_score - score) >= delta else None
        return None

    # PreferNearestEmbeddingToDefaultLabel (reference strategies.py:449-507):
    # score the entity match against each id's default label with the
    # complex string scorer (the embedder, standing in for SapBERT) and
    # return a NEW id set of the top-scoring ids (ties kept together).
    def _prefer_nearest_embedding(self, parser, sets, ent_match: str):
        scored: list[tuple[float, tuple[str, str]]] = []
        for s in sets:
            for item in s:
                idx, _src = item
                label = self.metadata.get((parser, idx), {}).get("default_label", "")
                scored.append((self.string_embedder.similarity(ent_match, label), item))
        if not scored:
            return None
        top = max(sc for sc, _ in scored)
        return frozenset(item for sc, item in scored if sc == top)

    def _make_mappings(self, parser: str, res: _Resolution) -> list[dict]:
        out = []
        for idx, source in sorted(res.id_set):
            meta = self.metadata.get((parser, idx), {})
            out.append(
                {
                    "parser_name": parser,
                    "source": source,
                    "idx": idx,
                    "default_label": meta.get("default_label", ""),
                    "string_match_strategy": res.match_strategy,
                    "string_match_confidence": res.match_confidence,
                    "disambiguation_strategy": res.strategy,
                    "disambiguation_confidence": res.confidence,
                    "xref_source_parser_name": "",
                }
            )
        return out

    # -- string-match strategy ladder (mapping_strategies/strategies.py) ----

    @staticmethod
    def _symbols_match(a: str, b: str) -> bool:
        """Token-multiset containment: every whitespace token of the more
        tokenized side appears in (and uses up) the other, e.g. "MAP K 8"
        vs "MAPK8" (reference SymbolMatchMappingStrategy:295-332)."""
        ta, tb = a.split(" "), b.split(" ")
        longest, shortest = (ta, b) if len(ta) > len(tb) else (tb, a)
        for tok in longest:
            if tok not in shortest:
                return False
            shortest = shortest.replace(tok, "", 1)
        return shortest.strip() == ""

    def _select_terms(
        self, entity: dict, parser: str, cands: list[dict]
    ) -> tuple[list[dict], str, str] | None:
        """Ordered filter strategies, stop on first success; returns
        (selected candidates, strategy name, match confidence)."""
        match_norm = entity["match_norm"]
        # 1. ExactMatch (strategies.py:281-292)
        exact = [c for c in cands if c["exact_match"]]
        if exact:
            return exact, "ExactMatchMappingStrategy", LINK_CERTAIN
        # 2. SymbolMatch (:295-332)
        sym = [c for c in cands if self._symbols_match(match_norm, c["term_norm"])]
        if sym:
            return sym, "SymbolMatchMappingStrategy", LINK_PROBABLE
        # 3. TermNormIsSubString: unique longest term_norm that is one of
        #    the match_norm tokens, min length 3 (:335-390)
        norm_tokens = set(match_norm.split(" "))
        subs = sorted(
            (c for c in cands if c["term_norm"] in norm_tokens and len(c["term_norm"]) >= 3),
            key=lambda c: -len(c["term_norm"]),
        )
        for _len, group in itertools.groupby(subs, key=lambda c: len(c["term_norm"])):
            g = list(group)
            if len(g) == 1:
                return g, "TermNormIsSubStringMappingStrategy", LINK_PROBABLE
        # 4. StrongMatch with embedding confirmation (:393-528): top score
        #    minus differential window (candidates already passed the
        #    search threshold + embedding confirmation in the linker)
        scored = [c for c in cands if c["search_score"] > 0]
        if scored:
            best = max(c["search_score"] for c in scored)
            strong = [c for c in scored if best - c["search_score"] <= 2.0]
            if strong:
                return (
                    strong,
                    "StrongMatchWithEmbeddingConfirmationStringMatchingStrategy",
                    LINK_PROBABLE,
                )
        return None

    # -- disambiguation ladder (disambiguation/strategies.py) ---------------

    def _disambiguate(
        self,
        parser: str,
        entity_class: str,
        sets: list[frozenset],
        entity: dict,
        doc_mapped_ids: set[str],
        ctx_vec,
    ):
        # 1. DefinedElsewhereInDocument (disambiguation/strategies.py:100-149)
        hits = [s for s in sets if any(i in doc_mapped_ids for i, _src in s)]
        if len(hits) == 1:
            return hits[0], "DefinedElsewhereInDocument"
        # 2. context-similarity (stand-in for TfIdfDisambiguationStrategy
        #    :152-269; threshold 0.70, same shape: doc context vs per-set
        #    label vectors)
        if ctx_vec is not None:
            scored = []
            for s in sets:
                labels = [
                    self.metadata.get((parser, i), {}).get("default_label", i)
                    for i, _src in s
                ]
                best = max(float(ctx_vec @ self.embedder.encode(lbl)) for lbl in labels)
                scored.append((best, s))
            scored.sort(key=lambda x: -x[0])
            if scored[0][0] >= CONTEXT_SIM_THRESHOLD:
                return scored[0][1], "ContextSimilarity"
        # 2b. Gilda per-ID context vectors (GildaTfIdfDisambiguationStrategy
        #     :272-358; compile-time contexts from each id's surface forms)
        if ctx_vec is not None and self.id_contexts:
            chosen = self._gilda_disambiguate(parser, sets, ctx_vec)
            if chosen is not None:
                return chosen, "GildaTfIdfContext"
        # 3. annotation-score (AnnotationLevelDisambiguationStrategy :361-397)
        def set_score(s):
            return max(
                int(self.metadata.get((parser, i), {}).get("annotation_score", 0) or 0)
                for i, _src in s
            )

        scores = sorted(((set_score(s), s) for s in sets), key=lambda x: -x[0])
        if len(scores) >= 2 and scores[0][0] > scores[1][0]:
            return scores[0][1], "AnnotationLevel"
        # 4. prefer default-label match (:400-446)
        label_hits = []
        for s in sets:
            for i, _src in s:
                lbl = self.metadata.get((parser, i), {}).get("default_label", "")
                if lbl and normalize(lbl, entity_class) == entity["match_norm"]:
                    label_hits.append(s)
                    break
        if len(label_hits) == 1:
            return label_hits[0], "PreferDefaultLabelMatch"
        # 5. (opt-in) nearest embedding to default label (:449-507) — only
        #    when the match is meaningfully closer to one label (scorer
        #    ties keep multiple ids together, mirroring the reference's
        #    same-label case; a full tie across every id means no signal)
        if self.use_nearest_embedding_fallback:
            near = self._prefer_nearest_embedding(parser, sets, entity["match"])
            if near is not None and len(near) < sum(len(s) for s in sets):
                return near, "PreferNearestEmbeddingToDefaultLabel"
        return None, None

    def run(self, spans: list[dict], entities: list[dict]) -> None:
        """Confidence-ordered cascade (reference strategy_runner.py:254-342).

        High-confidence groups resolve — including disambiguation —
        before lower-confidence groups run, so DefinedElsewhere in a
        lower group observes every mapping the higher groups created and
        never the reverse (the reference attaches mappings immediately
        and iterates confidence groups high to low)."""
        doc_mapped_ids: set[str] = set()

        # doc context vector computed lazily, once per doc, only if any
        # group has ambiguous candidates to disambiguate
        ctx_state: list = [False, None]

        def ctx_vec():
            if not ctx_state[0]:
                ctx_state[0] = True
                doc_context = " ".join(t for t in _span_texts(spans) if t)
                if doc_context:
                    ctx_state[1] = self.embedder.encode(doc_context[:2000])
            return ctx_state[1]

        # descending confidence; entity-key order within a group mirrors
        # the reference's entity_to_entity_key sort (strategy_runner.py:28-37)
        order = sorted(
            range(len(entities)),
            key=lambda i: (
                -entities[i]["mention_confidence"],
                entities[i]["match"],
                entities[i]["match_norm"],
                entities[i]["entity_class"],
            ),
        )
        for _conf, group in itertools.groupby(
            order, key=lambda i: entities[i]["mention_confidence"]
        ):
            deferred: list[tuple[dict, str, list, str, str]] = []

            # pass 1 (this group): run the string-match ladder per
            # (entity, parser); map immediately when a single
            # equivalent-id set remains
            for i in group:
                e = entities[i]
                cands_list = e["candidates"]
                ckey = (id(cands_list), e["match_norm"])
                hit = self._pass1_cache.get(ckey)
                if hit is not None and hit[0] is cands_list:
                    results = hit[1]
                else:
                    by_parser: dict[str, list[dict]] = {}
                    for cand in cands_list:
                        by_parser.setdefault(cand["parser_name"], []).append(cand)
                    results: list[tuple] = []
                    for parser, cands in by_parser.items():
                        selection = self._select_terms(e, parser, cands)
                        if selection is None:
                            continue
                        selected, strategy, match_conf = selection
                        id_sets: list[frozenset] = []
                        for c in selected:
                            rec = self.synonyms.get((parser, c["term_norm"]))
                            if rec is None:
                                continue
                            for s in rec.assoc_sets:
                                if s not in id_sets:
                                    id_sets.append(s)
                        if not id_sets:
                            continue
                        if len(id_sets) == 1:
                            res = _Resolution(
                                id_sets[0], "NotAmbiguous", match_conf, strategy, match_conf
                            )
                            results.append((None, self._make_mappings(parser, res)))
                        else:
                            results.append((parser, id_sets, strategy, match_conf))
                    if len(self._pass1_cache) > 200_000:  # non-template lists
                        self._pass1_cache.clear()
                    self._pass1_cache[ckey] = (cands_list, results)
                mappings: list[dict] = []
                for r in results:
                    if r[0] is None:
                        mappings.extend(r[1])
                    else:
                        deferred.append((e, r[0], r[1], r[2], r[3]))
                if mappings:
                    e["mappings"] = e["mappings"] + mappings
                    doc_mapped_ids.update(m["idx"] for m in mappings)

            # pass 2 (this group): disambiguate deferred entities against
            # the document state; each successful resolution joins the
            # state immediately, visible to later deferred entries and to
            # every lower-confidence group
            for e, parser, id_sets, strategy, match_conf in deferred:
                entity_class = e["entity_class"]
                chosen, disamb = self._disambiguate(
                    parser, entity_class, id_sets, e, doc_mapped_ids, ctx_vec()
                )
                if chosen is None:
                    # all candidate ids kept, flagged AMBIGUOUS -> cleanup
                    # drops; ambiguous ids never join doc_mapped_ids (the
                    # reference attaches no mapping on strategy failure)
                    all_ids = frozenset().union(*id_sets)
                    res = _Resolution(
                        all_ids, "NoStrategySucceeded", LINK_AMBIGUOUS, strategy, match_conf
                    )
                else:
                    res = _Resolution(chosen, disamb, LINK_PROBABLE, strategy, match_conf)
                    doc_mapped_ids.update(idx for idx, _src in chosen)
                e["mappings"] = e["mappings"] + self._make_mappings(parser, res)


# ---------------------------------------------------------------------------
# cleanup + overlap merge
# ---------------------------------------------------------------------------


def _strip_uri(idx: str) -> str:
    if "://" in idx:
        return idx.rstrip("/").rsplit("/", 1)[-1]
    return idx


def cleanup_entities(entities: list[dict]) -> list[dict]:
    """Default cleanup actions (reference conf/CleanupActions/default.yaml):
    drop AMBIGUOUS-disambiguation mappings, then drop unmapped entities
    whose mention confidence is below PROBABLE; strip URI ids."""
    out = []
    for e in entities:
        mappings = [
            {**m, "idx": _strip_uri(m["idx"])}
            for m in e["mappings"]
            if m["disambiguation_confidence"] != LINK_AMBIGUOUS
        ]
        e = {**e, "mappings": mappings}
        if not mappings and e["mention_confidence"] < PROBABLE:
            continue
        out.append(e)
    return out


_CLASS_RANK = {c: i for i, c in enumerate(reversed(ENT_CLASS_PREFERRED_ORDER))}


def merge_overlapping(entities: list[dict]) -> list[dict]:
    """Sweep-line location grouping + 5-key preference sort (reference
    merge_overlapping_ents.py:54-140), applied per document span."""
    by_span: dict[int, list[dict]] = {}
    for e in entities:
        by_span.setdefault(e["span_idx"], []).append(e)
    kept: list[dict] = []
    for ents in by_span.values():
        ents.sort(key=lambda e: e["start"])
        group: list[dict] = []
        group_end = -1
        for e in ents:
            if group and e["start"] < group_end:
                group.append(e)
                group_end = max(group_end, e["end"])
            else:
                if group:
                    kept.append(_pick_preferred(group))
                group = [e]
                group_end = e["end"]
        if group:
            kept.append(_pick_preferred(group))
    kept.sort(key=lambda e: (e["span_idx"], e["start"], e["end"]))
    return kept


def _pick_preferred(group: list[dict]) -> dict:
    if len(group) == 1:
        return group[0]
    return max(
        group,
        key=lambda e: (
            len(e["mappings"]) > 0,
            e["end"] - e["start"],
            _CLASS_RANK.get(e["entity_class"], 0),
            e["mention_confidence"],
            e["entity_class"],
        ),
    )


# ---------------------------------------------------------------------------
# the fused stage
# ---------------------------------------------------------------------------


class DocPostProcessor:
    """Actor-pool UDF over doc rows; ``spans`` passes through verbatim."""

    def __init__(self, synonyms_path: str, metadata_path: str,
                 xrefs_path: str | None = None,
                 class_rules: dict | None = None,
                 mention_rules: dict | None = None,
                 contexts_path: str | None = None,
                 use_nearest_embedding_fallback: bool = False):
        self.synonyms = load_synonyms(synonyms_path)
        self.metadata = load_metadata(metadata_path)
        self.embedder = HashedNgramEmbedder()
        self.string_embedder = default_embedder()
        id_contexts = None
        if contexts_path:
            import pyarrow.parquet as _pq

            id_contexts = {
                (r["parser_name"], r["idx"]): r["context"]
                for r in _pq.read_table(contexts_path).to_pylist()
            }
        self.cascade = MappingCascade(
            self.synonyms,
            self.metadata,
            self.embedder,
            id_contexts=id_contexts,
            use_nearest_embedding_fallback=use_nearest_embedding_fallback,
            string_embedder=self.string_embedder,
        )
        # rules-based entity-class disambiguation filter (runs before the
        # cascade, mirroring the reference default step order); no-op
        # unless rules are configured
        from .class_filter import ClassDisambiguationFilter

        self.class_filter = ClassDisambiguationFilter(class_rules, mention_rules)
        # optional cross-reference fan-out (reference CrossReferenceManager,
        # xref_manager.py:41-106; disabled unless an xref table is given)
        self.xrefs: dict[tuple[str, str], list[tuple[str, str]]] = {}
        if xrefs_path:
            import pyarrow.parquet as _pq

            for r in _pq.read_table(xrefs_path).to_pylist():
                self.xrefs.setdefault((r["parser_name"], r["idx"]), []).append(
                    (r["xref_source"], r["xref_idx"])
                )

    def process_doc(
        self,
        spans: list[dict],
        entities: list[dict],
        span_toks: dict[int, list[Token]] | None = None,
        copy_entities: bool = True,
    ) -> list[dict]:
        if copy_entities:  # callers that keep the input entity dicts
            entities = [dict(e) for e in entities]
        entities = self.class_filter.apply(spans, entities)
        entities = expand_abbreviations(spans, entities, span_toks)
        self.cascade.run(spans, entities)
        if self.xrefs:
            self._fan_out_xrefs(entities)
        entities = cleanup_entities(entities)
        entities = merge_overlapping(entities)
        return entities

    def _fan_out_xrefs(self, entities: list[dict]) -> None:
        """Append cross-KB mappings for every grounded mapping with an
        xref (reference strategy_runner.py:324-333)."""
        for e in entities:
            extra = []
            for m in e["mappings"]:
                for src, xid in self.xrefs.get((m["parser_name"], m["idx"]), ()):
                    extra.append(
                        {
                            **m,
                            "source": src,
                            "idx": xid,
                            "xref_source_parser_name": m["parser_name"],
                        }
                    )
            if extra:
                e["mappings"] = e["mappings"] + extra

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans").to_pylist()
        ents_col = batch.column("entities").to_pylist()
        new_ents = [
            self.process_doc(spans, ents) for spans, ents in zip(spans_col, ents_col)
        ]
        batch = batch.drop_columns(["entities"])
        return batch.append_column("entities", pa.array(new_ents, type=ENTITIES_COLUMN))
