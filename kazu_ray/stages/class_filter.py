"""Rules-based entity-class disambiguation filter.

Re-realizes RulesBasedEntityClassDisambiguationFilterStep (reference
kazu/steps/linking/rules_based_disambiguation.py:37-260): per document,
for each key (match, entity_class) with configured rules, ALL entities
with that key are dropped unless the document validates them:

- drop if a false-positive rule hits anywhere in the document, OR
- drop if true-positive rules are configured but never hit.

Rules are evaluated against the SENTENCE containing each mention, in
either of two forms, freely mixed within one tp/fp list:

- a **token pattern** (list of spec dicts) in the reference's spaCy
  Matcher syntax subset — ``LOWER`` / ``NORM`` / ``ORTH`` attrs, ``IN``
  / ``NOT_IN`` / ``REGEX`` value specs, ``OP`` quantifiers, and the
  ``_: {<entity_class>: bool}`` custom extension marking tokens covered
  by an entity of that class (functions/token_matcher.py) — so
  reference-style conf rules (e.g.
  conf/RulesBasedEntityClassDisambiguationFilterStep/default.yaml) port
  directly;
- a **context phrase** (plain string) matched case-insensitively within
  the sentence — a convenience shorthand for 1-gram/n-gram rules.
"""

from __future__ import annotations

from ..functions.token_matcher import MatchToken, TokenMatcher, annotate_tokens
from .sentences import sentence_spans

RuleDict = dict  # {"tp": [phrase | pattern, ...] | None, "fp": ...}


def _compile_aspect(rules) -> tuple[list[str], TokenMatcher | None] | None:
    """Split an aspect's rule list into (lowercased phrases, one compiled
    TokenMatcher over all pattern rules); None when not configured."""
    if rules is None:
        return None
    phrases = [r.lower() for r in rules if isinstance(r, str)]
    patterns = [r for r in rules if not isinstance(r, str)]
    return phrases, TokenMatcher(patterns) if patterns else None


class ClassDisambiguationFilter:
    def __init__(
        self,
        class_rules: dict[str, RuleDict] | None = None,
        mention_rules: dict[str, dict[str, RuleDict]] | None = None,
    ):
        def compile_rules(rd: RuleDict) -> dict:
            return {a: _compile_aspect(rd.get(a)) for a in ("tp", "fp")}

        self.class_rules = {
            cls: compile_rules(rd) for cls, rd in (class_rules or {}).items()
        }
        self.mention_rules = {
            cls: {m: compile_rules(rd) for m, rd in by_match.items()}
            for cls, by_match in (mention_rules or {}).items()
        }
        self._needs_tokens = any(
            c[1] is not None
            for rd in list(self.class_rules.values())
            + [rd for by in self.mention_rules.values() for rd in by.values()]
            for c in rd.values()
            if c is not None
        )

    @staticmethod
    def _hit(compiled, sentence: str, tokens: list[MatchToken] | None) -> bool | None:
        """True/False on configured rules; None when not configured."""
        if compiled is None:
            return None
        phrases, matcher = compiled
        if any(p in sentence for p in phrases):
            return True
        return bool(matcher and tokens is not None and matcher(tokens))

    def _sentence_ctx(
        self,
        spans: list[dict],
        entities: list[dict],
        span_idx: int,
        start: int,
        cache: dict,
    ) -> tuple[str, list[MatchToken] | None]:
        """(lowercased sentence, class-annotated tokens) for the sentence
        containing char ``start`` of span ``span_idx``; tokens are only
        built when any pattern rule is configured."""
        sp = spans[span_idx]
        text = sp["text"] if isinstance(sp, dict) else sp
        sents = cache.get(span_idx)
        if sents is None:
            sents = {"bounds": sentence_spans(text), "ctx": {}}
            cache[span_idx] = sents
        for s, e in sents["bounds"]:
            if s <= start < e:
                break
        else:
            s, e = 0, len(text)
        ctx = sents["ctx"].get(s)
        if ctx is None:
            sent_text = text[s:e]
            tokens = None
            if self._needs_tokens:
                # custom-extension attrs see every entity of this span
                # overlapping the sentence (reference KazuToSpacyObjectMapper
                # sets the extension for all mapped entity classes)
                in_sent = [
                    ent
                    for ent in entities
                    if ent["span_idx"] == span_idx
                    and ent["start"] < e
                    and s < ent["end"]
                ]
                tokens = annotate_tokens(sent_text, s, in_sent)
            ctx = (sent_text.lower(), tokens)
            sents["ctx"][s] = ctx
        return ctx

    def apply(self, spans: list[dict], entities: list[dict]) -> list[dict]:
        if not self.class_rules and not self.mention_rules:
            return entities
        # per-key doc-wide accumulation (reference :170-248)
        tp_cfg: dict[tuple, bool] = {}
        fp_cfg: dict[tuple, bool] = {}
        tp_hit: dict[tuple, bool] = {}
        fp_hit: dict[tuple, bool] = {}
        considered: list[dict] = []
        sent_cache: dict = {}
        for e in entities:
            cls = e["entity_class"]
            rules_list = []
            cr = self.class_rules.get(cls)
            if cr is not None:
                rules_list.append(cr)
            mr = self.mention_rules.get(cls, {}).get(e["match"])
            if mr is not None:
                rules_list.append(mr)
            if not rules_list:
                continue
            considered.append(e)
            key = (e["match"], cls)
            sentence, tokens = self._sentence_ctx(
                spans, entities, e["span_idx"], e["start"], sent_cache
            )
            for rules in rules_list:
                for aspect, cfg_map, hit_map in (
                    ("tp", tp_cfg, tp_hit), ("fp", fp_cfg, fp_hit)
                ):
                    res = self._hit(rules[aspect], sentence, tokens)
                    if res is None:
                        cfg_map.setdefault(key, False)
                    else:
                        cfg_map[key] = True
                        hit_map[key] = hit_map.get(key, False) or res

        if not considered:
            return entities
        drop_keys = {
            key
            for key in set(tp_cfg) | set(fp_cfg)
            if (fp_cfg.get(key) and fp_hit.get(key, False))
            or (tp_cfg.get(key) and not tp_hit.get(key, False))
        }
        return [
            e
            for e in entities
            if (e["match"], e["entity_class"]) not in drop_keys
        ]
