"""Rules-based entity-class disambiguation filter.

Re-realizes RulesBasedEntityClassDisambiguationFilterStep (reference
kazu/steps/linking/rules_based_disambiguation.py:37-260): per document,
for each key (match, entity_class) with configured rules, ALL entities
with that key are dropped unless the document validates them:

- drop if a false-positive rule hits anywhere in the document, OR
- drop if true-positive rules are configured but never hit.

Rules are evaluated against the SENTENCE containing each mention.  The
reference expresses rules as spaCy token-Matcher patterns; here a rule
is a context phrase matched case-insensitively within the sentence
(the same expressive job for dictionary-style disambiguation rules;
a token-pattern engine can slot in behind the same interface).
"""

from __future__ import annotations

from .sentences import sentence_spans

RuleDict = dict[str, list[str] | None]  # {"tp": [...], "fp": [...]}


class ClassDisambiguationFilter:
    def __init__(
        self,
        class_rules: dict[str, RuleDict] | None = None,
        mention_rules: dict[str, dict[str, RuleDict]] | None = None,
    ):
        self.class_rules = class_rules or {}
        self.mention_rules = mention_rules or {}

    @staticmethod
    def _hit(rules: list[str] | None, sentence: str) -> bool | None:
        """True/False on configured rules; None when not configured."""
        if rules is None:
            return None
        return any(r.lower() in sentence for r in rules)

    def _sentence_of(self, text: str, start: int, cache: dict) -> str:
        sents = cache.get(id(text))
        if sents is None:
            sents = sentence_spans(text)
            cache[id(text)] = sents
        for s, e in sents:
            if s <= start < e:
                return text[s:e].lower()
        return text.lower()

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
            sp = spans[e["span_idx"]]
            text = sp["text"] if isinstance(sp, dict) else sp
            sentence = self._sentence_of(text, e["start"], sent_cache)
            for rules in rules_list:
                for aspect, cfg_map, hit_map in (
                    ("tp", tp_cfg, tp_hit), ("fp", fp_cfg, fp_hit)
                ):
                    res = self._hit(rules.get(aspect), sentence)
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
