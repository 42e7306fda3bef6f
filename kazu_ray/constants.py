"""Shared enums/constants (mirroring the reference data model's enums,
/root/reference/kazu/data/data.py:85-88, 135-143)."""

# MentionConfidence (IntEnum values in the reference)
HIGHLY_LIKELY = 100
PROBABLE = 50
POSSIBLE = 10

# EquivalentIdSet aggregation strategies
AGG_UNAMBIGUOUS = "UNAMBIGUOUS"
AGG_MERGED_NON_SYMBOLIC = "MERGED_AS_NON_SYMBOLIC"
AGG_RESOLVED_BY_SIMILARITY = "RESOLVED_BY_SIMILARITY"
AGG_RESOLVED_BY_XREF = "RESOLVED_BY_XREF"  # OT disease dbXRef grouping
AGG_CUSTOM = "CUSTOM"  # OT target same-label grouping
AGG_NO_STRATEGY = "NO_STRATEGY"

# string-match / disambiguation confidence labels (data.py:91-101)
LINK_CERTAIN = "HIGHLY_LIKELY"
LINK_PROBABLE = "PROBABLE"
LINK_AMBIGUOUS = "AMBIGUOUS"

# triple predicates
PRED_MENTIONS = "mentions"
PRED_CO_OCCURS = "co-occurs"
PRED_MAPS_TO = "maps-to"

# namespaces (producing stages)
NS_DICT_NER = "DictionaryNER"
NS_TRANSFORMER_NER = "TransformerNER"
NS_ABBREV = "AbbreviationExpansion"
NS_PATTERN_NER = "PatternNER"
NS_MUTATION_NER = "MutationNER"
NS_OPSIN = "OpsinStep"
