"""IUPAC→SMILES engine + OpsinStep-analogue stage.

Reference: kazu/steps/ner/opsin.py:253-380 (OPSIN over py4j + rdkit
canonicalization; extendString truncation repair at :312-348).  The
name vectors below are standard nomenclature examples whose structures
are public knowledge; structural equality is asserted through the
module's own canonicalizer over BOTH a hand-written SMILES and the
parsed name — two independent construction paths meeting at one
canonical string (the same role rdkit's CanonSmiles plays for the
reference)."""

import pyarrow as pa
import pytest

from kazu_ray.functions.iupac import (
    ParseError,
    canonical_smiles,
    name_to_mol,
    name_to_smiles,
    parse_smiles,
)
from kazu_ray.stages.opsin import OpsinStage, extend_string

# (name, hand-written SMILES of the expected structure)
NAME_VECTORS = [
    ("methane", "C"),
    ("hexane", "CCCCCC"),
    ("tetradecane", "CCCCCCCCCCCCCC"),
    ("ethanol", "CCO"),
    ("2-methylbutane", "CCC(C)C"),
    ("2,2-dimethylpropane", "CC(C)(C)C"),
    ("propan-2-ol", "CC(O)C"),
    ("butan-2-one", "CCC(C)=O"),
    ("but-2-ene", "CC=CC"),
    ("buta-1,3-diene", "C=CC=C"),
    ("hexa-2,4-diene", "CC=CC=CC"),
    ("ethyne", "C#C"),
    ("cyclohexane", "C1CCCCC1"),
    ("cyclohexene", "C1=CCCCC1"),
    ("methylcyclohexane", "CC1CCCCC1"),
    ("cyclopropane", "C1CC1"),
    ("benzene", "c1ccccc1"),
    ("chlorobenzene", "Clc1ccccc1"),
    ("1,4-dichlorobenzene", "Clc1ccc(Cl)cc1"),
    ("hexanal", "CCCCCC=O"),
    ("hexanoic acid", "CCCCCC(=O)O"),
    ("ethanamine", "CCN"),
    ("ethanamide", "CC(N)=O"),
    ("propanenitrile", "CCC#N"),
    ("ethanethiol", "CCS"),
    ("2-methoxyethanol", "COCCO"),
    ("propane-1,2-diol", "CC(O)CO"),
    ("butane-2,3-dione", "CC(=O)C(C)=O"),
    ("ethane-1,2-diamine", "NCCN"),
    ("cyclohexanecarboxylic acid", "OC(=O)C1CCCCC1"),
    ("cyclohexanecarbaldehyde", "O=CC1CCCCC1"),
    ("2-chloropropane", "CC(Cl)C"),
    ("1-bromo-2-chloroethane", "BrCCCl"),
    ("nitromethane", "C[N+](=O)[O-]"),
    ("aminomethane", "CN"),
    ("2-aminoethanol", "NCCO"),
    ("(1-methylethyl)benzene", "CC(C)c1ccccc1"),  # cumene
    ("tert-butylbenzene", "CC(C)(C)c1ccccc1"),
    ("trifluoromethylbenzene", "FC(F)(F)c1ccccc1"),
    ("2-phenylethanol", "OCCc1ccccc1"),
    ("4-methylpentan-2-one", "CC(C)CC(C)=O"),  # MIBK
    ("pent-4-en-1-ol", "OCCCC=C"),
    ("toluene", "Cc1ccccc1"),
    ("phenol", "Oc1ccccc1"),
    ("acetic acid", "CC(=O)O"),
    ("acetone", "CC(C)=O"),
    ("urea", "NC(N)=O"),
]

# pairs of names denoting the SAME structure (locant direction /
# numbering / old-vs-new locant style / Kekulé placement)
EQUIVALENT_NAMES = [
    ("propan-2-ol", "2-propanol"),
    ("butanone", "butan-2-one"),
    ("pent-2-ene", "pent-3-ene"),
    ("1-chloropropane", "3-chloropropane"),
    ("buta-1,3-diene", "1,3-butadiene"),
    ("1,2-dichlorobenzene", "2,3-dichlorobenzene"),
    ("1,3-dichlorobenzene", "1,5-dichlorobenzene"),
    ("2-(1-methylethyl)butane", "2,3-dimethylpentane"),
]

UNPARSEABLE = [
    "1,4:3,6-dianhydro-2,5-di-O-Nitro-D-glucitol",  # reference failure row
    "xyzane",
    "hex",           # bare stem
    "pentanone",     # ambiguous ketone locant
    "dichlorobenzene",  # multiplied substituent without locants
    "cyclomethane",  # 1-membered ring
    "",
    "not a chemical at all",
]


def test_name_vectors():
    for name, smiles in NAME_VECTORS:
        got = name_to_smiles(name)
        want = canonical_smiles(parse_smiles(smiles))
        assert got == want, f"{name}: {got} != {want}"


def test_equivalent_names_one_canonical_form():
    for a, b in EQUIVALENT_NAMES:
        sa, sb = name_to_smiles(a), name_to_smiles(b)
        assert sa is not None and sa == sb, (a, b, sa, sb)


def test_unparseable_names_return_none():
    for name in UNPARSEABLE:
        assert name_to_smiles(name) is None, name


def test_case_insensitive():
    assert name_to_smiles("Hexane") == name_to_smiles("hexane")
    assert name_to_smiles("HEXANOIC ACID") == name_to_smiles("hexanoic acid")


def test_canonical_smiles_invariant_under_atom_order():
    # same structure entered in different atom orders → same canonical
    for a, b in [
        ("CCO", "OCC"),
        ("CC(C)CC", "CCC(C)C"),
        ("Clc1ccccc1Cl", "c1ccc(Cl)c(Cl)c1"),
        ("CC(=O)O", "OC(C)=O"),
        ("C1CCCCC1C", "CC1CCCCC1"),
    ]:
        assert canonical_smiles(parse_smiles(a)) == canonical_smiles(
            parse_smiles(b)
        ), (a, b)


def test_kekule_choice_normalized():
    # ortho-dichlorobenzene: the two Kekulé assignments differ on whether
    # the Cl-bearing carbons share a double bond — must canonicalize equal
    k1 = canonical_smiles(parse_smiles("ClC1=CC=CC=C1Cl"))
    k2 = canonical_smiles(parse_smiles("ClC=1C=CC=CC1Cl"))
    assert k1 == k2


def test_valence_rejected():
    with pytest.raises(ParseError):
        parse_smiles("C(C)(C)(C)(C)C")  # 5-valent carbon
    assert name_to_mol("1,1,1,1,1-pentachloromethane") is None


def test_smiles_roundtrip():
    for _, smiles in NAME_VECTORS:
        canon = canonical_smiles(parse_smiles(smiles))
        assert canonical_smiles(parse_smiles(canon)) == canon, smiles


# ------------------------------------------------------------------ stage

def _ent(start, end, match, cls="drug", mappings=()):
    return {
        "span_idx": 0,
        "start": start,
        "end": end,
        "match": match,
        "match_norm": match,
        "entity_class": cls,
        "namespace": "TransformerNER",
        "mention_confidence": 50,
        "candidates": [],
        "mappings": list(mappings),
    }


def _doc_batch(text, ents):
    from kazu_ray.schemas import ENTITIES_COLUMN, SPAN_STRUCT

    return pa.table(
        {
            "doc_id": pa.array(["d1"]),
            "spans": pa.array(
                [[{"kind": "text", "text": text, "media_ref": "", "offset": 0}]],
                type=pa.list_(SPAN_STRUCT),
            ),
            "entities": pa.array([ents], type=ENTITIES_COLUMN),
        }
    )


def test_extend_string_reference_semantics():
    # candidates longest-first; left extension to previous break; right
    # extension through `spaces` breaks (reference opsin.py:312-348)
    text = "with 2-chloropropane in hand today"
    cands = list(extend_string(text, 7, 8, spaces=2))
    assert cands[0] == ("2-chloropropane in hand", 5, 28)
    assert cands[-1] == ("2-chloropropane", 5, 20)
    assert all(
        len(cands[i][0]) >= len(cands[i + 1][0]) for i in range(len(cands) - 1)
    )


def test_stage_repairs_truncated_entity():
    text = "the compound propan-2-ol was isolated"
    # truncated entity: only 'propan' (transformer stops at the hyphen)
    batch = _doc_batch(text, [_ent(13, 19, "propan")])
    out = OpsinStage()(batch)
    ent = out.column("entities").to_pylist()[0][0]
    assert ent["match"] == "propan-2-ol"
    assert ent["start"] == 13 and ent["end"] == 24
    assert ent["mappings"][0]["source"] == "Opsin"
    assert ent["mappings"][0]["idx"] == name_to_smiles("propan-2-ol")
    assert ent["mappings"][0]["string_match_confidence"] == "HIGHLY_LIKELY"


def test_stage_leaves_mapped_and_other_class_entities_alone():
    text = "aspirin and propan-2-ol"
    mapped = _ent(0, 7, "aspirin", mappings=[{
        "parser_name": "p", "source": "s", "idx": "X:1", "default_label": "l",
        "string_match_strategy": "m", "string_match_confidence": "HIGHLY_LIKELY",
        "disambiguation_strategy": "", "disambiguation_confidence": "",
        "xref_source_parser_name": "",
    }])
    gene = _ent(12, 18, "propan", cls="gene")
    out = OpsinStage()(_doc_batch(text, [mapped, gene]))
    ents = out.column("entities").to_pylist()[0]
    assert ents[0]["mappings"][0]["idx"] == "X:1"  # untouched
    assert ents[1]["mappings"] == []  # wrong class → untouched


def test_stage_unparseable_stays_unmapped():
    text = "the compound xyzane was isolated"
    out = OpsinStage()(_doc_batch(text, [_ent(13, 16, "xyz")]))
    ent = out.column("entities").to_pylist()[0][0]
    assert ent["mappings"] == []
    assert ent["match"] == "xyz"  # unchanged


def test_chem_smiles_query_batch_golden():
    from kazu_ray.stages.opsin import INJECT_NAMES, _smiles_batch

    batch = pa.table(
        {
            "doc_id": pa.array(list(range(len(INJECT_NAMES))), type=pa.int64()),
            "text": pa.array(["doc text here"] * len(INJECT_NAMES)),
        }
    )
    out = _smiles_batch(batch).to_pylist()
    by_doc = {r["doc_id"]: r for r in out}
    # every grammar-parseable name resolves; only the glucitol row fails
    glucitol_idx = INJECT_NAMES.index(
        "1,4:3,6-dianhydro-2,5-di-o-nitro-d-glucitol"
    )
    assert len(out) == len(INJECT_NAMES) - 1
    assert glucitol_idx not in by_doc
    assert by_doc[1]["match"] == "propan-2-ol"
    assert by_doc[1]["smiles"] == name_to_smiles("propan-2-ol")
    assert by_doc[3]["match"] == "cyclohexanecarboxylic acid"
    assert by_doc[7]["smiles"] == name_to_smiles("hexanoic acid")
    # functional-class injections resolve through the extension window
    ether_idx = INJECT_NAMES.index("dimethyl ether")
    assert by_doc[ether_idx]["match"] == "dimethyl ether"
    assert by_doc[ether_idx]["smiles"] == name_to_smiles("dimethyl ether")
    ester_idx = INJECT_NAMES.index("methyl ethanoate")
    assert by_doc[ester_idx]["smiles"] == name_to_smiles("methyl ethanoate")


def test_chem_step_group_registered():
    from kazu_ray.pipelines.config import STEP_GROUPS

    assert "opsin" in STEP_GROUPS["chem"]


# ------------------------------------------------------- property tests

from hypothesis import given, settings, strategies as st

_STEM_NAMES = ["prop", "but", "pent", "hex", "hept", "oct", "non", "dec"]
_STEM_LEN = {"prop": 3, "but": 4, "pent": 5, "hex": 6, "hept": 7, "oct": 8,
             "non": 9, "dec": 10}
_SUBS = ["chloro", "bromo", "fluoro", "methyl", "hydroxy", "amino"]


@st.composite
def substituted_alkane(draw):
    stem = draw(st.sampled_from(_STEM_NAMES))
    n = _STEM_LEN[stem]
    n_subs = draw(st.integers(1, 3))
    pairs = [
        (draw(st.integers(1, n)), draw(st.sampled_from(_SUBS)))
        for _ in range(n_subs)
    ]
    return stem, n, sorted(pairs)


def _compose(stem, pairs):
    prefix = "-".join(f"{p}-{s}" for p, s in pairs)
    return f"{prefix}{stem}ane"


@settings(max_examples=60, deadline=None)
@given(substituted_alkane())
def test_locant_mirror_invariance(case):
    """Numbering a chain from either end denotes the same molecule, so
    position p and n+1-p substituent placements must canonicalize
    identically (the core promise the CANGEN layer provides)."""
    stem, n, pairs = case
    a = _compose(stem, sorted(pairs))
    mirrored = sorted((n + 1 - p, s) for p, s in pairs)
    b = _compose(stem, mirrored)
    sa, sb = name_to_smiles(a), name_to_smiles(b)
    # geminal over-substitution can exceed valence -> both must agree on None
    assert sa == sb, (a, b, sa, sb)


@settings(max_examples=60, deadline=None)
@given(substituted_alkane())
def test_parse_never_emits_invalid_molecule(case):
    """Whatever the generator produces, a non-None result must survive
    a reparse of its own SMILES (valence-valid, round-trippable)."""
    stem, n, pairs = case
    smiles = name_to_smiles(_compose(stem, pairs))
    if smiles is not None:
        assert canonical_smiles(parse_smiles(smiles)) == smiles


FUNCTIONAL_CLASS_VECTORS = [
    ("dimethyl ether", "COC"),
    ("diethyl ether", "CCOCC"),
    ("methyl ethyl ether", "CCOC"),
    ("ethyl methyl ketone", "CCC(C)=O"),
    ("ethyl chloride", "CCCl"),
    ("methyl bromide", "CBr"),
    ("isopropyl alcohol", "CC(C)O"),
    ("methyl cyanide", "CC#N"),
    ("methyl ethanoate", "COC(C)=O"),
    ("ethyl hexanoate", "CCCCCC(=O)OCC"),
    ("methyl acetate", "COC(C)=O"),
    ("ethyl formate", "CCOC=O"),
    ("benzyl chloride", "ClCc1ccccc1"),
    ("tert-butyl chloride", "CC(C)(C)Cl"),
]


def test_functional_class_vectors():
    for name, smiles in FUNCTIONAL_CLASS_VECTORS:
        got = name_to_smiles(name)
        want = canonical_smiles(parse_smiles(smiles))
        assert got == want, f"{name}: {got} != {want}"


def test_functional_class_equivalences():
    # the same structure via substitutive vs functional-class naming
    for a, b in [
        ("ethyl methyl ketone", "butan-2-one"),
        ("isopropyl alcohol", "propan-2-ol"),
        ("methyl cyanide", "ethanenitrile"),
        ("ethyl chloride", "chloroethane"),
        ("dimethyl ether", "methoxymethane"),
    ]:
        assert name_to_smiles(a) == name_to_smiles(b) != None, (a, b)


def test_functional_class_rejects_malformed():
    for bad in [
        "dimethyl ketone ether",  # extra class word
        "unknownyl ether",
        "trimethyl ether",        # wrong group count
        "methyl",                 # class word missing
        "methyl xyzoate",
    ]:
        assert name_to_smiles(bad) is None, bad


def test_retained_aromatic_names_and_benzoate():
    for name, smiles in [
        ("benzoic acid", "OC(=O)c1ccccc1"),
        ("methyl benzoate", "COC(=O)c1ccccc1"),
        ("ethyl benzoate", "CCOC(=O)c1ccccc1"),
        ("benzaldehyde", "O=Cc1ccccc1"),
        ("benzonitrile", "N#Cc1ccccc1"),
        ("anisole", "COc1ccccc1"),
        ("benzyl alcohol", "OCc1ccccc1"),
    ]:
        assert name_to_smiles(name) == canonical_smiles(parse_smiles(smiles)), name
    # anisole == methoxybenzene (retained vs substitutive)
    assert name_to_smiles("anisole") == name_to_smiles("methoxybenzene")


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_canonical_invariant_under_atom_permutation(data):
    """The CANGEN core promise: relabelling atoms of the same random
    molecule never changes the canonical string.  Random trees with
    mixed elements/bond orders, built in two different atom orders."""
    import random as _random

    n = data.draw(st.integers(2, 14))
    seed = data.draw(st.integers(0, 10_000))
    rng = _random.Random(seed)
    # random tree: parent[i] < i; carbon backbone + decorations
    parents = [rng.randrange(i) for i in range(1, n)]
    elements = ["C"] + [rng.choice("CCCCNOS") for _ in range(n - 1)]
    orders = [rng.choice([1, 1, 1, 2]) for _ in range(n - 1)]

    def build(perm):
        mol = Mol()
        idx = {}
        for orig in perm:
            idx[orig] = mol.add_atom(elements[orig])
        for child in range(1, n):
            mol.add_bond(idx[parents[child - 1]], idx[child], orders[child - 1])
        return mol

    from kazu_ray.functions.iupac import Mol, ParseError

    perm = list(range(n))
    rng.shuffle(perm)
    try:
        c1 = canonical_smiles(build(list(range(n))))
    except ParseError:
        return  # random valences can exceed limits; nothing to compare
    c2 = canonical_smiles(build(perm))
    assert c1 == c2


@settings(max_examples=80, deadline=None)
@given(st.data())
def test_canonical_invariant_with_rings(data):
    """Permutation invariance for CYCLIC molecules: the ring-closure
    digit assignment must not leak input order into the canonical
    string (random tree + 1-2 extra carbon-carbon edges)."""
    import random as _random

    from kazu_ray.functions.iupac import Mol, ParseError

    n = data.draw(st.integers(4, 12))
    seed = data.draw(st.integers(0, 10_000))
    rng = _random.Random(seed)
    parents = [rng.randrange(i) for i in range(1, n)]
    extra = []
    for _ in range(rng.randint(1, 2)):
        a, b = rng.sample(range(n), 2)
        extra.append((min(a, b), max(a, b)))

    def build(perm):
        mol = Mol()
        idx = {}
        for orig in perm:
            idx[orig] = mol.add_atom("C")
        for child in range(1, n):
            mol.add_bond(idx[parents[child - 1]], idx[child], 1)
        for a, b in extra:
            key = (min(idx[a], idx[b]), max(idx[a], idx[b]))
            if key not in mol.bonds:
                mol.add_bond(*key, 1)
        return mol

    perm = list(range(n))
    rng.shuffle(perm)
    try:
        c1 = canonical_smiles(build(list(range(n))))
    except ParseError:
        return
    try:
        c2 = canonical_smiles(build(perm))
    except ParseError:
        # the permuted build can only fail if the original did too
        raise AssertionError("permuted build failed where original parsed")
    assert c1 == c2
