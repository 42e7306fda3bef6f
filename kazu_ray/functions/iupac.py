"""IUPAC organic-nomenclature → canonical SMILES (OPSIN analogue).

The reference's OpsinStep (kazu/steps/ner/opsin.py:253-380) shells out
to OPSIN (Lowe et al. 2011) over a py4j JVM bridge and canonicalizes
the returned SMILES with rdkit (``Chem.CanonSmiles``).  Neither a JVM
nor rdkit exists in this environment, so this module implements the
same two capabilities from scratch for a restricted, documented grammar:

* ``name_to_mol`` — a recursive-descent parser over substitutive IUPAC
  nomenclature: C1–C20 chain parents (``meth``…``icos``) with -ane/
  -ene/-yne unsaturation (multiplied + locanted, old and new locant
  styles), ``cyclo`` ring parents, benzene, principal characteristic
  suffixes (-ol, -thiol, -al, -one, -amine, -amide, -nitrile,
  -oic acid, and the ring variants -carboxylic acid / -carbaldehyde /
  -carbonitrile, each with di/tri multiplication), substituent
  prefixes (alkyl, cycloalkyl, phenyl, halo, hydroxy, oxo, amino,
  nitro, cyano, alkoxy, retained iso/sec-/tert- alkyls), nested
  parenthesised complex substituents ("(1-methylethyl)",
  "(2-chloroethyl)"), and a small retained-name table.  Anything
  outside the grammar returns ``None`` — mirroring OPSIN's
  parse-failure contract that the reference step turns into "no
  Mapping produced".

* ``canonical_smiles`` — a from-scratch implementation of the CANGEN
  canonicalization of Weininger, Weininger & Weininger 1989 ("SMILES 2:
  Algorithm for generation of unique SMILES notation"): initial atomic
  invariants → iterative neighbour-rank refinement (Morgan-style) →
  tie-broken by the rank-doubling trick → canonical DFS emission with
  ring-closure digits.  Aromatic rings are emitted in Kekulé form
  (canonicalization treats the alternating-bond graph uniformly);
  equality between two structures is therefore tested by comparing
  canonical strings, not by comparing against rdkit output.

* ``parse_smiles`` — a reader for the organic-subset SMILES grammar
  (bare organic atoms, brackets with charge/H-count, branches, ring
  closures, -/=/# bonds) used by the tests to assert *structural*
  equality: ``canon(name_to_mol(n)) == canon(parse_smiles(expected))``.
"""

from __future__ import annotations

import re

# ---------------------------------------------------------------- molecule

_DEFAULT_VALENCE = {"C": 4, "N": 3, "O": 2, "S": 2, "P": 3,
                    "F": 1, "Cl": 1, "Br": 1, "I": 1, "B": 3}

# pseudo bond order marking an aromatic ring bond after Kekulé
# normalization (sigma contribution 1; the shared pi electron is added
# per-atom in implicit_h)
AROMATIC = 4


class ParseError(ValueError):
    pass


class Mol:
    """Tiny molecular graph: atoms = [(element, charge)], bonds[(i,j)] = order."""

    def __init__(self) -> None:
        self.atoms: list[tuple[str, int]] = []
        self.bonds: dict[tuple[int, int], int] = {}

    def add_atom(self, el: str, charge: int = 0) -> int:
        self.atoms.append((el, charge))
        return len(self.atoms) - 1

    def add_bond(self, i: int, j: int, order: int = 1) -> None:
        if i == j:
            raise ParseError("self bond")
        key = (min(i, j), max(i, j))
        if key in self.bonds:
            raise ParseError("duplicate bond")
        self.bonds[key] = order

    def set_order(self, i: int, j: int, order: int) -> None:
        self.bonds[(min(i, j), max(i, j))] = order

    def neighbors(self, i: int) -> list[tuple[int, int]]:
        out = []
        for (a, b), o in self.bonds.items():
            if a == i:
                out.append((b, o))
            elif b == i:
                out.append((a, o))
        return out

    def order_sum(self, i: int) -> int:
        return sum(o for _, o in self.neighbors(i))

    def order_sum_valence(self, i: int) -> int:
        """Bond-order sum for valence: an aromatic bond contributes its
        sigma (1); membership in an aromatic ring adds one shared pi."""
        nbrs = self.neighbors(i)
        total = sum(1 if o == AROMATIC else o for _, o in nbrs)
        if any(o == AROMATIC for _, o in nbrs):
            total += 1
        return total

    def implicit_h(self, i: int) -> int:
        el, charge = self.atoms[i]
        val = _DEFAULT_VALENCE.get(el)
        if val is None:
            raise ParseError(f"unknown element {el}")
        # standard organic-subset adjustment: N+ gets 4, O- gets 1, etc.
        h = (
            val
            + (charge if el in ("N", "P") else -abs(charge))
            - self.order_sum_valence(i)
        )
        if h < 0:
            raise ParseError(f"valence exceeded on atom {i} ({el})")
        return h

    def aromatize(self) -> None:
        """Normalize Kekulé benzene rings to AROMATIC ring bonds so the
        two alternating-bond assignments of the same substituted ring
        canonicalize identically.  Only isolated 6-carbon cycles with
        perfectly alternating single/double ring bonds qualify (the only
        aromatic system this grammar can produce)."""
        n = len(self.atoms)
        for start in range(n):
            if self.atoms[start][0] != "C":
                continue
            # DFS for 6-cycles through `start` over carbon atoms
            def walk(path: list[int]) -> None:
                cur = path[-1]
                for nxt, o in self.neighbors(cur):
                    if o == AROMATIC:
                        continue
                    if nxt == start and len(path) == 6:
                        ring = path[:]
                        orders = [
                            self.bonds[(min(a, b), max(a, b))]
                            for a, b in zip(ring, ring[1:] + ring[:1])
                        ]
                        if sorted(orders) == [1, 1, 1, 2, 2, 2] and all(
                            orders[k] != orders[(k + 1) % 6] for k in range(6)
                        ) and all(self.atoms[a][0] == "C" and self.atoms[a][1] == 0
                                  for a in ring):
                            for a, b in zip(ring, ring[1:] + ring[:1]):
                                self.set_order(a, b, AROMATIC)
                        continue
                    if nxt in path or len(path) >= 6:
                        continue
                    if self.atoms[nxt][0] != "C":
                        continue
                    walk(path + [nxt])

            walk([start])

    def validate(self) -> None:
        for i in range(len(self.atoms)):
            self.implicit_h(i)
        # must be a single connected component
        if not self.atoms:
            raise ParseError("empty molecule")
        seen = {0}
        stack = [0]
        while stack:
            for n, _ in self.neighbors(stack.pop()):
                if n not in seen:
                    seen.add(n)
                    stack.append(n)
        if len(seen) != len(self.atoms):
            raise ParseError("disconnected")


# ---------------------------------------------------------------- SMILES reader

_BRACKET_RE = re.compile(
    r"\[(?P<iso>\d+)?(?P<el>[A-Z][a-z]?|[cnosp])(?P<chiral>@{1,2})?"
    r"(?P<h>H\d*)?(?P<chg>[+-]\d*|[+-]+)?\]"
)


def parse_smiles(s: str) -> Mol:
    """Organic-subset SMILES reader (branches, ring closures, charges,
    lowercase aromatic carbon; stereo markers accepted and discarded).
    Raises ParseError."""
    mol = Mol()
    prev: int | None = None
    stack: list[int | None] = []
    pending_order = 1
    ring: dict[str, tuple[int, int]] = {}
    lower: set[int] = set()
    i = 0
    while i < len(s):
        c = s[i]
        if c == "(":
            stack.append(prev)
            i += 1
        elif c == ")":
            if not stack:
                raise ParseError("unbalanced )")
            prev = stack.pop()
            i += 1
        elif c in "=#-/\\":
            if c == "=":
                pending_order = 2
            elif c == "#":
                pending_order = 3
            i += 1
        elif c.isdigit() or c == "%":
            if c == "%":
                num, i = s[i + 1 : i + 3], i + 3
            else:
                num, i = c, i + 1
            if prev is None:
                raise ParseError("ring digit before atom")
            if num in ring:
                j, o = ring.pop(num)
                o = max(o, pending_order)
                if o == 1 and prev in lower and j in lower:
                    o = AROMATIC
                mol.add_bond(prev, j, o)
            else:
                ring[num] = (prev, pending_order)
            pending_order = 1
        elif c == "[":
            m = _BRACKET_RE.match(s, i)
            if not m:
                raise ParseError(f"bad bracket at {i}")
            el = m.group("el")
            bracket_aromatic = el.islower()
            el = el.capitalize()
            chg = m.group("chg") or ""
            if not chg:
                charge = 0
            elif set(chg) == {"+"}:
                charge = len(chg)
            elif set(chg) == {"-"}:
                charge = -len(chg)
            else:
                charge = int(chg)
            if bracket_aromatic:
                raise ParseError("bracketed aromatic atoms unsupported")
            idx = mol.add_atom(el, charge)
            if prev is not None:
                mol.add_bond(prev, idx, pending_order)
            prev = idx
            pending_order = 1
            i = m.end()
        else:
            aromatic = False
            if s[i : i + 2] in ("Cl", "Br"):
                el, i = s[i : i + 2], i + 2
            elif c in "BCNOSPFI":
                el, i = c, i + 1
            elif c == "c":
                el, i, aromatic = "C", i + 1, True
            elif c in "bnosp":
                raise ParseError("only carbon aromatics supported")
            else:
                raise ParseError(f"unexpected char {c!r}")
            idx = mol.add_atom(el)
            if aromatic:
                lower.add(idx)
            if prev is not None:
                o = pending_order
                if o == 1 and prev in lower and idx in lower:
                    o = AROMATIC
                mol.add_bond(prev, idx, o)
            prev = idx
            pending_order = 1
    if ring:
        raise ParseError("unclosed ring bond")
    mol.validate()
    return mol


# ---------------------------------------------------------------- CANGEN

def _initial_invariants(mol: Mol) -> list[tuple]:
    inv = []
    for i, (el, chg) in enumerate(mol.atoms):
        nbrs = mol.neighbors(i)
        inv.append((el, len(nbrs), mol.order_sum(i), chg, mol.implicit_h(i)))
    return inv


def _dense_ranks(keys: list) -> list[int]:
    order = sorted(set(keys))
    lookup = {k: r for r, k in enumerate(order)}
    return [lookup[k] for k in keys]


def _refine(mol: Mol, ranks: list[int]) -> list[int]:
    n = len(ranks)
    while True:
        keys = [
            (ranks[i], tuple(sorted((o, ranks[j]) for j, o in mol.neighbors(i))))
            for i in range(n)
        ]
        new = _dense_ranks(keys)
        if new == ranks:
            return ranks
        ranks = new


def canonical_ranks(mol: Mol) -> list[int]:
    """CANGEN: invariant ranking, refinement, rank-doubling tie-break.

    Atoms left tied after refinement are treated as automorphic (true
    for the molecules this grammar can produce); the doubling choice is
    then canonical regardless of which class member is picked."""
    ranks = _refine(mol, _dense_ranks(_initial_invariants(mol)))
    n = len(mol.atoms)
    while len(set(ranks)) < n:
        counts: dict[int, list[int]] = {}
        for i, r in enumerate(ranks):
            counts.setdefault(r, []).append(i)
        tied_rank = min(r for r, idxs in counts.items() if len(idxs) > 1)
        chosen = counts[tied_rank][0]
        ranks = [2 * r for r in ranks]
        ranks[chosen] -= 1
        ranks = _refine(mol, _dense_ranks(ranks))
    return ranks


def _atom_symbol(mol: Mol, i: int) -> str:
    el, chg = mol.atoms[i]
    aromatic = any(o == AROMATIC for _, o in mol.neighbors(i))
    organic = el in ("B", "C", "N", "O", "S", "P", "F", "Cl", "Br", "I")
    if chg == 0 and organic:
        return el.lower() if aromatic else el
    h = mol.implicit_h(i)
    hs = "" if h == 0 else ("H" if h == 1 else f"H{h}")
    if chg == 0:
        cs = ""
    elif abs(chg) == 1:
        cs = "+" if chg > 0 else "-"
    else:
        cs = f"{'+' if chg > 0 else '-'}{abs(chg)}"
    return f"[{el}{hs}{cs}]"


_BOND_SYM = {1: "", 2: "=", 3: "#", AROMATIC: ""}


def canonical_smiles(mol: Mol) -> str:
    """Unique SMILES: canonical-rank-ordered DFS with ring closures.

    Two passes: the first DFS (same deterministic neighbour order)
    classifies edges into tree edges and ring-closure (non-tree) edges;
    the second emits atoms, attaching each ring-closure digit at both
    of its endpoints as they are reached (bond symbol on the opening
    occurrence)."""
    mol.validate()
    mol.aromatize()
    ranks = canonical_ranks(mol)
    start = ranks.index(min(ranks))

    def ordered_neighbors(i: int, parent: int | None) -> list[int]:
        return sorted(
            (n for n, _ in mol.neighbors(i) if n != parent),
            key=lambda n: ranks[n],
        )

    # pass 1: tree / ring-closure classification
    visited: set[int] = set()
    tree_children: dict[int, list[int]] = {i: [] for i in range(len(mol.atoms))}
    ring_edges: set[tuple[int, int]] = set()

    # visited/ring membership is re-checked at loop time, so atoms claimed
    # by an earlier sibling's subtree correctly fall through to ring edges
    def classify2(i: int, parent: int | None) -> None:
        visited.add(i)
        for n in ordered_neighbors(i, parent):
            key = (min(i, n), max(i, n))
            if key in ring_edges:
                continue
            if n in visited:
                ring_edges.add(key)
            else:
                tree_children[i].append(n)
                classify2(n, i)

    classify2(start, None)

    # pass 2: emission
    digit_of: dict[tuple[int, int], str] = {}
    opened: set[tuple[int, int]] = set()
    next_digit = [1]
    out: list[str] = []

    def emit(i: int, parent: int | None) -> None:
        out.append(_atom_symbol(mol, i))
        # ring-closure digits incident to this atom, neighbour-rank order
        for n in ordered_neighbors(i, parent):
            key = (min(i, n), max(i, n))
            if key in ring_edges:
                o = mol.bonds[key]
                if key not in digit_of:
                    d = next_digit[0]
                    next_digit[0] += 1
                    digit_of[key] = str(d) if d < 10 else f"%{d:02d}"
                    opened.add(key)
                    out.append(_BOND_SYM[o] + digit_of[key])
                else:
                    out.append(digit_of[key])
        kids = tree_children[i]
        for k, n in enumerate(kids):
            o = mol.bonds[(min(i, n), max(i, n))]
            if k < len(kids) - 1:
                out.append("(" + _BOND_SYM[o])
                emit(n, i)
                out.append(")")
            else:
                out.append(_BOND_SYM[o])
                emit(n, i)

    emit(start, None)
    return "".join(out)


# ---------------------------------------------------------------- name parser

_STEMS = [
    ("icos", 20), ("eicos", 20), ("nonadec", 19), ("octadec", 18),
    ("heptadec", 17), ("hexadec", 16), ("pentadec", 15), ("tetradec", 14),
    ("tridec", 13), ("dodec", 12), ("undec", 11), ("dec", 10), ("non", 9),
    ("oct", 8), ("hept", 7), ("hex", 6), ("pent", 5), ("but", 4),
    ("prop", 3), ("eth", 2), ("meth", 1),
]
_STEM_BY_LEN = sorted(_STEMS, key=lambda kv: -len(kv[0]))

_MULT = {"di": 2, "tri": 3, "tetra": 4, "penta": 5, "hexa": 6,
         "bis": 2, "tris": 3}

# retained (trivial) names → Kekulé SMILES
RETAINED_NAMES = {
    "benzene": "C1=CC=CC=C1",
    "toluene": "CC1=CC=CC=C1",
    "phenol": "OC1=CC=CC=C1",
    "aniline": "NC1=CC=CC=C1",
    "styrene": "C=CC1=CC=CC=C1",
    "acetone": "CC(C)=O",
    "acetic acid": "CC(=O)O",
    "formic acid": "C(=O)O",
    "formaldehyde": "C=O",
    "acetaldehyde": "CC=O",
    "ethylene": "C=C",
    "acetylene": "C#C",
    "isoprene": "C=C(C)C=C",
    "glycerol": "OCC(O)CO",
    "urea": "NC(=O)N",
    "benzoic acid": "OC(=O)c1ccccc1",
    "benzaldehyde": "O=Cc1ccccc1",
    "benzamide": "NC(=O)c1ccccc1",
    "benzonitrile": "N#Cc1ccccc1",
    "anisole": "COc1ccccc1",
    "benzyl alcohol": "OCc1ccccc1",
}

# retained substituent prefixes → (SMILES, attachment atom index in parse order)
_RETAINED_SUBST = {
    "isopropyl": ("C(C)C", 0),
    "isobutyl": ("CC(C)C", 0),
    "sec-butyl": ("C(C)CC", 0),
    "tert-butyl": ("C(C)(C)C", 0),
    "phenyl": ("C1=CC=CC=C1", 0),
    "benzyl": ("CC1=CC=CC=C1", 0),
    "vinyl": ("C=C", 0),
    "allyl": ("CC=C", 0),
    "formyl": ("C=O", 0),
    "acetyl": ("C(C)=O", 0),
    "trifluoromethyl": ("C(F)(F)F", 0),
}

# simple one-atom / small-group prefixes: element or fragment builders
_HALO = {"fluoro": "F", "chloro": "Cl", "bromo": "Br", "iodo": "I"}

_LOCANTS_RE = re.compile(r"(\d+(?:,\d+)*)")


def _parse_locants(s: str, pos: int) -> tuple[list[int] | None, int]:
    """Consume an optional ``-1,2-`` / leading ``1,2-`` locant group."""
    p = pos
    if p < len(s) and s[p] == "-":
        p += 1
    m = _LOCANTS_RE.match(s, p)
    if not m:
        return None, pos
    p = m.end()
    if p < len(s) and s[p] == "-":
        p += 1
    return [int(x) for x in m.group(1).split(",")], p


class _Parent:
    """Parsed parent hydride + suffixes, before graph construction."""

    def __init__(self, length: int, cyclo: bool, benzo: bool):
        self.length = length
        self.cyclo = cyclo
        self.benzo = benzo
        self.unsat: list[tuple[int, list[int] | None, int]] = []  # (order, locants, count)
        self.suffixes: list[tuple[str, list[int] | None, int]] = []  # (kind, locants, count)


_SUFFIX_KINDS = (
    # ordered longest-first so e.g. 'carboxylic acid' wins over 'oic acid' substring logic
    "carboxylic acid", "carbaldehyde", "carbonitrile",
    "oic acid", "nitrile", "amine", "amide", "thiol",
    "one", "ol", "al",
)
# space-elided forms an ending can take after a multiplier ('diol', 'dioic acid')
_ENDING_FORMS = tuple(
    k.replace(" ", "") for k in ("ene", "en", "yne", "yn", *_SUFFIX_KINDS)
)


def _parse_parent(s: str) -> _Parent | None:
    """Parse a full parent expression: [locants-]? (cyclo)? stem segments.

    Segment grammar after the stem:  ``a?  -loc-?  mult?  ending``
    where ending ∈ ane/ene/yne (+ e-elided forms) or a principal suffix.
    Returns None if the string is not entirely consumed."""
    pos = 0
    leading_loc, pos = _parse_locants(s, pos)
    cyclo = False
    benzo = False
    length = 0
    if s.startswith("cyclo", pos):
        cyclo = True
        pos += 5
    if s.startswith("benzen", pos):
        benzo = True
        length = 6
        pos += 6
    else:
        for stem, n in _STEM_BY_LEN:
            if s.startswith(stem, pos):
                length = n
                pos += len(stem)
                break
        else:
            return None
    parent = _Parent(length, cyclo, benzo)
    pending_loc = leading_loc
    saturated_seen = False
    while pos < len(s):
        if s[pos] == "a" and (
            s[pos + 1 : pos + 2] == "-"
            or any(s.startswith(m, pos + 1) for m in _MULT)
        ):
            # euphonic 'a' before locants/multiplier: hexa-2,4-diene
            pos += 1
        loc, pos = _parse_locants(s, pos)
        if loc is not None:
            pending_loc = loc
            continue
        count = 1
        for mname, mval in _MULT.items():
            if s.startswith(mname, pos):
                # guard: 'di' must precede a real ending ('diene', 'diol')
                rest = s[pos + len(mname):]
                if any(rest.startswith(e) for e in _ENDING_FORMS):
                    count = mval
                    pos += len(mname)
                break
        if s.startswith("ane", pos) or s.startswith("an", pos):
            # saturation marker; no structural effect
            pos += 3 if s.startswith("ane", pos) else 2
            saturated_seen = True
            continue
        if s[pos] == "e" and pos + 1 == len(s):
            # bare trailing 'e' of a ring parent name ('chlorobenzene')
            pos += 1
            saturated_seen = True
            continue
        if s.startswith("ene", pos) or s.startswith("en", pos):
            pos += 3 if s.startswith("ene", pos) else 2
            parent.unsat.append((2, pending_loc, count))
            pending_loc = None
            continue
        if s.startswith("yne", pos) or s.startswith("yn", pos):
            pos += 3 if s.startswith("yne", pos) else 2
            parent.unsat.append((3, pending_loc, count))
            pending_loc = None
            continue
        for kind in _SUFFIX_KINDS:
            compact = kind.replace(" ", "")
            if s.startswith(compact, pos):
                pos += len(compact)
                parent.suffixes.append((kind, pending_loc, count))
                pending_loc = None
                break
        else:
            return None
    if pending_loc is not None:
        return None  # dangling locants
    if benzo and (parent.unsat or cyclo):
        return None
    if not benzo and not saturated_seen and not parent.unsat and not parent.suffixes:
        return None  # bare stem like "hex"
    return parent


def _graft(mol: Mol, frag_smiles: str, attach_idx: int) -> int:
    """Add a parsed SMILES fragment to ``mol``; return the global index
    of the fragment's attachment atom."""
    frag = parse_smiles(frag_smiles) if isinstance(frag_smiles, str) else frag_smiles
    base = len(mol.atoms)
    for el, chg in frag.atoms:
        mol.add_atom(el, chg)
    for (a, b), o in frag.bonds.items():
        mol.add_bond(base + a, base + b, o)
    return base + attach_idx


class _Substituent:
    """A prefix substituent: callable grafting itself onto chain atom."""

    def __init__(self, kind: str, payload=None):
        self.kind = kind
        self.payload = payload

    def attach(self, mol: Mol, chain_atom: int) -> None:
        k, p = self.kind, self.payload
        if k == "halo":
            mol.add_bond(chain_atom, mol.add_atom(p), 1)
        elif k == "hydroxy":
            mol.add_bond(chain_atom, mol.add_atom("O"), 1)
        elif k == "mercapto":
            mol.add_bond(chain_atom, mol.add_atom("S"), 1)
        elif k == "oxo":
            mol.add_bond(chain_atom, mol.add_atom("O"), 2)
        elif k == "amino":
            mol.add_bond(chain_atom, mol.add_atom("N"), 1)
        elif k == "cyano":
            c = mol.add_atom("C")
            mol.add_bond(chain_atom, c, 1)
            mol.add_bond(c, mol.add_atom("N"), 3)
        elif k == "nitro":
            n = mol.add_atom("N", +1)
            mol.add_bond(chain_atom, n, 1)
            mol.add_bond(n, mol.add_atom("O"), 2)
            mol.add_bond(n, mol.add_atom("O", -1), 1)
        elif k == "alkoxy":
            o = mol.add_atom("O")
            mol.add_bond(chain_atom, o, 1)
            prev = o
            for _ in range(p):
                c = mol.add_atom("C")
                mol.add_bond(prev, c, 1)
                prev = c
        elif k == "fragment":
            smiles, attach = p
            idx = _graft(mol, smiles, attach)
            mol.add_bond(chain_atom, idx, 1)
        elif k == "mol":
            inner_mol, attach = p
            base = len(mol.atoms)
            for el, chg in inner_mol.atoms:
                mol.add_atom(el, chg)
            for (a, b), o in inner_mol.bonds.items():
                mol.add_bond(base + a, base + b, o)
            mol.add_bond(chain_atom, base + attach, 1)
        else:  # pragma: no cover
            raise ParseError(f"unknown substituent kind {k}")


def _parse_substituent_name(tok: str) -> _Substituent | None:
    """One substituent token, without locants/multiplier: 'methyl',
    'chloro', 'methoxy', 'cyclohexyl', 'tert-butyl', …"""
    if tok in _RETAINED_SUBST:
        return _Substituent("fragment", _RETAINED_SUBST[tok])
    if tok in _HALO:
        return _Substituent("halo", _HALO[tok])
    simple = {
        "hydroxy": "hydroxy", "oxo": "oxo", "amino": "amino",
        "nitro": "nitro", "cyano": "cyano", "mercapto": "mercapto",
        "sulfanyl": "mercapto",
    }
    if tok in simple:
        return _Substituent(simple[tok])
    # alkoxy: methoxy/ethoxy/propoxy/butoxy… stem + 'oxy'
    if tok.endswith("oxy"):
        stem_part = tok[:-3]
        if stem_part == "phen":
            return _Substituent("fragment", ("OC1=CC=CC=C1", 0))
        for stem, n in _STEM_BY_LEN:
            if stem_part == stem:
                return _Substituent("alkoxy", n)
    # plain/cyclo alkyl: stem + 'yl'
    if tok.endswith("yl"):
        inner = tok[:-2]
        cyclo = inner.startswith("cyclo")
        if cyclo:
            inner = inner[5:]
        for stem, n in _STEM_BY_LEN:
            if inner == stem:
                frag = Mol()
                atoms = [frag.add_atom("C") for _ in range(n)]
                for a, b in zip(atoms, atoms[1:]):
                    frag.add_bond(a, b, 1)
                if cyclo:
                    if n < 3:
                        return None
                    frag.add_bond(atoms[-1], atoms[0], 1)
                return _Substituent("mol", (frag, 0))
    return None


def _parse_complex_substituent(inner: str) -> _Substituent | None:
    """Parenthesised substituent: '1-methylethyl', 'propan-2-yl',
    '2-chloroethyl' — a full sub-name ending in -yl, attachment at the
    trailing -yl locant (default 1)."""
    attach_loc = 1
    m = re.search(r"-?(\d+)-yl$", inner)
    if m:
        attach_loc = int(m.group(1))
        core = inner[: m.start()]
        # 'propan-2-yl' → core 'propan'; make it a parseable parent
        mol = _name_to_mol_core(core + "ane") or _name_to_mol_core(core + "e")
    else:
        if not inner.endswith("yl"):
            return None
        core = inner[:-2]
        mol = _name_to_mol_core(core + "ane")
    if mol is None or attach_loc > len(mol.atoms):
        return None
    return _Substituent("mol", (mol, attach_loc - 1))


def _split_prefixes(pre: str) -> list[tuple[list[int] | None, int, str]] | None:
    """Split the prefix region into (locants, count, token) triples.
    Tokens may be parenthesised complex substituents."""
    out = []
    pos = 0
    s = pre
    while pos < len(s):
        if s[pos] == "-":
            pos += 1
            continue
        loc, pos = _parse_locants(s, pos)
        count = 1
        # a token that parses whole beats a multiplier split: 'tetradecyl'
        # is the C14 alkyl, not tetra+decyl (which would need 4 locants)
        direct = None
        for j in range(len(s), pos, -1):
            if _parse_substituent_name(s[pos:j]) is not None:
                direct = j
                break
        mult_end = pos
        for mname, mval in _MULT.items():
            if s.startswith(mname, pos):
                rest = s[pos + len(mname):]
                if rest and (rest[0] == "(" or _has_subst_prefix(rest)):
                    count = mval
                    mult_end = pos + len(mname)
                break
        if direct is not None and direct > mult_end:
            out.append((loc, 1, s[pos:direct]))
            pos = direct
            continue
        pos = mult_end
        if pos < len(s) and s[pos] == "(":
            depth, j = 0, pos
            while j < len(s):
                if s[j] == "(":
                    depth += 1
                elif s[j] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            if depth != 0:
                return None
            out.append((loc, count, s[pos : j + 1]))
            pos = j + 1
        else:
            # longest token that parses as a substituent name
            best = None
            for j in range(len(s), pos, -1):
                if _parse_substituent_name(s[pos:j]) is not None:
                    best = j
                    break
            if best is None:
                return None
            out.append((loc, count, s[pos:best]))
            pos = best
    return out


def _has_subst_prefix(s: str) -> bool:
    for j in range(len(s), 0, -1):
        if _parse_substituent_name(s[:j]) is not None:
            return True
    return False


def _default_locants(loc: list[int] | None, count: int, parent: _Parent,
                     terminal: bool) -> list[int] | None:
    if loc is not None:
        if len(loc) != count:
            return None
        return loc
    if terminal:
        # -al/-oic acid/-amide/-nitrile live at chain ends
        if count == 1:
            return [1]
        if count == 2:
            return [1, parent.length]
        return None
    if count == 1:
        return [1]
    return None  # ambiguous: multiplied non-terminal feature needs locants


def _build_parent_mol(parent: _Parent) -> Mol | None:
    mol = Mol()
    n = parent.length
    chain = [mol.add_atom("C") for _ in range(n)]
    for a, b in zip(chain, chain[1:]):
        mol.add_bond(a, b, 1)
    if parent.benzo:
        mol.add_bond(chain[-1], chain[0], 1)
        for k in range(0, 6, 2):
            mol.set_order(chain[k], chain[k + 1], 2)
    elif parent.cyclo:
        if n < 3:
            return None
        mol.add_bond(chain[-1], chain[0], 1)
    for order, loc, count in parent.unsat:
        if loc is None:
            if count == 1 and n <= 3:
                loc = [1]
            elif count == 1 and parent.cyclo:
                loc = [1]
            else:
                return None
        if len(loc) != count:
            return None
        for pos in loc:
            if pos < 1 or (pos >= n and not parent.cyclo) or pos > n:
                return None
            j = chain[pos % n] if parent.cyclo else chain[pos]
            mol.set_order(chain[pos - 1], j, order)
    for kind, loc, count in parent.suffixes:
        terminal = kind in ("al", "oic acid", "amide", "nitrile")
        if kind == "one" and loc is None and count == 1:
            # 'propanone'/'butanone' unambiguously mean the 2-one; longer
            # chains without a locant are genuinely ambiguous — reject
            # (a 1-one would silently be an aldehyde, never intended)
            if n in (3, 4):
                loc = [2]
            else:
                return None
        loc = _default_locants(loc, count, parent, terminal)
        if loc is None:
            return None
        for pos in loc:
            if pos < 1 or pos > n:
                return None
            c = chain[pos - 1]
            if kind == "ol":
                mol.add_bond(c, mol.add_atom("O"), 1)
            elif kind == "thiol":
                mol.add_bond(c, mol.add_atom("S"), 1)
            elif kind == "one":
                mol.add_bond(c, mol.add_atom("O"), 2)
            elif kind == "al":
                mol.add_bond(c, mol.add_atom("O"), 2)
            elif kind == "amine":
                mol.add_bond(c, mol.add_atom("N"), 1)
            elif kind == "oic acid":
                mol.add_bond(c, mol.add_atom("O"), 2)
                mol.add_bond(c, mol.add_atom("O"), 1)
            elif kind == "amide":
                mol.add_bond(c, mol.add_atom("O"), 2)
                mol.add_bond(c, mol.add_atom("N"), 1)
            elif kind == "nitrile":
                mol.add_bond(c, mol.add_atom("N"), 3)
            elif kind == "carboxylic acid":
                cx = mol.add_atom("C")
                mol.add_bond(c, cx, 1)
                mol.add_bond(cx, mol.add_atom("O"), 2)
                mol.add_bond(cx, mol.add_atom("O"), 1)
            elif kind == "carbaldehyde":
                cx = mol.add_atom("C")
                mol.add_bond(c, cx, 1)
                mol.add_bond(cx, mol.add_atom("O"), 2)
            elif kind == "carbonitrile":
                cx = mol.add_atom("C")
                mol.add_bond(c, cx, 1)
                mol.add_bond(cx, mol.add_atom("N"), 3)
            else:  # pragma: no cover
                return None
    return mol


def _name_to_mol_core(name: str) -> Mol | None:
    """Parse a normalized (lowercased, trimmed) name."""
    if name in RETAINED_NAMES:
        return parse_smiles(RETAINED_NAMES[name])
    # candidate parent start positions: every stem / 'benzen' occurrence,
    # rightmost first; 'cyclo' immediately before the stem joins the parent
    candidates = []
    # zero-width search: plain finditer skips OVERLAPPING occurrences
    # ('2-aminononane' has 'non' at both 5 and 7; only 7 is the parent)
    for stem, _ in _STEMS:
        for m in re.finditer(f"(?={re.escape(stem)})", name):
            candidates.append(m.start())
    for m in re.finditer("(?=benzen)", name):
        candidates.append(m.start())
    for start in sorted(set(candidates), reverse=True):
        real_start = start
        if name.startswith("cyclo", max(0, start - 5)) and start >= 5:
            real_start = start - 5
        for st in dict.fromkeys((real_start, start)):
            # leading locants of old-style names ('2-propanol') belong to
            # the parent, so extend left across a trailing locant group
            ext = st
            m = re.search(r"(?:^|[-)l])((\d+(?:,\d+)*)-)$", name[:st])
            if m:
                ext = st - len(m.group(1))
            for p_start in dict.fromkeys((ext, st)):
                parent = _parse_parent(name[p_start:])
                if parent is None:
                    continue
                prefixes = _split_prefixes(name[:p_start])
                if prefixes is None:
                    continue
                mol = _build_parent_mol(parent)
                if mol is None:
                    continue
                chain_len = parent.length
                ok = True
                for loc, count, tok in prefixes:
                    if tok.startswith("("):
                        sub = _parse_complex_substituent(tok[1:-1])
                    else:
                        sub = _parse_substituent_name(tok)
                    if sub is None:
                        ok = False
                        break
                    locs = _default_locants(loc, count, parent, terminal=False)
                    if locs is None:
                        ok = False
                        break
                    for posn in locs:
                        if posn < 1 or posn > chain_len:
                            ok = False
                            break
                        try:
                            sub.attach(mol, posn - 1)
                        except ParseError:
                            ok = False
                            break
                    if not ok:
                        break
                if not ok:
                    continue
                try:
                    mol.validate()
                except ParseError:
                    continue
                return mol
    return None


# functional-class nomenclature: "<groups> <class word>" (P-66 style);
# class word -> (required group count, assembler)
_ESTER_RETAINED = {
    "acetate": "acetic acid",
    "formate": "formic acid",
    "benzoate": "benzoic acid",
}


def _parse_group_words(words: list[str]) -> list[_Substituent] | None:
    """Expand di/tri multipliers and parse each word as a substituent
    ('dimethyl' -> [methyl, methyl])."""
    out: list[_Substituent] = []
    for w in words:
        count = 1
        for mname, mval in _MULT.items():
            if w.startswith(mname) and _parse_substituent_name(w[len(mname):]):
                count = mval
                w = w[len(mname):]
                break
        sub = _parse_substituent_name(w)
        if sub is None:
            return None
        out.extend([sub] * count)
    return out


def _functional_class(name: str) -> Mol | None:
    """Ether / ketone / halide / cyanide / alcohol / ester functional-
    class names ('dimethyl ether', 'methyl ethyl ketone',
    'ethyl chloride', 'methyl ethanoate')."""
    words = name.split()
    if len(words) < 2:
        return None
    last = words[-1]
    simple = {
        "chloride": ("Cl", 1), "bromide": ("Br", 1), "iodide": ("I", 1),
        "fluoride": ("F", 1), "alcohol": ("O", 1), "ether": ("O", 2),
        "ketone": (None, 2), "cyanide": (None, 1),
    }
    if last in simple:
        groups = _parse_group_words(words[:-1])
        el, need = simple[last]
        if groups is None or len(groups) != need:
            return None
        mol = Mol()
        if last == "ketone":
            core = mol.add_atom("C")
            mol.add_bond(core, mol.add_atom("O"), 2)
        elif last == "cyanide":
            core = mol.add_atom("C")
            mol.add_bond(core, mol.add_atom("N"), 3)
        else:
            core = mol.add_atom(el)
        for g in groups:
            g.attach(mol, core)
        mol.validate()
        return mol
    # esters: "<alkyl> <acid-stem>oate" / retained acetate/formate
    if len(words) == 2 and (last.endswith("oate") or last in _ESTER_RETAINED):
        groups = _parse_group_words(words[:1])
        if groups is None or len(groups) != 1:
            return None
        acid_name = _ESTER_RETAINED.get(last, f"{last[:-3]}ic acid")
        acid = name_to_mol(acid_name)
        if acid is None:
            return None
        # the hydroxyl O of the carboxyl: degree-1 O on a C carrying =O
        for i, (el, _) in enumerate(acid.atoms):
            if el != "O":
                continue
            nbrs = acid.neighbors(i)
            if len(nbrs) == 1 and nbrs[0][1] == 1:
                c = nbrs[0][0]
                if acid.atoms[c][0] == "C" and any(
                    o == 2 and acid.atoms[j][0] == "O"
                    for j, o in acid.neighbors(c)
                ):
                    groups[0].attach(acid, i)
                    acid.validate()
                    return acid
    return None


def name_to_mol(name: str) -> Mol | None:
    name = name.strip().lower()
    if not name or len(name) > 200:
        return None
    if name in RETAINED_NAMES:
        return parse_smiles(RETAINED_NAMES[name])
    # multi-word names: two-word acids parse space-elided through the
    # substitutive grammar; everything else tries functional-class forms
    if " " in name and not name.endswith(" acid"):
        try:
            return _functional_class(name)
        except (ParseError, RecursionError):
            return None
    try:
        return _name_to_mol_core(name.replace(" ", ""))
    except (ParseError, RecursionError):
        return None


def name_to_smiles(name: str) -> str | None:
    """The OPSIN-shaped entry point: IUPAC name → canonical SMILES, or
    None when the name is outside the grammar (reference contract:
    OpsinStep.parseString returns no Mapping on parse failure)."""
    mol = name_to_mol(name)
    if mol is None:
        return None
    try:
        return canonical_smiles(mol)
    except ParseError:
        return None
