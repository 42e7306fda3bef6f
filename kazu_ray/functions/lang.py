"""Language phenomena tables: greek-letter names and unicode dash variants.

These are public linguistic facts (Unicode Greek block -> English letter
names; the Unicode dash family).  Same observable tables as the reference
(/root/reference/kazu/language/language_phenomena.py:1-57) — term_norm
parity depends on them.
"""

# Every Greek letter codepoint used in biomedical text mapped to its
# lowercase English name.  Includes the uppercase block, the lowercase
# block, and the common variant forms (ϐ ϑ ϕ ϴ) plus final sigma.
_UPPER = {
    "Α": "alpha", "Β": "beta", "Γ": "gamma", "Δ": "delta", "Ε": "epsilon",
    "Ζ": "zeta", "Η": "eta", "Θ": "theta", "Ι": "iota", "Κ": "kappa",
    "Λ": "lambda", "Μ": "mu", "Ν": "nu", "Ξ": "xi", "Ο": "omicron",
    "Π": "pi", "Ρ": "rho", "Σ": "sigma", "Τ": "tau", "Υ": "upsilon",
    "Φ": "phi", "Χ": "chi", "Ψ": "psi", "Ω": "omega", "ϴ": "theta",
}
_LOWER = {
    "α": "alpha", "ϐ": "beta", "β": "beta", "γ": "gamma", "δ": "delta",
    "ε": "epsilon", "ζ": "zeta", "η": "eta", "θ": "theta", "ι": "iota",
    "κ": "kappa", "λ": "lambda", "μ": "mu", "ν": "nu", "ξ": "xi",
    "ο": "omicron", "π": "pi", "ρ": "rho", "ς": "final sigma",
    "σ": "sigma", "τ": "tau", "υ": "upsilon", "φ": "phi", "ϕ": "phi",
    "χ": "chi", "ψ": "psi", "ω": "omega",
}
GREEK_TO_NAME: dict[str, str] = {**_UPPER, **_LOWER}

# ASCII hyphen-minus, Unicode minus sign, and the U+2010..U+2015 dash run
# (hyphen, non-breaking hyphen, figure dash, en dash, em dash, horizontal bar).
DASH_CHARS: frozenset[str] = frozenset({"−", "-"} | {chr(c) for c in range(0x2010, 0x2016)})
