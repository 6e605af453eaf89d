"""Chemical-constant helpers (SURVEY.md §2.8 C7-C9).

Deterministic, data-independent Python — these are broadcast constants in any
Spark plan, never per-row UDFs. Re-expressed from public atomic-mass /
isotope-abundance physics (values as in any chemistry handbook), with the
same *capabilities* as the reference's ``ChemicalConst.scala``:

- C7 — formula parsing: ``"C10H17NO9S2" → {C:10, H:17, N:1, O:9, S:2}``
  (regex ``([A-Z][a-z]?)(\\d*)``; reference: ChemicalConst.scala:103-111);
- C8 — monoisotopic mass: weighted sum over the element map
  (ChemicalConst.scala:48-50);
- C9 — isotope cluster distribution: probability of the M+1 peak from
  per-element heavy-isotope abundances, binomial first-order
  (ChemicalConst.scala:59-96).
"""

from __future__ import annotations

import re

# monoisotopic masses (u) and heavy-isotope (+1) natural abundances of the
# elements the reference handles — public CODATA/IUPAC values
MONO_MASS: dict[str, float] = {
    "C": 12.0,
    "H": 1.0078250319,
    "N": 14.0030740052,
    "O": 15.9949146221,
    "S": 31.97207069,
    "P": 30.97376151,
}
PLUS1_ABUNDANCE: dict[str, float] = {
    "C": 0.0107,  # 13C
    "H": 0.000115,  # 2H
    "N": 0.00368,  # 15N
    "O": 0.00038,  # 17O
    "S": 0.0076,  # 33S
    "P": 0.0,
}

# per-element isotope-abundance sequences [M, M+1, M+2, ...] at the precision
# the reference's band filters use (public natural-abundance values; same
# capability as ChemicalConst.scala:12-19 ``abundanceIsotope``) — these feed
# the isValidIsotope C/S envelopes (MainGlucosinolates.scala:181-191)
ABUNDANCE_ISOTOPE: dict[str, list[float]] = {
    "C": [1.0, 0.0108],
    "H": [1.0, 0.00012],
    "O": [1.0, 0.0004, 0.002],
    "S": [1.0, 0.00789, 0.0444],
    "N": [1.0, 0.0037],
    "Cl": [1.0, 0.0, 0.3198],
}

_FORMULA_RE = re.compile(r"([A-Z][a-z]?)(\d*)")


def parse_formula(formula: str) -> dict[str, int]:
    """C7 — ``"C6H12O6" → {"C": 6, "H": 12, "O": 6}``."""
    out: dict[str, int] = {}
    for elem, count in _FORMULA_RE.findall(formula):
        if not elem:
            continue
        out[elem] = out.get(elem, 0) + (int(count) if count else 1)
    return out


def monoisotopic_mass(formula: str | dict[str, int]) -> float:
    """C8 — weighted sum of monoisotopic masses over the element counts."""
    counts = parse_formula(formula) if isinstance(formula, str) else formula
    return sum(MONO_MASS[e] * n for e, n in counts.items())


def plus1_probability(formula: str | dict[str, int]) -> float:
    """C9 — P(exactly one atom is its +1 heavy isotope) ≈ the M+1/M peak
    ratio: ``Σ_e n_e · p_e · Π_f (1-p_f)^(n_f - [e==f])`` (first-order
    binomial over all atoms)."""
    counts = parse_formula(formula) if isinstance(formula, str) else formula
    p_none = 1.0
    for e, n in counts.items():
        p_none *= (1.0 - PLUS1_ABUNDANCE.get(e, 0.0)) ** n
    total = 0.0
    for e, n in counts.items():
        p = PLUS1_ABUNDANCE.get(e, 0.0)
        if p == 0.0 or n == 0:
            continue
        total += n * p / (1.0 - p) * p_none
    return total


def isotope_ratio_band(
    formula: str | dict[str, int], rel_width: float = 0.5
) -> tuple[float, float]:
    """C9 — the [low, high] acceptance band for an observed M+1/M intensity
    ratio (the reference's ``isValidIsotope`` abundance-band check,
    MainGlucosinolates.scala:181-191)."""
    r = plus1_probability(formula)
    return r * (1.0 - rel_width), r * (1.0 + rel_width)
