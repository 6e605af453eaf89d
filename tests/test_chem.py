"""C7-C9 chemical-constant helper tests (ChemicalConst.scala capabilities)."""

from __future__ import annotations

import pytest

from stream_reader_mzxml_spark.functions import chem


def test_parse_formula():
    assert chem.parse_formula("C6H12O6") == {"C": 6, "H": 12, "O": 6}
    assert chem.parse_formula("CH4") == {"C": 1, "H": 4}
    # glucosinolate core (the reference's target family)
    assert chem.parse_formula("C10H17NO9S2") == {
        "C": 10, "H": 17, "N": 1, "O": 9, "S": 2,
    }


def test_monoisotopic_mass():
    # water: 2*1.0078250319 + 15.9949146221
    assert chem.monoisotopic_mass("H2O") == pytest.approx(18.0105646859, abs=1e-8)
    # glucose
    assert chem.monoisotopic_mass("C6H12O6") == pytest.approx(180.0633881, abs=1e-5)


def test_plus1_probability_scales_with_carbons():
    # ~1.07% per carbon: C10 ≈ 10.7% (to first order), monotone in n
    p1 = chem.plus1_probability("C1")
    p10 = chem.plus1_probability("C10")
    assert p1 == pytest.approx(0.0107, abs=1e-4)
    assert p10 > 9 * p1 * 0.9
    assert chem.plus1_probability("P4") == 0.0


def test_isotope_ratio_band():
    lo, hi = chem.isotope_ratio_band("C10H17NO9S2", rel_width=0.5)
    mid = chem.plus1_probability("C10H17NO9S2")
    assert lo == pytest.approx(mid * 0.5)
    assert hi == pytest.approx(mid * 1.5)
    assert lo < mid < hi
