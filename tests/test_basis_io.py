"""Gaussian94/EMSL basis-file reader tests (models/basis_io.py).

The snippet below is the EMSL Basis Set Exchange "Gaussian" export format
(comments, ****-separators, SP fused shells, Fortran D-exponents); the
H/O values are the published STO-3G / 6-31G rows already embedded in
models/basis_data.py, so the parse is checked against them exactly."""

import numpy as np
import pytest

from ecw_cc_tpu.models import basis_data
from ecw_cc_tpu.models.basis_io import (format_gaussian94, parse_gaussian94)

EMSL_SNIPPET = """\
! STO-3G  EMSL basis set exchange
! Elements: H
****
H     0
S    3   1.00
      0.3425250914D+01       0.1543289673D+00
      0.6239137298D+00       0.5353281423D+00
      0.1688554040D+00       0.4446345422D+00
****
O     0
S    6   1.00
      5484.6717000              0.0018311
       825.2349500              0.0139501
       188.0469600              0.0684451
        52.9645000              0.2327143
        16.8975700              0.4701930
         5.7996353              0.3585209
SP   3   1.00
        15.5396160             -0.1107775              0.0708743
         3.5999336             -0.1480263              0.3397528
         1.0137618              1.1307670              0.7271586
SP   1   1.00
         0.2700058              1.0000000              1.0000000
****
"""


def test_parse_emsl_snippet():
    table = parse_gaussian94(EMSL_SNIPPET)
    assert set(table) == {"H", "O"}
    # H: one s shell, published STO-3G values
    (l, prims), = table["H"]
    assert l == 0
    ref = basis_data.STO_3G["H"][0][1]
    assert np.allclose(prims, ref, rtol=1e-9)
    # O: SP shells split into s and p with SHARED exponents
    shells = table["O"]
    ls = [sh[0] for sh in shells]
    assert ls == [0, 0, 1, 0, 1]
    sp_s, sp_p = shells[1], shells[2]
    assert [e for e, _ in sp_s[1]] == [e for e, _ in sp_p[1]]
    assert sp_s[1][2][1] == pytest.approx(1.1307670)
    assert sp_p[1][2][1] == pytest.approx(0.7271586)
    # matches the embedded 6-31G O rows
    ref_o = basis_data.BASIS["6-31g"]["O"]
    for got, ref_sh in zip(shells, ref_o):
        assert got[0] == ref_sh[0]
        assert np.allclose(got[1], ref_sh[1], rtol=1e-6)


def test_roundtrip_through_writer():
    table = {"C": basis_data.BASIS["cc-pvdz"]["C"]}
    back = parse_gaussian94(format_gaussian94(table))
    assert set(back) == {"C"}
    for (l1, p1), (l2, p2) in zip(table["C"], back["C"]):
        assert l1 == l2
        assert np.allclose(p1, p2, rtol=1e-9)


def test_parse_errors():
    with pytest.raises(ValueError, match="element header"):
        parse_gaussian94("S    3   1.00\n  1.0 1.0\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_gaussian94("H 0\nS 3 1.00\n 1.0 1.0\n")
    with pytest.raises(ValueError, match="no basis data"):
        parse_gaussian94("! only comments\n")


def test_get_basis_from_file(tmp_path):
    """A basis FILE path through the public get_basis/Molecule surface:
    H2 in file-loaded STO-3G == the embedded set."""
    from ecw_cc_tpu.models.molecule import Molecule
    from ecw_cc_tpu.models.scf import RHF

    p = tmp_path / "mybasis.gbs"
    p.write_text(EMSL_SNIPPET)
    got = basis_data.get_basis(str(p), "H")
    assert np.allclose(got[0][1], basis_data.STO_3G["H"][0][1], rtol=1e-9)

    mol_f = Molecule("H 0 0 0\nH 0 0 0.74", str(p))
    mol_e = Molecule("H 0 0 0\nH 0 0 0.74", "sto-3g")
    ef = RHF(mol_f); ef.kernel()
    ee = RHF(mol_e); ee.kernel()
    # snippet carries 10-digit D-exponent values vs the embedded 8-digit
    # rows -> tiny energy offset
    assert abs(ef.e_tot - ee.e_tot) < 1e-8
