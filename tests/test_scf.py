"""Host front-end tests: integrals, SCF, GHF conversion, ERI blocks."""

import numpy as np
import pytest

from ecw_cc_tpu.models.molecule import Molecule
from ecw_cc_tpu.models.scf import RHF, UHF, GHF
from ecw_cc_tpu.models.eris import build_eris


def test_h2o_631g_scf_matches_reference_anchor():
    # Reference doctest: EHF = -7.59839e+01 for h2o/6-31g (ref __init__.py:39)
    mol = Molecule("h2o", "6-31g")
    mf = RHF(mol)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - (-75.9839)) < 1e-3
    assert abs(e - (-75.98394849)) < 1e-6  # our own regression pin


def test_h2_sto3g():
    mol = Molecule("h2", "sto-3g")
    e = RHF(mol).kernel()
    assert abs(e - (-1.1167593)) < 1e-6


def test_integral_symmetries():
    mol = Molecule("h2o", "sto-3g")
    S = mol.intor("ovlp")
    T = mol.intor("kin")
    V = mol.intor("nuc")
    assert np.allclose(S, S.T, atol=1e-12)
    assert np.allclose(T, T.T, atol=1e-12)
    assert np.allclose(V, V.T, atol=1e-12)
    assert np.allclose(np.diag(S), 1.0, atol=1e-10)
    eri = mol.intor("int2e")
    # 8-fold symmetry of real (ij|kl)
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3), atol=1e-11)
    assert np.allclose(eri, eri.transpose(0, 1, 3, 2), atol=1e-11)
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1), atol=1e-11)


def test_ghf_conversion():
    mol = Molecule("h2o", "sto-3g")
    mf = RHF(mol)
    mf.kernel()
    ghf = GHF(mf)
    assert ghf.mo_coeff.shape == (2 * mol.nao, 2 * mol.nao)
    assert list(ghf.orbspin[:4]) == [0, 1, 0, 1]
    assert ghf.nocc == mol.nelectron
    # spin-orbital energies come in degenerate pairs
    assert np.allclose(ghf.mo_energy[0::2], ghf.mo_energy[1::2], atol=1e-9)
    # GHF rdm1 reproduces the RHF density (alpha block + beta block)
    dm_g = ghf.make_rdm1()
    nao = mol.nao
    assert np.allclose(dm_g[:nao, :nao] + dm_g[nao:, nao:], mf.make_rdm1(), atol=1e-9)


def test_eris_antisymmetry(h2o_sto3g):
    # reference Eris.py:232-235 symmetry identities
    _, _, eris, _ = h2o_sto3g
    assert np.allclose(eris.oovv, -eris.oovv.transpose(1, 0, 2, 3), atol=1e-11)
    assert np.allclose(eris.oovv, -eris.oovv.transpose(0, 1, 3, 2), atol=1e-11)
    assert np.allclose(eris.oovv, eris.oovv.transpose(1, 0, 3, 2), atol=1e-11)
    assert np.allclose(eris.vvvv, -eris.vvvv.transpose(1, 0, 2, 3), atol=1e-11)
    assert np.allclose(eris.oooo, eris.oooo.transpose(2, 3, 0, 1), atol=1e-11)


def test_mp2_energy(h2o_631g):
    """MP2 energy from the G-format blocks vs literature scale (sanity)."""
    _, ghf, eris, _ = h2o_631g
    e = ghf.mo_energy
    nocc = eris.nocc
    eia = e[:nocc, None] - e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    t2 = eris.oovv / eijab
    emp2 = 0.25 * np.einsum("ijab,ijab", t2, eris.oovv)
    # H2O/6-31G MP2 correlation energy ~ -0.128 Ha
    assert -0.16 < emp2 < -0.10


def test_hf_energy_from_eris(h2o_sto3g):
    """E_HF recomputed from fock diag + <ij||ij> must match SCF e_tot."""
    mol, ghf, eris, _ = h2o_sto3g
    nocc = eris.nocc
    e1 = ghf.mo_energy[:nocc].sum()
    e2 = -0.5 * np.einsum("ijij", eris.oooo)
    assert abs(e1 + e2 + mol.energy_nuc() - ghf.e_tot) < 1e-8


def test_uhf_o_atom():
    mol = Molecule([("O", (0, 0, 0))], "6-31g", spin=2)
    mf = UHF(mol)
    e = mf.kernel()
    assert mf.converged
    assert abs(e - (-74.7803)) < 1e-3


def test_dipole_integrals():
    mol = Molecule("h2o", "sto-3g")
    d = mol.intor("r")
    assert d.shape == (3, mol.nao, mol.nao)
    for c in range(3):
        assert np.allclose(d[c], d[c].T, atol=1e-11)


def test_eris_dir_cont_path(h2o_sto3g):
    """The direct-contraction ERI route equals the default spin-summed route
    (reference Eris.py __main__, :186-213)."""
    mol, ghf, eris, _ = h2o_sto3g
    eris2 = build_eris(mol, ghf, dir_cont=True)
    for name in ("oooo", "oovv", "vvvv", "ovvo", "voov"):
        assert np.allclose(getattr(eris, name), getattr(eris2, name), atol=1e-11)


def test_gexp_deform_and_underfit():
    from ecw_cc_tpu.models.molecule import Molecule
    from ecw_cc_tpu.models.gamma_exp import Gexp

    mol = Molecule("h2", "sto-3g")
    g = Gexp(mol, "HF")
    coords0 = g.mol_def.coords.copy()
    g.deform(0.05, rng=np.random.default_rng(0))
    assert not np.allclose(g.mol_def.coords, coords0)
    assert np.max(np.abs(g.mol_def.coords - coords0)) <= 0.05 + 1e-12
    g.build()
    n0 = np.sum(np.abs(g.gamma_ao) > 0)
    g.underfit(0.3, rng=np.random.default_rng(1))
    assert np.sum(np.abs(g.gamma_ao) > 0) < n0


def test_build_eris_device_matches_host(h2o_631g):
    """The on-device ERI transform (bench production path) must reproduce the
    host f64 builder block for block."""
    from ecw_cc_tpu.models.eris import build_eris_device, GEris

    mol, ghf, eris_host, _ = h2o_631g
    dev = build_eris_device(mol, ghf, dtype="float64")
    for f in GEris._fields:
        a = np.asarray(getattr(dev, f))
        b = np.asarray(getattr(eris_host, f))
        assert np.allclose(a, b, atol=1e-10), f


def test_6311_and_pvtz_basis_registry():
    """The 6-311G family and N/O cc-pVTZ resolve and give sane atomic AO
    counts (flagship reference configs, r1 VERDICT missing #1)."""
    from ecw_cc_tpu.models.basis_data import get_basis, BASIS

    for name in ("6-311g", "6-311g*", "6-311+g**", "6-311++g**",
                 "6-311++g(2d,2p)"):
        assert name in BASIS
        for el in ("H", "C", "N", "O"):
            get_basis(name, el)
    # AO counts: 6-311++G(2d,2p): H 4s+2p=10, C/N/O 5s+4p+2d=27 spherical
    def nao(name, el):
        return sum(2 * l + 1 for l, _ in get_basis(name, el))
    assert nao("6-311++g(2d,2p)", "H") == 10
    for el in ("C", "N", "O"):
        assert nao("6-311++g(2d,2p)", el) == 27
    # cc-pVTZ now covers N and O: 4s+3p+2d+1f = 30 spherical AOs
    for el in ("N", "O"):
        assert nao("cc-pvtz", el) == 30


def test_nh3_ccpvtz_rhf_converges():
    """N cc-pVTZ set works in a molecule (NH3 at near-equilibrium)."""
    geom = "N 0 0 0.117; H 0 0.937 -0.273; H 0.811 -0.468 -0.273; H -0.811 -0.468 -0.273"
    mol = Molecule(geom, "cc-pvtz")
    mf = RHF(mol)
    e = mf.kernel()
    assert mf.converged
    assert -56.3 < e < -56.1  # HF/cc-pVTZ NH3 ~ -56.22


def test_native_int1e_matches_numpy():
    """C++ one-electron integrals (overlap/kinetic/nuclear/dipole) equal the
    NumPy oracle on a system with s,p,d,f shells."""
    from ecw_cc_tpu import native
    from ecw_cc_tpu.models import integrals

    if not native.available():
        import pytest
        pytest.skip("no C++ toolchain")
    mol = Molecule("h2o", "cc-pvtz")  # exercises d and f shells
    bs = mol.bs
    charges, coords = mol.charges, mol.coords
    center = mol.charge_center()
    pairs = [
        ("overlap", native.compute_int1e(bs, "overlap"),
         integrals._one_electron(bs, "overlap")),
        ("kinetic", native.compute_int1e(bs, "kinetic"),
         integrals._one_electron(bs, "kinetic")),
        ("nuclear", native.compute_int1e(bs, "nuclear", charges=charges,
                                         coords=coords),
         integrals._one_electron(bs, "nuclear", charges=charges,
                                 coords=coords)),
        ("dipole", native.compute_int1e(bs, "dipole", origin=center),
         integrals._one_electron(bs, "dipole", center=center)),
    ]
    for name, a, b in pairs:
        assert np.allclose(a, b, atol=1e-12), name


def test_device_eris_f32_compensated_ill_conditioned():
    """The compensated transform (host-f64 S^{-1/2} half + device f32
    orthonormal half) must match the exact host f64 blocks to <= 1e-5
    max-abs even at an ill-conditioned diffuse basis — the regime where the
    r2 all-f32 two-stage scheme produced O(10x) errors and needed a ~2 min
    host fallback (r3 VERDICT item 4).  pack_ladder must agree too."""
    from ecw_cc_tpu.models.eris import GEris, build_eris, build_eris_device
    from ecw_cc_tpu.ops import ladder

    # H2O at the flagship's diffuse basis: cond(S) ~ 2e3 — big enough that
    # the r2 all-f32 two-stage left ~1e-4 absolute block errors; the
    # compensated transform must be ~100x tighter.  (The extreme
    # C2H2/6-311++G(2d,2p) case, cond(S)=7.5e5, is too heavy for the CPU
    # suite — it is exercised on the real chip by the flagship example and
    # was verified at <=1e-5 max-abs when this path landed.)
    mol = Molecule("h2o", "6-311++g(2d,2p)")
    mf = RHF(mol)
    mf.kernel()
    ghf = GHF(mf)
    host = build_eris(mol, ghf)
    er, packed = build_eris_device(mol, ghf, dtype="float32",
                                   pack_ladder=True)
    assert er.vvvv.size == 0
    for f in GEris._fields:
        if f == "vvvv":
            continue
        a = np.asarray(getattr(er, f), dtype=np.float64)
        b = np.asarray(getattr(host, f))
        assert np.max(np.abs(a - b)) < 3e-6, f
    ref_wc = np.asarray(ladder.pack_vvvv(host.vvvv).wc)
    assert np.max(np.abs(np.asarray(packed.wc, dtype=np.float64)
                         - ref_wc)) < 3e-6


def test_device_eris_f32_accurate_for_diffuse_basis():
    """The device ERI build must transform in f64 even when the requested
    block dtype is f32: an f32 transform catastrophically cancels for
    ill-conditioned diffuse bases (H2O/6-311++G(2d,2p) MP2 came out ~500x
    too small and CCSD diverged)."""
    import jax.numpy as jnp
    from ecw_cc_tpu.models.eris import build_eris_device, build_eris

    mol = Molecule("h2o", "6-311++g(2d,2p)")
    mf = RHF(mol)
    mf.kernel()
    ghf = GHF(mf)
    e64 = build_eris(mol, ghf).to_device(dtype="float64")
    e32 = build_eris_device(mol, ghf, dtype="float32")
    nocc = e64.nocc
    mo_e = np.diag(np.asarray(e64.fock))
    eia = mo_e[:nocc, None] - mo_e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]

    def emp2(er):
        t2 = np.asarray(er.oovv, dtype=np.float64) / eijab
        return 0.25 * np.einsum("ijab,ijab", t2, np.asarray(er.oovv,
                                                            dtype=np.float64))
    ref = emp2(e64)
    got = emp2(e32)
    assert abs(ref - got) < 1e-5 * abs(ref), (ref, got)


def test_g_shell_engines_match_and_rotation_invariant():
    """g-shell (l=4) support (r3 VERDICT next #8): the native C++ engine and
    the NumPy engine agree on every integral kind for a basis with a g
    shell, and the spectrum is invariant under rigid rotation (a wrong
    solid-harmonic combination would break the l=4 subspace)."""
    import os

    import scipy.spatial.transform as st

    from ecw_cc_tpu.models.integrals import (BasisSet, dipole, eri, kinetic,
                                             nuclear, overlap)

    basis = {"H": [(0, [(1.3, 1.0)]), (4, [(0.9, 1.0)])]}
    atoms = [("H", np.array([0.0, 0.0, 0.0])), ("H", np.array([0.0, 0.0, 1.4]))]
    bs = BasisSet(atoms, basis)
    charges = np.array([1.0, 1.0])
    coords = np.array([a[1] for a in atoms])
    ctr = np.zeros(3)

    Sn, Tn = overlap(bs), kinetic(bs)
    Vn, Dn, En = nuclear(bs, charges, coords), dipole(bs, ctr), eri(bs)
    os.environ["ECW_CC_TPU_NO_NATIVE"] = "1"
    try:
        pairs = ((Sn, overlap(bs)), (Tn, kinetic(bs)),
                 (Vn, nuclear(bs, charges, coords)), (Dn, dipole(bs, ctr)),
                 (En, eri(bs, native=False)))
    finally:
        del os.environ["ECW_CC_TPU_NO_NATIVE"]
    for a, b in pairs:
        assert np.max(np.abs(np.asarray(a) - np.asarray(b))) < 1e-10

    R = st.Rotation.from_euler("xyz", [0.3, 1.1, -0.7]).as_matrix()
    bs2 = BasisSet([(s, R @ x) for s, x in atoms], basis)
    w1 = np.linalg.eigvalsh(Sn)
    w2 = np.linalg.eigvalsh(overlap(bs2))
    assert np.max(np.abs(w1 - w2)) < 1e-11
    wT1 = np.sort(np.linalg.eigvals(np.linalg.solve(Sn, Tn)).real)
    wT2 = np.sort(np.linalg.eigvals(
        np.linalg.solve(overlap(bs2), kinetic(bs2))).real)
    assert np.max(np.abs(wT1 - wT2)) < 1e-10


def test_second_row_h2s_rhf_ccsd():
    """Second-row elements (r3 VERDICT next #8): the regenerated Na-Ar
    STO-3G-equivalent sets run RHF -> CCSD end-to-end (H2S near
    equilibrium; the variationally-optimized zetas give E at or below the
    published-set value, published STO-3G H2S RHF ~ -394.31)."""
    from ecw_cc_tpu.ops.ccsd_t import solve_ccsd

    geom = "S 0 0 0.1030; H 0 0.9616 -0.8239; H 0 -0.9616 -0.8239"
    mol = Molecule(geom, "sto-3g")
    mf = RHF(mol)
    e = mf.kernel()
    assert mf.converged
    assert -394.6 < e < -394.2
    ghf = GHF(mf)
    eris = build_eris(mol, ghf).to_device()
    t1, t2, e_cc = solve_ccsd(eris)
    assert -0.06 < float(e_cc) < -0.02


def test_second_row_registry_and_atoms():
    """Every Na-Ar STO-3G-equivalent set is registered (5 shells:
    1s, 2s, 2p, 3s, 3p) and ELEMENT_Z resolves the symbols."""
    from ecw_cc_tpu.models.basis_data import get_basis
    from ecw_cc_tpu.models.molecule import ELEMENT_Z

    for i, el in enumerate(("Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar")):
        assert ELEMENT_Z[el] == 11 + i
        shells = get_basis("sto-3g", el)
        assert [l for l, _ in shells] == [0, 0, 1, 0, 1]
        assert all(len(prims) == 3 for _, prims in shells)


def test_h2s_631gstar_ccsd_anchor():
    """Second-row polarized chemistry end-to-end (r4 VERDICT next #7):
    H2S/6-31G* (in-house regenerated S core, tools/regen_basis.py
    6-31g-row2 — general-contraction [4s,3p] + published d exponent 0.65)
    through RHF + CCSD + (T).  Energies pinned from the first converged
    run; the RHF sits 0.031 Ha BELOW the published-6-31G* value
    (-398.667), matching the S atomic core's variational headroom
    (-397.5038 vs published -397.471)."""
    from ecw_cc_tpu.models.molecule import Molecule
    from ecw_cc_tpu.models.scf import RHF, GHF
    from ecw_cc_tpu.models.eris import build_eris
    from ecw_cc_tpu.ops.ccsd_t import solve_ccsd, energy_t

    mol = Molecule("h2s", "6-31g*")
    assert mol.nao == 22                      # [4s,3p,1d] S + 2x [2s] H
    mf = RHF(mol)
    e = mf.kernel()
    assert abs(e - (-398.69775444)) < 1e-6
    eris = build_eris(mol, GHF(mf)).to_device()
    t1, t2, ec = solve_ccsd(eris, conv_tol=1e-9)
    assert abs(float(ec) - (-0.14214656)) < 1e-6
    et = float(energy_t(eris, t1, t2))
    assert abs(et - (-0.00290457)) < 1e-6
