"""Property evaluators, structure factors, TDHF/CIS, Davidson tests."""

import numpy as np
import pytest

from ecw_cc_tpu.models import tdscf
from ecw_cc_tpu.utils import props, linalg
from ecw_cc_tpu.oracle import CCOracle
from tests.test_ccs_kernels import _assemble_full_eri


def test_cis_vs_fci_singles_block(h2_631g):
    """CIS energies = eigenvalues of H projected on the singles space."""
    mol, ghf, eris_host, eris_dev = h2_631g
    es, X = tdscf.cis(eris_host, ghf.mo_energy, nroots=4)
    oracle = CCOracle(np.asarray(eris_host.fock), _assemble_full_eri(eris_host),
                      eris_host.nocc)
    nocc, nvir = eris_host.nocc, eris_host.nvir
    # H matrix in the singles block (phase-corrected)
    idx = []
    signs = []
    for i in range(nocc):
        for a in range(nvir):
            idx.append(oracle.singles_index(i, a))
            signs.append(oracle.singles_sign(i, a))
    idx = np.array(idx)
    signs = np.array(signs, dtype=float)
    Hs = oracle.H[np.ix_(idx, idx)] * signs[:, None] * signs[None, :]
    w = np.linalg.eigvalsh(Hs - oracle.E_ref * np.eye(len(idx)))
    assert np.allclose(np.sort(es), np.sort(w)[: len(es)], atol=1e-9)


def test_tdhf_below_cis(h2_631g):
    mol, ghf, eris_host, _ = h2_631g
    e_cis, _ = tdscf.cis(eris_host, ghf.mo_energy, nroots=3)
    e_rpa, X, Y = tdscf.tdhf(eris_host, ghf.mo_energy, nroots=3)
    assert e_rpa[0] <= e_cis[0] + 1e-10
    assert np.all(e_rpa > 0)


def test_get_init_r(h2_631g):
    mol, ghf, eris_host, _ = h2_631g
    r_ini, tdms, es = tdscf.get_init_r(mol, ghf, eris_host, roots=4)
    assert r_ini.shape == (eris_host.nocc, eris_host.nvir)
    assert tdms.shape[1] == 3
    assert np.all(es > 0)


def test_davidson_nosym():
    rng = np.random.default_rng(3)
    n = 60
    A = np.diag(np.arange(1.0, n + 1)) + 0.01 * rng.standard_normal((n, n))
    x0 = [np.eye(n)[0], np.eye(n)[1]]
    conv, w, xs = linalg.davidson_nosym(lambda v: A @ v, x0, np.diag(A),
                                        nroots=2, tol=1e-9)
    w_exact = np.sort(np.linalg.eigvals(A).real)[:2]
    assert np.allclose(np.sort(w), w_exact, atol=1e-7)
    assert all(conv)


def test_structure_factor_k0_limit(h2o_sto3g):
    """F(k -> 0) must equal the electron count (FT of the density)."""
    mol, ghf, eris_host, _ = h2o_sto3g
    rdm1_ao = ghf.make_rdm1()
    F = props.structure_factor(
        mol, [[1e-8, 0.0, 0.0]], rdm1_ao, mo_coeff=ghf.mo_coeff, g=True,
        aobasis=True, rec_vec=np.array([2 * np.pi, 2 * np.pi, 2 * np.pi]))
    assert abs(F[0].real - mol.nelectron) < 1e-6


def test_structure_factor_vexp(h2o_sto3g):
    """'F' targets flow through the host Vexp engine (exp_pot.py:324-341)."""
    from ecw_cc_tpu.ops.vexp import Exp

    mol, ghf, eris_host, _ = h2o_sto3g
    rdm1_ao = ghf.make_rdm1()
    h = [[1, 1, 1], [0, 1, 1], [1, 0, 1]]
    rec = [10.0, 10.0, 10.0]
    F_target = props.structure_factor(mol, h, rdm1_ao, mo_coeff=ghf.mo_coeff,
                                      g=True, aobasis=True,
                                      rec_vec=np.asarray(rec))
    exp_data = [[["F", F_target, h, np.asarray(rec)]]]
    VX = Exp(0.1, exp_data, mol, ghf.mo_coeff)
    rdm1_mo = np.diag(ghf.mo_occ)  # the HF rdm1 in MO basis
    Delta, vmax = VX.Vexp_update(rdm1_mo, rdm1_mo, (0, 0))
    # the HF MO rdm1 reproduces the HF-density structure factors -> Delta ~ 0
    assert abs(Delta) < 1e-8
    assert np.max(np.abs(VX.Vexp[0, 0])) < 1e-8


def test_ekin_v1e_dipole_hf_consistency(h2o_sto3g):
    """Ek + v1e + 2e-energy + E_nuc == E_HF for the HF density."""
    mol, ghf, eris_host, _ = h2o_sto3g
    dm = ghf.make_rdm1()
    ek = props.Ekin(mol, dm, aobasis=True, g=True)
    v1 = props.v1e(mol, dm, aobasis=True, g=True)
    # 2e energy from the MO eris: 0.5 sum_ij <ij||ij>
    e2 = 0.5 * np.einsum("ijij", eris_host.oooo)
    assert abs(ek + v1 + e2 + mol.energy_nuc() - ghf.e_tot) < 1e-8


def test_u_format_coefficient_converters():
    """The U/R/G MO-coefficient converters (reference utilities.py:246-310
    — the reference's own U_format branch raises NotImplementedError at
    Main.py:151, but the converters are part of its utilities surface):
    round-trip identities, orthonormality preservation, and the spin
    interleaving convention [0,1,0,1]."""
    import numpy as np

    from ecw_cc_tpu.utils.convert import (convert_g_to_r_coeff,
                                          convert_r_to_g_coeff,
                                          convert_u_to_g_coeff,
                                          convert_u_to_g_moc)

    rng = np.random.default_rng(0)
    n = 6
    C, _ = np.linalg.qr(rng.standard_normal((n, n)))
    G = convert_r_to_g_coeff(C)
    assert G.shape == (2 * n, 2 * n)
    # orthonormal R -> orthonormal G
    assert np.allclose(G.T @ G, np.eye(2 * n), atol=1e-12)
    # round trip
    assert np.allclose(convert_g_to_r_coeff(G), C, atol=1e-15)
    # alpha rows feed even columns only, beta rows odd columns only
    assert np.allclose(G[:n, 1::2], 0.0) and np.allclose(G[n:, 0::2], 0.0)

    Cb, _ = np.linalg.qr(rng.standard_normal((n, n)))
    Gu = convert_u_to_g_coeff((C, Cb))
    assert np.allclose(Gu[:n, 0::2], C) and np.allclose(Gu[n:, 1::2], Cb)
    assert np.allclose(Gu.T @ Gu, np.eye(2 * n), atol=1e-12)
    # equal-spin U collapses to the R->G result
    assert np.allclose(convert_u_to_g_coeff((C, C)), G)

    moa = np.array([1.0, 1.0, 0.0])
    mob = np.array([1.0, 0.0, 0.0])
    mg = convert_u_to_g_moc((moa, mob))
    assert np.allclose(mg, [1, 1, 1, 0, 0, 0])
