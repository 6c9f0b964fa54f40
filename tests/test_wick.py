"""Wick-generated raw CC equations (ops/wick.py).

The reference ships hand-transcribed raw CC equations including a CCSDT
set its solvers never use (CC_raw_equations.py:523-640); ops/wick.py
DERIVES them programmatically.  Certification chain:
  1. generated CCSD residuals == factorized Stanton kernels at RANDOM
     amplitudes (certifies the generator: contraction rules, signs,
     prefactors),
  2. the raw-equation Jacobi solver reproduces the factorized CCSD
     correlation energy,
  3. the generated CCSDT equations solve a 3-electron system to the FCI
     energy (CCSDT is exact there) — validating the triples equations
     against a non-CC oracle.
"""

import numpy as np
import pytest

from ecw_cc_tpu.ops import wick


@pytest.fixture(scope="module")
def h2o_small(h2o_sto3g):
    from tests.test_ccs_kernels import _assemble_full_eri

    mol, ghf, eris_host, eris = h2o_sto3g
    v = _assemble_full_eri(eris_host)
    f = np.asarray(eris_host.fock)
    return eris, f, v


def test_generated_ccsd_equals_factorized_at_random_amps(h2o_small):
    import jax.numpy as jnp
    from ecw_cc_tpu.ops import ccsd as ccsd_ops

    eris, f, v = h2o_small
    nocc, nvir = eris.nocc, eris.nvir
    rng = np.random.default_rng(0)
    t1 = rng.standard_normal((nocc, nvir)) * 0.05
    t2 = rng.standard_normal((nocc, nocc, nvir, nvir)) * 0.05
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = t2 - t2.transpose(0, 1, 3, 2)

    terms = {n: wick.generate_terms(n, t_levels=(1, 2)) for n in (0, 1, 2)}
    # raw term counts: expanded CCSD has E=3, S=16(14+f terms), D=~70
    assert len(terms[0]) == 3
    R1w = wick.evaluate_terms(terms[1], f, v, t1=t1, t2=t2)
    R2w = wick.evaluate_terms(terms[2], f, v, t1=t1, t2=t2)
    Ew = wick.evaluate_terms(terms[0], f, v, t1=t1, t2=t2)
    R1s, R2s = ccsd_ops.tupdate(eris, jnp.asarray(t1), jnp.asarray(t2),
                                equation=True)
    Es = ccsd_ops.energy(eris, jnp.asarray(t1), jnp.asarray(t2), None)
    assert abs(float(Ew) - float(Es)) < 1e-12
    assert np.max(np.abs(R1w - np.asarray(R1s))) < 1e-12
    assert np.max(np.abs(R2w - np.asarray(R2s))) < 1e-12


def test_raw_ccsd_solver_matches_factorized(h2o_small):
    from ecw_cc_tpu.ops import ccsd_t

    eris, f, v = h2o_small
    _, e2 = wick.solve_raw_cc(f, v, eris.nocc, levels=(1, 2),
                              conv_tol=1e-11, max_cycle=300)
    _, _, e_ref = ccsd_t.solve_ccsd(eris, conv_tol=1e-12)
    assert abs(e2 - e_ref) < 1e-9


def test_ccsdt_exact_for_three_electrons(h2o_small):
    """The generated CCSDT equations must reproduce FCI for a 3-electron
    system (max excitation = 3).  Reference uses the H2O/STO-3G spin-orbital
    basis with a 3-electron Fermi vacuum, SEMICANONICALIZED (diagonal
    f_oo/f_vv; f_ov stays nonzero and large, so the f_ov singles terms of
    the generated equations are genuinely exercised)."""
    from ecw_cc_tpu.oracle import CCOracle

    eris, f10, v = h2o_small
    nocc = 3
    occ_rest = np.arange(3, 10)
    fsp = f10 - np.einsum("piqi->pq", v[:, occ_rest][:, :, :, occ_rest])
    U = np.zeros_like(fsp)
    _, Uo = np.linalg.eigh(fsp[:nocc, :nocc])
    _, Uv = np.linalg.eigh(fsp[nocc:, nocc:])
    U[:nocc, :nocc] = Uo
    U[nocc:, nocc:] = Uv
    fsp_c = U.T @ fsp @ U
    v_c = np.einsum("pqrs,pi,qj,rk,sl->ijkl", v, U, U, U, U, optimize=True)
    assert np.max(np.abs(fsp_c[:nocc, nocc:])) > 0.1  # non-Brillouin

    oracle = CCOracle(fsp_c, v_c, nocc)
    wE = np.linalg.eigvalsh(oracle.H)
    E_fci_corr = wE[0] - oracle.E_ref

    _, e2 = wick.solve_raw_cc(fsp_c, v_c, nocc, levels=(1, 2),
                              conv_tol=1e-11, max_cycle=500, damp=0.2)
    _, e3 = wick.solve_raw_cc(fsp_c, v_c, nocc, levels=(1, 2, 3),
                              conv_tol=1e-11, max_cycle=500, damp=0.2)
    assert abs(e2 - E_fci_corr) > 1e-8      # CCSD is NOT exact here
    assert abs(e3 - E_fci_corr) < 1e-10     # CCSDT is
