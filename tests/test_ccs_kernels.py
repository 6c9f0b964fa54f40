"""CCS kernel validation against the determinant-space (FCI) oracle.

These tests validate the factorized CCS equations from first principles,
mirroring the reference's own oracle pattern (CCS.py __main__, :2591-2948)
but against an exact second-quantized construction instead of transcribed raw
equations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ecw_cc_tpu.ops import ccs
from ecw_cc_tpu.oracle import CCOracle
from tests.conftest import random_g_amp


@pytest.fixture(scope="module")
def system(h2_631g):
    mol, ghf, eris_host, eris_dev = h2_631g
    rng = np.random.default_rng(2)
    nocc, nvir = eris_host.nocc, eris_host.nvir
    ts = random_g_amp(rng, nocc, nvir, scale=1.0)
    ls = random_g_amp(rng, nocc, nvir, scale=1.0)
    # random symmetric 'fock' in interleaved-spin G format
    # (mirrors reference CCS.py:2636-2639)
    fr = rng.random((eris_host.fock.shape[0] // 2, eris_host.fock.shape[0] // 2))
    fr = fr + fr.T
    f = np.kron(0.5 * fr, np.eye(2))
    # build the oracle with the effective fock
    eri_full = _assemble_full_eri(eris_host)
    oracle = CCOracle(f, eri_full, nocc)
    return eris_host, eris_dev, oracle, ts, ls, f


def _assemble_full_eri(eris):
    no, nv = eris.nocc, eris.nvir
    nmo = no + nv
    eri = np.zeros((nmo, nmo, nmo, nmo))
    o, v = slice(0, no), slice(no, nmo)
    eri[o, o, o, o] = eris.oooo
    eri[o, o, o, v] = eris.ooov
    eri[o, o, v, o] = eris.oovo
    eri[o, o, v, v] = eris.oovv
    eri[o, v, o, v] = eris.ovov
    eri[o, v, v, o] = eris.ovvo
    eri[o, v, v, v] = eris.ovvv
    eri[o, v, o, o] = eris.ovoo
    eri[v, v, v, v] = eris.vvvv
    eri[v, o, o, o] = eris.vooo
    eri[v, o, v, o] = eris.vovo
    eri[v, o, o, v] = eris.voov
    eri[v, o, v, v] = eris.vovv
    eri[v, v, o, o] = eris.vvoo
    eri[v, v, v, o] = eris.vvvo
    # remaining blocks by permutational symmetry <pq||rs> = <rs||pq>
    eri[v, v, o, v] = np.transpose(eris.ovvv, (2, 3, 0, 1))
    return eri


def test_t1_equation_vs_oracle(system):
    eris_host, eris_dev, oracle, ts, ls, f = system
    hbar = oracle.hbar(ts)
    res_oracle = oracle.t1_residual(hbar, ts)
    res = np.asarray(ccs.T1eq(eris_dev, jnp.asarray(ts), jnp.asarray(f)))
    assert np.max(np.abs(res - res_oracle)) < 1e-10


def test_energy_vs_oracle(system):
    eris_host, eris_dev, oracle, ts, ls, f = system
    hbar = oracle.hbar(ts)
    e_oracle = oracle.energy(hbar)
    e = float(ccs.energy_ccs(eris_dev, jnp.asarray(ts), jnp.asarray(f)))
    assert abs(e - e_oracle) < 1e-10


def test_lambda1_commutator_vs_oracle(system):
    eris_host, eris_dev, oracle, ts, ls, f = system
    hbar = oracle.hbar(ts)
    res_oracle = oracle.lambda1_residual(hbar, ts, ls, commutator=True)
    res = np.asarray(ccs.L1eq(eris_dev, jnp.asarray(ts), jnp.asarray(ls),
                              jnp.asarray(f), E_term=False))
    assert np.max(np.abs(res - res_oracle)) < 1e-10


def test_lambda1_energy_term(system):
    """L1eq(E_term=True) = L1eq(False) - ls * E_corr (reference convention)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    hbar = oracle.hbar(ts)
    e_corr = oracle.energy(hbar)
    a = np.asarray(ccs.L1eq(eris_dev, jnp.asarray(ts), jnp.asarray(ls), jnp.asarray(f), E_term=True))
    b = np.asarray(ccs.L1eq(eris_dev, jnp.asarray(ts), jnp.asarray(ls), jnp.asarray(f), E_term=False))
    assert np.max(np.abs(a - (b - ls * e_corr))) < 1e-10


def test_stanton_equals_stasis_update(system):
    """Stanton vs Stasis intermediates give the same t1/l1 update
    (reference CCS.py:2673-2725)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    tsj, lsj, fj = jnp.asarray(ts), jnp.asarray(ls), jnp.asarray(f)
    up1 = ccs.tsupdate(eris_dev, tsj, ccs.T1inter(eris_dev, tsj, fj))
    up2 = ccs.tsupdate(eris_dev, tsj, ccs.T1inter_Stanton(eris_dev, tsj, fj))
    assert np.max(np.abs(np.asarray(up1 - up2))) < 1e-9
    lu1 = ccs.lsupdate(eris_dev, tsj, lsj, ccs.L1inter(eris_dev, tsj, fj, E_term=False))
    lu2 = ccs.lsupdate(eris_dev, tsj, lsj, ccs.L1inter_Stanton(eris_dev, tsj, fj))
    assert np.max(np.abs(np.asarray(lu1 - lu2))) < 1e-9


def test_l1_reg_alpha0_degenerate(system):
    """alpha=0 L1-regularized update equals the plain update
    (reference CCS.py:2727-2742)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    tsj, lsj, fj = jnp.asarray(ts), jnp.asarray(ls), jnp.asarray(f)
    T1i = ccs.T1inter(eris_dev, tsj, fj)
    plain = ccs.tsupdate(eris_dev, tsj, T1i)
    reg = ccs.tsupdate_L1(eris_dev, tsj, T1i, 0.0)
    assert np.max(np.abs(np.asarray(plain - reg))) < 1e-10
    L1i = ccs.L1inter(eris_dev, tsj, fj)
    plain = ccs.lsupdate(eris_dev, tsj, lsj, L1i)
    reg = ccs.lsupdate_L1(eris_dev, lsj, L1i, 0.0)
    assert np.max(np.abs(np.asarray(plain - reg))) < 1e-10


def test_rdm1_traces(system):
    """trace(gamma_GS) = nelec; transition rdm1 traceless in the GS->GS limit
    (reference CCS.py:2834-2842)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    nocc = eris_host.nocc
    g = np.asarray(ccs.gamma_unsym_CCS(jnp.asarray(ts) * 0.1, jnp.asarray(ls) * 0.1))
    assert abs(np.trace(g) - nocc) < 1e-10
    gs = np.asarray(ccs.gamma_CCS(jnp.asarray(ts) * 0.1, jnp.asarray(ls) * 0.1))
    assert abs(np.trace(gs) - nocc) < 1e-10
    assert np.allclose(gs, gs.T, atol=1e-12)


def test_gamma_es_gs_limit(system):
    """gamma_es with r=0, r0=1, l0=0 equals gamma_unsym (reference CCS.py:51-56)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    tsj, lsj = jnp.asarray(ts), jnp.asarray(ls)
    a = ccs.gamma_es_CCS(tsj, lsj, jnp.zeros_like(tsj), 1.0, 0.0)
    b = ccs.gamma_unsym_CCS(tsj, lsj)
    assert np.max(np.abs(np.asarray(a - b))) < 1e-12


def test_rdm1_oracle_expectation(system):
    """<Psi_l|E_pq|Psi_r>/<Psi_l|Psi_r> from the determinant oracle equals
    gamma_unsym (exact CCS bra/ket rdm1)."""
    eris_host, eris_dev, oracle, ts, ls, f = system
    nocc, nvir = ts.shape
    ts01, ls01 = 0.1 * ts, 0.05 * ls
    dim = oracle.space.dim
    ket0 = np.zeros(dim)
    ket0[oracle.ref] = 1.0
    U = oracle._expm_nilpotent(oracle.t_matrix(ts01))
    Uinv = oracle._expm_nilpotent(-oracle.t_matrix(ts01))
    ket = U @ ket0
    # bra = <0|(1+Lambda) e^-T
    bra = ket0.copy()
    for j in range(nocc):
        for b in range(nvir):
            if ls01[j, b] != 0.0:
                bra[oracle.singles_index(j, b)] += ls01[j, b] * oracle.singles_sign(j, b)
    bra = bra @ Uinv
    nmo = nocc + nvir
    g_oracle = np.zeros((nmo, nmo))
    for p in range(nmo):
        for q in range(nmo):
            g_oracle[p, q] = bra @ oracle.space.excitation_matrix(p, q) @ ket
    g = np.asarray(ccs.gamma_unsym_CCS(jnp.asarray(ts01), jnp.asarray(ls01)))
    assert np.max(np.abs(g - g_oracle)) < 1e-10
