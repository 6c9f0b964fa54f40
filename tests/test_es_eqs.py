"""Identities among the R0/L0 equation variants (reference CCS.py:987-1518)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ecw_cc_tpu.ops import ccs
from tests.conftest import random_g_amp


@pytest.fixture(scope="module")
def system(h2o_sto3g):
    mol, ghf, eris_host, eris_dev = h2o_sto3g
    rng = np.random.default_rng(11)
    nocc, nvir = eris_host.nocc, eris_host.nvir
    ts = jnp.asarray(random_g_amp(rng, nocc, nvir, scale=0.1))
    rs = jnp.asarray(random_g_amp(rng, nocc, nvir, scale=0.3))
    ls = jnp.asarray(random_g_amp(rng, nocc, nvir, scale=0.3))
    dim = nocc + nvir
    vm = rng.standard_normal((dim, dim)) * 0.01
    vm = jnp.asarray(vm + vm.T)
    return eris_dev, ts, rs, ls, vm


def test_r0_consistency(system):
    """r0_fromE(Em) equals the fixed point of r0update at energy Em:
    r0 (Em - E) = F + P  (CCS.py:1081-1158)."""
    eris, ts, rs, ls, vm = system
    Em = 0.4
    R0i = ccs.R0inter(eris, ts, None, vm)
    Fjb, E, P = R0i
    F = float(jnp.einsum("jb,jb", rs, Fjb))
    r0_fix = (F + float(P)) / (Em - float(E))
    # r0_fromE uses v = -vm convention internally (P enters with +vm in
    # R0inter but -vm in r0_fromE; reference CCS.py:1029-1033 vs 1133-1155)
    r0_alt = float(ccs.r0_fromE(eris, Em, ts, rs, -vm, fsp=None))
    assert abs(r0_fix - r0_alt) < 1e-10


def test_r0update_converges_to_fixed_point(system):
    eris, ts, rs, ls, vm = system
    Em = 0.4
    R0i = ccs.R0inter(eris, ts, None, vm)
    r0 = 0.1
    for _ in range(200):
        r0 = float(ccs.r0update(rs, r0, Em, R0i))
    Fjb, E, P = R0i
    assert abs(r0 * Em - (float(jnp.einsum("jb,jb", rs, Fjb)) + float(P)
                          + r0 * float(E))) < 1e-10


def test_l0_consistency(system):
    """l0_fromE(Em) equals the fixed point of l0update:
    l0 (Em - Z) = F + W + P  (CCS.py:1423-1518)."""
    eris, ts, rs, ls, vm = system
    Em = 0.4
    L0i = ccs.L0inter(eris, ts, None, vm)
    Fbj, Wjb, Z, P = L0i
    F = float(jnp.einsum("jb,bj", ls, Fbj))
    W = float(jnp.einsum("jb,jb", ls, Wjb))
    l0_fix = (F + W + float(P)) / (Em - float(Z))
    l0_alt = float(ccs.l0_fromE(eris, Em, ts, ls, vm, fsp=None))
    assert abs(l0_fix - l0_alt) < 1e-9


def test_R0eq_L0eq_values(system):
    eris, ts, rs, ls, vm = system
    R0i = ccs.R0inter(eris, ts, None, vm)
    val = float(ccs.R0eq(rs, 0.2, R0i))
    Fjb, E, P = R0i
    assert abs(val - (float(jnp.einsum("jb,jb", rs, Fjb)) + 0.2 * float(E)
                      + float(P))) < 1e-12
    L0i = ccs.L0inter(eris, ts, None, vm)
    val = float(ccs.L0eq(ls, 0.2, L0i))
    Fbj, Wjb, Z, P2 = L0i
    assert abs(val - (float(jnp.einsum("jb,bj", ls, Fbj))
                      + float(jnp.einsum("jb,jb", ls, Wjb))
                      + 0.2 * float(Z) + float(P2))) < 1e-12


def test_extract_r0_l0_quadratic(system):
    """Extract_r0/Extract_l0 solve the Em-eliminated quadratic: the returned
    amplitude must satisfy BOTH the R1(L1)-derived and R0(L0)-derived
    energies simultaneously."""
    eris, ts, rs, ls, vm = system
    r0 = ccs.Extract_r0(eris, rs, ts, None, vm)
    # Em from R0 with this r0 must equal Em from R1 at the largest element
    R0i = ccs.R0inter(eris, ts, None, vm)
    Fjb, E, P = R0i
    Em_r0 = (float(jnp.einsum("jb,jb", rs, Fjb)) + float(P)) / r0 + float(E)
    Rinter = ccs.R1inter(eris, ts, None, vm)
    Em_r1, o, v = ccs.Extract_Em_r(eris, rs, r0, Rinter)
    assert abs(Em_r0 - float(Em_r1)) < 1e-8

    l0 = ccs.Extract_l0(eris, ls, ts, None, vm)
    L0i = ccs.L0inter(eris, ts, None, vm)
    Fbj, Wjb, Z, P0 = L0i
    Em_l0 = (float(jnp.einsum("jb,bj", ls, Fbj))
             + float(jnp.einsum("jb,jb", ls, Wjb)) + float(P0)) / l0 + float(Z)
    Li = ccs.es_L1inter(eris, ts, None, vm)
    Em_l1, o, v = ccs.Extract_Em_l(eris, ls, l0, Li)
    assert abs(Em_l0 - float(Em_l1)) < 1e-8
