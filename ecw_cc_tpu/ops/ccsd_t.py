"""CCSD(T): perturbative triples energy + response density (JAX).

Replaces the reference's use of pyscf ccsd_t_lambda_slow / ccsd_t_rdm_slow
for CCSD(T) target densities (reference gamma_exp.py:228-248).

Energy: the standard spin-orbital (T) correction
    D_ijkabc = f_ii + f_jj + f_kk - f_aa - f_bb - f_cc
    t3c = P(i/jk) P(a/bc) [ t2_jkae <ei||bc> - t2_imbc <ma||jk> ] / D
    t3d = P(i/jk) P(a/bc) [ t1_ia <jk||bc> ] / D
    E_T = 1/36 sum t3c * D * (t3c + t3d)
(Raghavachari et al. 1989; spin-orbital form as in Crawford & Schaefer's
review).  The full t3 tensor is materialized — fine for the target-generation
molecule sizes; block over i for larger systems.

Density: instead of transcribing the Lambda-CCSD(T) equations, the unrelaxed
response density gamma_pq = dE_CCSD(T)/df_pq is computed EXACTLY by the
implicit-function theorem with JAX vjps:
    solve J(t)^T lam = -dE/dt   (GMRES, Jacobi-preconditioned by eia/eijab)
    gamma = dE/df + lam^T dR/df + HF diagonal
This is the same mathematical object pyscf's hand-derived
ccsd_t_lambda_slow + ccsd_t_rdm_slow produce (the Lambda-CCSD(T) gradient
density), obtained through functional transforms — and is verified against
finite differences in tests/test_ccsd_t.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ecw_cc_tpu.ops import ccsd as ccsd_ops

einsum = jnp.einsum


def _p_i_jk(x):
    """P(i/jk) f(i,j,k,...) = f - f(i<->j) - f(i<->k) on the first 3 axes."""
    return x - jnp.swapaxes(x, 0, 1) - jnp.swapaxes(x, 0, 2)


def _p_a_bc(x):
    """P(a/bc) on axes 3,4,5."""
    return x - jnp.swapaxes(x, 3, 4) - jnp.swapaxes(x, 3, 5)


def _t3_pieces(eris, t1, t2, fsp):
    nocc, nvir = t1.shape
    f = eris.fock if fsp is None else fsp
    fo = jnp.diag(f)[:nocc]
    fv = jnp.diag(f)[nocc:]
    D = (fo[:, None, None, None, None, None] + fo[None, :, None, None, None, None]
         + fo[None, None, :, None, None, None] - fv[None, None, None, :, None, None]
         - fv[None, None, None, None, :, None] - fv[None, None, None, None, None, :])
    # connected: W_ijkabc = P(i/jk)P(a/bc)[ t2_jkae <ei||bc> - t2_imbc <ma||jk> ]
    w = einsum("jkae,eibc->ijkabc", t2, eris.vovv)
    w = w - einsum("imbc,majk->ijkabc", t2, eris.ovoo)
    w = _p_a_bc(_p_i_jk(w))
    t3c = w / D
    # disconnected: t1_ia <jk||bc>
    v = einsum("ia,jkbc->ijkabc", t1, eris.oovv)
    v = _p_a_bc(_p_i_jk(v))
    t3d = v / D
    return t3c, t3d, D, w


def _energy_t_dense(eris, t1, t2, fsp=None):
    """(T) with the full t3 materialized — O(o^3 v^3) memory; cross-check
    oracle for the scan path on tiny systems."""
    t3c, t3d, D, w = _t3_pieces(eris, t1, t2, fsp)
    return einsum("ijkabc,ijkabc", w, t3c + t3d) / 36.0


def energy_t(eris, t1, t2, fsp=None):
    """The (T) energy correction, scanned over (i,j) occupied pairs.

    The full t3 tensor is O(o^3 v^3) — 26 GB at C2H2/6-311++G(2d,2p) f32 —
    so the permutation operators are expanded per (i,j) slab: each scan step
    holds only (o, v, v, v) work arrays (~134 MB there).  The body is
    rematerialized (jax.checkpoint) so the response-density vjp does not
    store per-step slabs either."""
    nocc, nvir = t1.shape
    f = eris.fock if fsp is None else fsp
    fo = jnp.diag(f)[:nocc]
    fv = jnp.diag(f)[nocc:]
    vovv, ovoo, oovv = eris.vovv, eris.ovoo, eris.oovv
    Dk = (fo[:, None, None, None]
          - fv[None, :, None, None] - fv[None, None, :, None]
          - fv[None, None, None, :])

    def pabc(x):  # P(a/bc) on axes 1,2,3 of (k,a,b,c)
        return x - jnp.swapaxes(x, 1, 2) - jnp.swapaxes(x, 1, 3)

    @jax.checkpoint
    def body(acc, ij):
        I, J = ij // nocc, ij % nocc
        t2I = jnp.take(t2, I, axis=0)          # (o, v, v)... (m,b,c) etc.
        t2J = jnp.take(t2, J, axis=0)
        vovvI = jnp.take(vovv, I, axis=1)      # (v, v, v) = (e, b, c)
        vovvJ = jnp.take(vovv, J, axis=1)
        ovooJ = jnp.take(ovoo, J, axis=2)      # (o, v, o) = (m, a, k)
        ovooI = jnp.take(ovoo, I, axis=2)
        # P(i/jk) W0 evaluated at (I, J, k), per-(k,a,b,c):
        #   W0[i,j,k] = t2[j,k,a,e] <ei||bc> - t2[i,m,b,c] <ma||jk>
        A = (einsum("kae,ebc->kabc", t2J, vovvI)
             - einsum("mbc,mak->kabc", t2I, ovooJ))
        B = (einsum("kae,ebc->kabc", t2I, vovvJ)
             - einsum("mbc,mak->kabc", t2J, ovooI))
        C = (einsum("ae,ekbc->kabc", t2J[I], vovv)
             - einsum("kmbc,ma->kabc", t2, ovoo[:, :, J, I]))
        w = pabc(A - B - C)
        # P(i/jk) [t1_ia <jk||bc>] at (I, J, k)
        v0 = (einsum("a,kbc->kabc", t1[I], oovv[J])
              - einsum("a,kbc->kabc", t1[J], oovv[I])
              - einsum("ka,bc->kabc", t1, oovv[J, I]))
        v = pabc(v0)
        D = fo[I] + fo[J] + Dk
        return acc + jnp.sum(w * (w + v) / D), None

    acc, _ = jax.lax.scan(body, jnp.asarray(0.0, t1.dtype),
                          jnp.arange(nocc * nocc))
    return acc / 36.0


def _update_map_and_energy(eris, tvec, fvec, nocc, nvir, with_t=True,
                           vvvv_op=None):
    """The SCF update map G(t; f) (flattened) and E = E_CCSD (+ E_T).

    The fixed point t* = G(t*, f) defines the amplitudes; using the MAP (not
    the residual) keeps the implicit-function Jacobian (I - dG/dt)
    nonsingular: the residual form has a singular Jacobian because the t2
    antisymmetry makes its constraint rows redundant.

    vvvv_op: optional non-dense ladder operand (pack-on-build ERIs).  Safe
    under the adjoint solve: the packed map agrees with the dense one on
    antisymmetric t2 and both maps' t2 outputs are antisymmetric by
    construction, so they share the same fixed-point branch t*(f) — the
    implicit gradient is identical."""
    dim = nocc + nvir
    f = fvec.reshape(dim, dim)
    n1 = nocc * nvir
    t1 = tvec[:n1].reshape(nocc, nvir)
    t2 = tvec[n1:].reshape(nocc, nocc, nvir, nvir)
    G1, G2 = ccsd_ops.tupdate(eris, t1, t2, fsp=f, vvvv_op=vvvv_op)
    E = ccsd_ops.energy(eris, t1, t2, f)
    if with_t:
        E = E + energy_t(eris, t1, t2, f)
    return jnp.concatenate([G1.ravel(), G2.ravel()]), E


def ccsd_t_rdm1_response(eris, t1, t2, fsp=None, with_t=True, tol=1e-10,
                         maxiter=300, vvvv_op=None):
    """Unrelaxed response density of E_CCSD(+T) in the MO G basis (with the
    HF diagonal added), via adjoint implicit differentiation of the SCF
    fixed-point map:
        (I - dG/dt)^T w = dE/dt   (fixed-point iteration + DIIS)
        gamma = dE/df + w^T dG/df
    """
    nocc, nvir = t1.shape
    dim = nocc + nvir
    f0 = (eris.fock if fsp is None else fsp).ravel()
    tvec = jnp.concatenate([jnp.ravel(t1), jnp.ravel(t2)])

    # all jitted pieces take eris/tvec/f0 as ARGUMENTS (axon remote-compile
    # gotcha: closure-captured device arrays ship with the program); the
    # linearization happens inside the jit, traced once per compile
    @partial(jax.jit, static_argnames=("wt",))
    def grad_E(er, vs, tv, fv, wt):
        gE_t = jax.grad(lambda a, b: _update_map_and_energy(
            er, a, b, nocc, nvir, wt, vs)[1], argnums=0)(tv, fv)
        gE_f = jax.grad(lambda a, b: _update_map_and_energy(
            er, a, b, nocc, nvir, wt, vs)[1], argnums=1)(tv, fv)
        return gE_t, gE_f

    @partial(jax.jit, static_argnames=("wt",))
    def matvec_t(er, vs, tv, fv, v, wt):
        _, vjp = jax.vjp(lambda a: _update_map_and_energy(
            er, a, fv, nocc, nvir, wt, vs)[0], tv)
        return vjp(v)[0]

    @partial(jax.jit, static_argnames=("wt",))
    def vjp_fock(er, vs, tv, fv, v, wt):
        _, vjp = jax.vjp(lambda b: _update_map_and_energy(
            er, tv, b, nocc, nvir, wt, vs)[0], fv)
        return vjp(v)[0]

    dE_dt, dE_df = grad_E(eris, vvvv_op, tvec, f0, with_t)

    # w = dE/dt + (dG/dt)^T w  — same contraction structure as the Lambda
    # equations; fixed-point iteration with ON-DEVICE DIIS (only the norm
    # scalar crosses the tunnel per iteration)
    from ecw_cc_tpu.ops import diis as diis_ops

    @jax.jit
    def _w_step(er, vs, tv, fv, b, w, dstate):
        # b (= dE/dt) as an ARGUMENT: a closure would bake a multi-MB
        # constant into the program shipped to the remote compiler
        w_new = b + matvec_t(er, vs, tv, fv, w, with_t)
        nrm = jnp.linalg.norm(w_new - w)
        dstate, w_d = diis_ops.diis_update(dstate, w_new, 2)
        return w_new, w_d, dstate, nrm

    w = dE_dt
    dstate = diis_ops.diis_init(w.size, space=10, dtype=w.dtype)
    for _ in range(maxiter):
        w_new, w_d, dstate, nrm = _w_step(eris, vvvv_op, tvec, f0, dE_dt, w,
                                          dstate)
        if float(nrm) < tol:
            w = w_new
            break
        w = w_d

    # gamma = dE/df + w^T dG/df
    gamma = (dE_df + vjp_fock(eris, vvvv_op, tvec, f0, w,
                              with_t)).reshape(dim, dim)
    hf = jnp.diag(jnp.concatenate([jnp.ones(nocc, gamma.dtype),
                                   jnp.zeros(nvir, gamma.dtype)]))
    return gamma + hf


@partial(jax.jit, static_argnames=("use_sectors",))
def _ccsd_diis_step(eris, vvsect, t1, t2, dstate, use_sectors=False):
    """Jacobi step + ON-DEVICE DIIS in one program: only the energy scalar
    crosses to the host per iteration (a host-DIIS round trip of t2 costs
    ~1 s/iteration over the axon tunnel at pVTZ sizes)."""
    from ecw_cc_tpu.ops import diis as diis_ops

    sect = vvsect if use_sectors else None
    t1n, t2n = ccsd_ops.tupdate(eris, t1, t2, None, vvvv_op=sect)
    e_cc = ccsd_ops.energy(eris, t1n, t2n, None)
    nocc, nvir = t1n.shape
    n1 = nocc * nvir
    dstate, vec = diis_ops.diis_update(
        dstate, jnp.concatenate([t1n.ravel(), t2n.ravel()]), 2)
    t1d = vec[:n1].reshape(nocc, nvir)
    t2d = vec[n1:].reshape(nocc, nocc, nvir, nvir)
    return t1d, t2d, dstate, e_cc


def solve_ccsd(eris, conv_tol=1e-10, max_cycle=200, vvvv_op=None):
    """Plain CCSD amplitudes (MP2 start, Jacobi iterations with DIIS).

    vvvv_op: prebuilt ladder operand (pack-on-build ERIs); default derives
    one from eris.vvvv per config.ladder_mode."""
    from ecw_cc_tpu.ops import diis as diis_ops
    from ecw_cc_tpu.ops import ladder

    nocc, nvir = eris.nocc, eris.nvir
    vvsect = ladder.make_vvvv_op(eris.vvvv) if vvvv_op is None else vvvv_op
    use_sectors = vvsect is not None
    e = jnp.diag(eris.fock)
    eia = e[:nocc, None] - e[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    t1 = jnp.zeros((nocc, nvir), dtype=eris.fock.dtype)
    t2 = eris.oovv / eijab
    dstate = diis_ops.diis_init(nocc * nvir + (nocc * nvir) ** 2, space=8,
                                dtype=t1.dtype)
    e_old = 0.0
    e_cc = 0.0
    for _ in range(max_cycle):
        t1, t2, dstate, e_dev = _ccsd_diis_step(eris, vvsect, t1, t2, dstate,
                                                use_sectors=use_sectors)
        e_cc = float(e_dev)
        if abs(e_cc - e_old) < conv_tol:
            break
        e_old = e_cc
    return t1, t2, e_cc
