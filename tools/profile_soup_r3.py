"""Per-term on-chip profile of the SECTORED soup kernels (round 3+).

tools/profile_step_r3.py showed each timed dispatch carries ~3.8 ms of
axon-tunnel overhead, too coarse to rank individual o^3 v^3 terms.  Here
every term group runs CHAINED inside one jitted fori_loop — the loop
carry feeds a ~1e-30 perturbation into an amplitude operand so XLA
cannot hoist the loop body — and the per-iteration time is
(wall - overhead) / reps with one scalar fetch per measurement.

The groups mirror ops/ccsd_sect.tupdate_sect / lupdate_sect term for
term (sym=True production route).  Group sums slightly exceed the fused
full kernels (XLA fuses across our cuts); the RANKING is what matters.

Run:  python tools/profile_soup_r3.py [pvtz|pvdz] [reps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32",
                  spin_sorted=True, soup_sector=True, soup_sym=True)
config.setup_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ecw_cc_tpu.models.eris import build_eris_device  # noqa: E402
from ecw_cc_tpu.ops import ladder as ladder_ops  # noqa: E402
from ecw_cc_tpu.ops.ccsd_sect import (  # noqa: E402
    _tau_b, _wrap_eris, lupdate_sect, tupdate_sect)
from ecw_cc_tpu.ops.spinsect import (  # noqa: E402
    sector_einsum as _S, sector_info, wrap)

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20

mol, ghf = bench.build_host(basis)
eris, vvvv_op = build_eris_device(mol, ghf, dtype="float32",
                                  pack_ladder=True, sort_spin=True)
nocc, nvir = eris.nocc, eris.nvir
perm = ladder_ops.spin_sort_perm(np.asarray(ghf.orbspin), nocc)
info = sector_info(np.asarray(ghf.orbspin)[perm], nocc)
print(f"== {basis}: nocc={nocc} nvir={nvir} reps={REPS} ==", flush=True)

diag = jnp.diag(eris.fock)
eia = diag[:nocc, None] - diag[None, nocc:]
eijab = eia[:, None, :, None] + eia[None, :, None, :]
t2 = eris.oovv / eijab
rng = np.random.default_rng(0)
t1 = jnp.asarray(rng.standard_normal((nocc, nvir)) * 0.01, jnp.float32)
l1, l2 = t1 * 0.5, t2 * 0.5
fsp = eris.fock
fov = fsp[:nocc, nocc:]

SYM = True


def _blocksum(x):
    if hasattr(x, "blocks"):
        return sum(jnp.sum(b) for b in x.blocks.values())
    return jnp.sum(x)


def W(arr, kinds):
    return wrap(arr, kinds, info, sym=SYM)


# ---- term groups -------------------------------------------------------------
# each fn(eris, sb, t1, t2, l1, l2) -> scalar; t2/l2 arrive PERTURBED by the
# chain carry so nothing is loop-invariant

def g_t_finters(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tau_t = _tau_b(t2b, t1b, fac=0.5)
    Fvv = (_S("mf,amef->ae", t1b, sb["vovv"]).dense()
           - 0.5 * _S("mnaf,mnef->ae", tau_t, sb["oovv"]).dense())
    Foo = (_S("ne,mnie->mi", t1b, sb["ooov"]).dense()
           + 0.5 * _S("inef,mnef->mi", tau_t, sb["oovv"]).dense())
    Fov = _S("nf,mnef->me", t1b, sb["oovv"]).dense()
    return jnp.sum(Fvv) + jnp.sum(Foo) + jnp.sum(Fov)


def g_t_wovvo_build(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    Wv = _S("jf,mbef->mbej", t1b, sb["ovvv"])
    Wv = Wv + _S("nb,mnej->mbej", t1b, sb["oovo"]).scale(-1.0)
    Wv = Wv + _S("jnfb,mnef->mbej", t2b, sb["oovv"]).scale(-0.5)
    Wv = Wv + _S("jf,nb,mnef->mbej", t1b, t1b, sb["oovv"]).scale(-1.0)
    return _blocksum(Wv)


def g_t_t2wovvo(er, sb, a, b, c, d):
    # consumer with a FIXED Wovvo stand-in (ovvo eris block): isolates the
    # o^3 v^3 GEMM + the P(ij)P(ab) transposes
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tmp = _S("imae,mbej->ijab", t2b, sb["ovvo"])
    tmp = tmp + _S("ie,ma,mbje->ijab", t1b, t1b, sb["ovov"])
    tmp = tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)
    tmp = tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)
    return _blocksum(tmp)


def g_t_oooo(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tau = _tau_b(t2b, t1b)
    X = _S("ijef,mnef->ijmn", tau, sb["oovv"])
    tmp = _S("je,mnie->mnij", t1b, sb["ooov"])
    Woooo = (W(er.oooo, "oooo") + tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0))
    out = _S("mnab,mnij->ijab", tau, Woooo).scale(0.5)
    out = out + _S("ijmn,mnab->ijab", X, tau).scale(0.25)
    return _blocksum(out)


def g_t_Y(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tau = _tau_b(t2b, t1b)
    Y = _S("ijef,mbef->ijmb", tau, sb["ovvv"])
    out = _S("ijmb,ma->ijab", Y, t1b.scale(-0.5))
    out = out + _S("ijma,mb->ijab", Y, t1b.scale(0.5))
    return _blocksum(out)


def g_t_t1soup(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    out = (_S("imae,me->ia", t2b, W(fov, "ov")).dense()
           - _S("nf,naif->ia", t1b, sb["ovov"]).dense()
           - 0.5 * _S("imef,maef->ia", t2b, sb["ovvv"]).dense()
           - 0.5 * _S("mnae,mnie->ia", t2b, sb["ooov"]).dense())
    return jnp.sum(out)


def g_t_t2one(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tmp = _S("ijae,be->ijab", t2b, W(fsp[nocc:, nocc:], "vv"))
    out = tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)
    tmp = _S("imab,mj->ijab", t2b, W(fsp[:nocc, :nocc], "oo"))
    out = out + (tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)).scale(-1.0)
    tmp = _S("ie,jeba->ijab", t1b, sb["ovvv"])
    out = out + tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)
    tmp = _S("ma,ijmb->ijab", t1b, sb["ooov"])
    out = out + (tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)).scale(-1.0)
    return _blocksum(out)


def g_l_vinters(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    v1 = (-_S("jbac,jc->ba", sb["ovvv"], t1b).dense()
          + 0.5 * _S("jkca,jkbc->ba", sb["oovv"], tau).dense())
    v2 = (-_S("kijb,kb->ij", sb["ooov"], t1b).dense()
          + 0.5 * _S("ikbc,jkbc->ij", sb["oovv"], tau).dense())
    v5 = _S("kc,jkbc->bj", W(fov, "ov"), t2b).dense()
    v5 = v5 - 0.5 * _S("kljc,klbc->bj", sb["ooov"], t2b).dense()
    v5 = v5 + 0.5 * _S("kbdc,jkcd->bj", sb["ovvv"], t2b).dense()
    return jnp.sum(v1) + jnp.sum(v2) + jnp.sum(v5)


def g_l_v4(er, sb, a, b, c, d):
    t2b = W(b, "oovv")
    v4 = _S("ljdb,klcd->jcbk", sb["oovv"], t2b)
    return _blocksum(v4)


def g_l_wovvo_l2(er, sb, a, b, c, d):
    # wovvo t1-dressing + the l2 consumer (v4 stand-in: ovvo block)
    t1b, l2b = W(a, "ov"), W(d, "oovv")
    wovvo = (sb["ovvo"]
             + _S("ljdb,lc,kd->jcbk", sb["oovv"], t1b, t1b).scale(-1.0)
             + _S("ljkb,lc->jcbk", sb["ooov"], t1b).scale(-1.0)
             + _S("jcbd,kd->jcbk", sb["ovvv"], t1b))
    tmp = _S("kica,jcbk->ijab", l2b, wovvo)
    tmp = tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)
    out = tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)
    return _blocksum(out)


def g_l_wovoo(er, sb, a, b, c, d):
    t1b, t2b, l2b = W(a, "ov"), W(b, "oovv"), W(d, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    wovoo = (_S("icdb,jkdb->icjk", sb["ovvv"], tau).scale(0.25)
             + _S("icbk,jb->icjk", sb["ovvo"], t1b)
             + _S("lijb,klcb->icjk", sb["ooov"], t2b).scale(-1.0))
    return jnp.sum(_S("kjca,icjk->ia", l2b, wovoo).dense())


def g_l_m3(er, sb, a, b, c, d):
    t1b, t2b, l2b = W(a, "ov"), W(b, "oovv"), W(d, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    woooo = (W(er.oooo, "oooo").scale(0.5)
             + _S("ijcd,klcd->ijkl", sb["oovv"], tau).scale(0.25)
             + _S("jilc,kc->jilk", sb["ooov"], t1b))
    m3 = _S("klab,ijkl->ijab", l2b, woooo)
    ltau = _S("ijcd,klcd->ijkl", l2b, tau)
    m3 = m3 + _S("klab,ijkl->ijab", sb["oovv"], ltau).scale(0.25)
    lt1 = _S("ijcd,kd->ijck", l2b, t1b)
    m3 = m3 + _S("kcba,ijck->ijab", sb["ovvv"], lt1).scale(-1.0)
    return _blocksum(m3)


def g_l_l2one(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    l1b, l2b = W(c, "ov"), W(d, "oovv")
    mba = _S("klca,klcb->ba", l2b, t2b).scale(0.5)
    mij = _S("kicd,kjcd->ij", l2b, t2b).scale(0.5)
    fov1 = W(fov, "ov") + _S("kjcb,kc->jb", sb["oovv"], t1b)
    tmp = _S("ia,jb->ijab", l1b, fov1)
    tmp = tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)
    out = tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)
    tmp = _S("ka,ijkb->ijab", l1b, sb["ooov"])
    tmp = tmp + _S("ijca,cb->ijab", l2b, W(fsp[nocc:, nocc:], "vv"))
    tmp1vv = mba + _S("ka,kb->ba", l1b, t1b)
    tmp = tmp + _S("ca,ijcb->ijab", tmp1vv, sb["oovv"])
    out = out + (tmp + tmp.transpose(0, 1, 3, 2).scale(-1.0)).scale(-1.0)
    tmp = _S("ic,jcba->jiba", l1b, sb["ovvv"])
    tmp = tmp + _S("kiab,jk->ijab", l2b, W(fsp[:nocc, :nocc], "oo"))
    tmp1oo = mij + _S("ic,kc->ik", l1b, t1b)
    tmp = tmp + _S("ik,kjab->ijab", tmp1oo, sb["oovv"]).scale(-1.0)
    out = out + tmp + tmp.transpose(1, 0, 2, 3).scale(-1.0)
    return _blocksum(out)


def g_l_l1soup(er, sb, a, b, c, d):
    t1b, t2b = W(a, "ov"), W(b, "oovv")
    l1b, l2b = W(c, "ov"), W(d, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    out = _S("jb,ibaj->ia", l1b, sb["ovvo"]).dense()
    tmp = _S("ikbc,jb->ikcj", l2b, t1b)
    out = out - _S("ikcj,jcak->ia", tmp, sb["ovvo"]).dense()
    tmp = _S("ikbc,jlbc->ikjl", l2b, tau)
    out = out - 0.25 * _S("ikjl,jlka->ia", tmp, sb["ooov"]).dense()
    out = out + 0.5 * _S("ikbc,kacb->ia", l2b, sb["ovvv"]).dense()
    Zl = _S("ikbc,kmcd->ibmd", l2b, t2b)
    out = out - _S("ibmd,mbad->ia", Zl, sb["ovvv"]).dense()
    out = out + _S("jiba,bj->ia", l2b, W(fsp[nocc:, :nocc], "vo")).dense()
    return jnp.sum(out)


GROUPS = [
    ("t: F intermediates", g_t_finters),
    ("t: Wovvo build", g_t_wovvo_build),
    ("t: t2.Wovvo + P()", g_t_t2wovvo),
    ("t: oooo family (X, Woooo)", g_t_oooo),
    ("t: Y (tau.ovvv) twins", g_t_Y),
    ("t: T1 soup", g_t_t1soup),
    ("t: T2 one-body + t1.eris", g_t_t2one),
    ("l: v1/v2/v5 inters", g_l_vinters),
    ("l: v4 build", g_l_v4),
    ("l: wovvo dress + l2.wovvo", g_l_wovvo_l2),
    ("l: wovoo + l2.wovoo", g_l_wovoo),
    ("l: m3 family", g_l_m3),
    ("l: L2 one-body chains", g_l_l2one),
    ("l: L1 soup (Zl etc.)", g_l_l1soup),
]


def chained(fn):
    @jax.jit
    def run(er, a, b, c, d):
        sb = _wrap_eris(er, info, sym=SYM)

        def body(i, carry):
            eps = carry * jnp.float32(1e-30)
            s = fn(er, sb, a + eps, b + eps, c, d + eps)
            return carry + s * jnp.float32(1e-25)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return run


def timeit(name, fn):
    f = chained(fn)
    float(f(eris, t1, t2, l1, l2))              # compile + force
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(f(eris, t1, t2, l1, l2))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:32s} {best * 1e3:8.3f} ms", flush=True)
    return best


# anchors: the fused production kernels, chained the same way
def g_full_t(er, sb, a, b, c, d):
    o1, o2 = tupdate_sect(er, a, b, fsp, info, vvvv_op=None,
                          ladder_pre=jnp.zeros_like(b), sym=SYM)
    return jnp.sum(o1) + jnp.sum(o2)


def g_full_l(er, sb, a, b, c, d):
    o1, o2 = lupdate_sect(er, a, b, c, d, fsp, info, vvvv_op=None,
                          ladder_pre=jnp.zeros_like(d), sym=SYM)
    return jnp.sum(o1) + jnp.sum(o2)


total = 0.0
for name, fn in GROUPS:
    total += timeit(name, fn)
print(f"{'sum of groups':32s} {total * 1e3:8.3f} ms", flush=True)
timeit("FULL tupdate_sect (chained)", g_full_t)
timeit("FULL lupdate_sect (chained)", g_full_l)
