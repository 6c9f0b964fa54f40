"""Term-level TPU profile of the CCSD update internals ("the o^3 v^3 soup").

Isolates each contraction family of tupdate/lupdate at production shapes to
rank optimization targets.  A null piece measures the per-call overhead floor
(tunnel dispatch + scalar fetch, ~3-4 ms) to subtract mentally from every row.

Run:  python tools/profile_soup.py [pvdz|pvtz]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32")
config.setup_jax()

import numpy as np
import jax
import jax.numpy as jnp

import bench
from ecw_cc_tpu.models.eris import build_eris_device
from ecw_cc_tpu.ops import ccsd as ccsd_ops
from ecw_cc_tpu.ops import ladder

einsum = jnp.einsum

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

mol, ghf = bench.build_host(basis)
eris = build_eris_device(mol, ghf, dtype="float32")
nocc, nvir = eris.nocc, eris.nvir
print(f"== {basis}: nocc={nocc} nvir={nvir} ==", flush=True)
dt = jnp.float32
mo_e = jnp.diag(eris.fock)
eia = mo_e[:nocc, None] - mo_e[None, nocc:]
eijab = eia[:, None, :, None] + eia[None, :, None, :]
t2 = eris.oovv / eijab
rng = np.random.default_rng(0)
t1 = jnp.asarray(rng.standard_normal((nocc, nvir)) * 0.01, dt)
l1, l2 = t1 * 0.5, t2 * 0.5
fsp = eris.fock
K = 30
eps = 1e-30


def timeit(name, f, *arrays):
    @jax.jit
    def runk(c0, *arrs):
        def body(_, c):
            out = f(c, *arrs)
            if not isinstance(out, tuple):
                out = (out,)
            return sum(jnp.sum(o) for o in out) * 1e-30 + c
        return jax.lax.fori_loop(0, K, body, c0)

    x0 = jnp.asarray(0.0, dt)
    float(runk(x0, *arrays))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(runk(x0, *arrays))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    print(f"{name:36s} {best:8.3f} ms", flush=True)
    return best


# null: per-call floor
timeit("null (overhead floor)", lambda c, a: a * (1.0 + c), t1)

# ---------------- tupdate pieces ----------------
def p_tau(c, t1, t2):
    return ccsd_ops.make_tau(t2, t1 + c * eps, t1)

def p_F(c, er, t1, t2):
    return (ccsd_ops.cc_Fvv(er, t1 + c * eps, t2, fsp),
            ccsd_ops.cc_Foo(er, t1, t2, fsp),
            ccsd_ops.cc_Fov(er, t1, t2, fsp))

def p_Woooo_full(c, er, t1, t2):
    W = ccsd_ops.cc_Woooo(er, t1 + c * eps, t2)
    tau = ccsd_ops.make_tau(t2, t1, t1)
    return einsum("mnab,mnij->ijab", tau, W)

def p_Wovvo_build(c, er, t1, t2):
    return ccsd_ops.cc_Wovvo(er, t1 + c * eps, t2)

def p_Wovvo_apply(c, er, t1, t2, W):
    tmp = einsum("imae,mbej->ijab", t2 + c * eps, W)
    tmp = tmp + einsum("ie,ma,mbje->ijab", t1, t1, er.ovov)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    return tmp - tmp.transpose(0, 1, 3, 2)

def p_ladder_corr(c, er, t1, t2):
    tau = t2 + c * eps
    Y = einsum("ijef,mbef->ijmb", tau, er.ovvv)
    Z = -0.5 * einsum("ijmb,ma->ijab", Y, t1)
    L2_ = Z - Z.transpose(0, 1, 3, 2)
    X = einsum("ijef,mnef->ijmn", tau, er.oovv)
    return L2_ + 0.125 * einsum("ijmn,mnab->ijab", X, tau)

def p_T1(c, er, t1, t2):
    Fvv = ccsd_ops.cc_Fvv(er, t1, t2, fsp)
    Foo = ccsd_ops.cc_Foo(er, t1, t2, fsp)
    Fov = ccsd_ops.cc_Fov(er, t1, t2, fsp)
    t1_ = t1 + c * eps
    return (einsum("ie,ae->ia", t1_, Fvv)
            - einsum("ma,mi->ia", t1_, Foo)
            + einsum("imae,me->ia", t2, Fov)
            - einsum("nf,naif->ia", t1_, er.ovov)
            - 0.5 * einsum("imef,maef->ia", t2, er.ovvv)
            - 0.5 * einsum("mnae,mnie->ia", t2, er.ooov))

def p_t1_tails(c, er, t1, t2):
    t1_ = t1 + c * eps
    tmp = einsum("ie,jeba->ijab", t1_, er.ovvv)
    out = tmp - tmp.transpose(1, 0, 2, 3)
    tmp = einsum("ma,ijmb->ijab", t1_, er.ooov)
    return out - (tmp - tmp.transpose(0, 1, 3, 2))

Wovvo = jax.jit(lambda er, a, b: ccsd_ops.cc_Wovvo(er, a, b))(eris, t1, t2)

timeit("tau build", p_tau, t1, t2)
timeit("F builds (Fvv/Foo/Fov)", p_F, eris, t1, t2)
timeit("Woooo build+apply", p_Woooo_full, eris, t1, t2)
timeit("Wovvo build", p_Wovvo_build, eris, t1, t2)
timeit("Wovvo apply (t2.W + antisym)", p_Wovvo_apply, eris, t1, t2, Wovvo)
timeit("ladder corrections L2+L3", p_ladder_corr, eris, t1, t2)
timeit("T1 assembly", p_T1, eris, t1, t2)
timeit("t1 ovvv/ooov tails", p_t1_tails, eris, t1, t2)

# ---------------- lupdate pieces ----------------
imds = jax.jit(lambda er, a, b: ccsd_ops.Linter(er, a, b, fsp=None,
                                                cheap=True))(eris, t1, t2)

def p_Linter(c, er, t1, t2):
    return tuple(v for v in ccsd_ops.Linter(er, t1 + c * eps, t2, fsp=None,
                                            cheap=True).values()
                 if v is not None)

def p_v4_only(c, er, t2):
    return einsum("ljdb,klcd->jcbk", er.oovv, t2 + c * eps)

def p_wovoo_only(c, er, t1, t2):
    tau = t2 + 2.0 * einsum("ia,jb->ijab", t1, t1)
    v4 = einsum("ljdb,klcd->jcbk", er.oovv, t2 + c * eps) + er.ovvo
    return (0.25 * einsum("icdb,jkdb->icjk", er.ovvv, tau)
            + einsum("icbk,jb->icjk", v4, t1)
            - einsum("lijb,klcb->icjk", er.ooov, t2))

def p_wvvvo_cheap(c, er, t1, t2):
    tau = t2 + 2.0 * einsum("ia,jb->ijab", t1, t1)
    v4 = einsum("ljdb,klcd->jcbk", er.oovv, t2 + c * eps) + er.ovvo
    return (einsum("jcak,jb->bcak", v4, t1)
            + 0.25 * einsum("jlka,jlbc->bcak", er.ooov, tau))

def p_m3(c, er, t1, t2, l2):
    l2_ = l2 + c * eps
    woooo = imds["woooo"]
    m3 = einsum("klab,ijkl->ijab", l2_, woooo)
    tau = t2 + 2.0 * einsum("ia,jb->ijab", t1, t1)
    tmp = einsum("ijcd,klcd->ijkl", l2_, tau)
    m3 = m3 + 0.25 * einsum("klab,ijkl->ijab", er.oovv, tmp)
    tmp = einsum("ijcd,kd->ijck", l2_, t1)
    return m3 - einsum("kcba,ijck->ijab", er.ovvv, tmp)

def p_l2_wovvo(c, er, l1, l2):
    tmp = einsum("kica,jcbk->ijab", l2 + c * eps, imds["wovvo"])
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    return tmp - tmp.transpose(0, 1, 3, 2)

def p_Zl(c, er, t2, l2):
    Zl = einsum("ikbc,kmcd->ibmd", l2 + c * eps, t2)
    return einsum("ibmd,mbad->ia", Zl, er.ovvv)

def p_l2_tails(c, er, l1, l2):
    l2_ = l2 + c * eps
    tmp = einsum("ka,ijkb->ijab", l1, er.ooov)
    tmp = tmp + einsum("ijca,cb->ijab", l2_, imds["v1"])
    tmp1vv = 0.5 * einsum("klca,klcb->ba", l2_, t2) + einsum("ka,kb->ba", l1, t1)
    tmp = tmp + einsum("ca,ijcb->ijab", tmp1vv, er.oovv)
    out = tmp - tmp.transpose(0, 1, 3, 2)
    tmp = einsum("ic,jcba->jiba", l1, er.ovvv)
    tmp = tmp + einsum("kiab,jk->ijab", l2_, imds["v2"])
    tmp1oo = 0.5 * einsum("kicd,kjcd->ij", l2_, t2) + einsum("ic,kc->ik", l1, t1)
    tmp = tmp - einsum("ik,kjab->ijab", tmp1oo, er.oovv)
    return out + (tmp - tmp.transpose(1, 0, 2, 3))

def p_l1_rest(c, er, t1, t2, l1, l2):
    l2_ = l2 + c * eps
    tau = t2 + 2.0 * einsum("ia,jb->ijab", t1, t1)
    out = (einsum("kjca,icjk->ia", l2_, imds["wovoo"])
           + einsum("jiba,bj->ia", l2_, imds["w3"]))
    tmp = einsum("ikbc,jb->ikcj", l2_, t1)
    out = out - einsum("ikcj,jcak->ia", tmp, imds["v4"])
    tmp = einsum("ikbc,jlbc->ikjl", l2_, tau)
    out = out - 0.25 * einsum("ikjl,jlka->ia", tmp, er.ooov)
    return out + 0.5 * einsum("ikbc,kacb->ia", l2_, er.ovvv)

timeit("Linter cheap (all imds)", p_Linter, eris, t1, t2)
timeit("v4 build only", p_v4_only, eris, t2)
timeit("wovoo only (incl v4)", p_wovoo_only, eris, t1, t2)
timeit("wvvvo cheap only (incl v4)", p_wvvvo_cheap, eris, t1, t2)
timeit("m3 (non-ladder part)", p_m3, eris, t1, t2, l2)
timeit("l2.wovvo + antisym", p_l2_wovvo, eris, l1, l2)
timeit("Zl chain (folded wvvvo)", p_Zl, eris, t2, l2)
timeit("l2new tails (v1/v2/mba/mij)", p_l2_tails, eris, l1, l2)
timeit("l1 wovoo/wvvvo/w3 dots", p_l1_rest, eris, t1, t2, l1, l2)
