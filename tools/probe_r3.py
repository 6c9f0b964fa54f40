"""Round-3 variant probes: per-term rewrites of the o^3v^3 soup, measured
on the real chip at pVTZ shapes ('highest' precision, the bench mode).

Idea under test: most ovvv-family einsums make XLA relayout the 238 MB
block; the antisymmetrized ERI store already contains transposed variants
(vovv = -ovvv.transpose(1,0,2,3), vvvo = -ovvv.transpose(...)), so each
term can be re-expressed against the block whose NATURAL reshape gives a
clean (M,K)x(N,K) GEMM.  Each probe times current-form vs rewrite(s).

Run:  python tools/probe_r3.py [pvdz|pvtz]
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
tau = jax.jit(ccsd_ops.make_tau)(t2, t1, t1)
tau_l = jax.jit(lambda a, b: a + 2.0 * einsum("ia,jb->ijab", b, b))(t2, t1)
K = 30
eps = 1e-30
o2 = nocc * nocc
ov = nocc * nvir
v2 = nvir * nvir


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
    print(f"{name:46s} {best:8.3f} ms", flush=True)
    return best


def check(name, a, b, tol=1e-3):
    d = float(jnp.max(jnp.abs(a - b)))
    r = float(jnp.max(jnp.abs(a)) + 1e-30)
    flag = "OK " if d / r < tol else "FAIL"
    print(f"  parity {name:40s} {flag} rel={d / r:.2e}", flush=True)


timeit("null (overhead floor)", lambda c, a: a * (1.0 + c), t1)

# ---- B: T1 ovvv term: "imef,maef->ia" ----------------------------------
def b_cur(c, er, t2):
    return -0.5 * einsum("imef,maef->ia", t2 + c * eps, er.ovvv)

def b_new(c, er, t2):
    # vovv[a,m,e,f] = -ovvv[m,a,e,f]; both operands natural reshapes
    return 0.5 * jnp.dot((t2 + c * eps).reshape(nocc, -1),
                         er.vovv.reshape(nvir, -1).T)

check("T1 ovvv", b_cur(0.0, eris, t2), b_new(0.0, eris, t2))
timeit("T1 ovvv cur (maef)", b_cur, eris, t2)
timeit("T1 ovvv new (vovv gemm)", b_new, eris, t2)

# ---- C: t1 tail: "ie,jeba->ijab" ---------------------------------------
def c_cur(c, er, t1):
    tmp = einsum("ie,jeba->ijab", t1 + c * eps, er.ovvv)
    return tmp - tmp.transpose(1, 0, 2, 3)

def c_new(c, er, t1):
    # ovvv[j,e,b,a] = -vovv[e,j,b,a]; lhs t1 (i,e), rhs natural (e, j b a)
    tmp = -jnp.dot(t1 + c * eps,
                   er.vovv.reshape(nvir, -1)).reshape(nocc, nocc, nvir, nvir)
    return tmp - tmp.transpose(1, 0, 2, 3)

check("t1 tail", c_cur(0.0, eris, t1), c_new(0.0, eris, t1))
timeit("t1 tail cur", c_cur, eris, t1)
timeit("t1 tail new (vovv gemm)", c_new, eris, t1)

# ---- E: ladder-correction Y: "ijef,mbef->ijmb" -------------------------
def e_cur(c, er, tau):
    return einsum("ijef,mbef->ijmb", tau + c * eps, er.ovvv)

def e_new(c, er, tau):
    return jnp.dot((tau + c * eps).reshape(o2, v2),
                   er.ovvv.reshape(ov, v2).T).reshape(nocc, nocc, nocc, nvir)

check("Y corr", e_cur(0.0, eris, tau), e_new(0.0, eris, tau))
timeit("Y corr cur", e_cur, eris, tau)
timeit("Y corr new (flat dot)", e_new, eris, tau)

# ---- G: v5 ovvv term: "kbdc,jkcd->bj" ----------------------------------
def g_cur(c, er, t2):
    return 0.5 * einsum("kbdc,jkcd->bj", er.ovvv, t2 + c * eps)

def g_new(c, er, t2):
    t2r = (t2 + c * eps).transpose(0, 1, 3, 2).reshape(nocc, -1)  # j,(k d c)
    return -0.5 * jnp.dot(er.vovv.reshape(nvir, -1), t2r.T)

check("v5 ovvv", g_cur(0.0, eris, t2), g_new(0.0, eris, t2))
timeit("v5 ovvv cur", g_cur, eris, t2)
timeit("v5 ovvv new (vovv gemm)", g_new, eris, t2)

# ---- K: l1 exchange: "ikbc,kacb->ia" -----------------------------------
def k_cur(c, er, l2):
    return 0.5 * einsum("ikbc,kacb->ia", l2 + c * eps, er.ovvv)

def k_new(c, er, l2):
    l2r = (l2 + c * eps).transpose(0, 1, 3, 2).reshape(nocc, -1)  # i,(k c b)
    return -0.5 * jnp.dot(l2r, er.vovv.reshape(nvir, -1).T)

check("l1 exch", k_cur(0.0, eris, l2), k_new(0.0, eris, l2))
timeit("l1 exch cur", k_cur, eris, l2)
timeit("l1 exch new (vovv gemm)", k_new, eris, l2)

# ---- L: Zl chain: "ikbc,kmcd->ibmd" then "ibmd,mbad->ia" ---------------
def l_cur(c, er, t2, l2):
    Zl = einsum("ikbc,kmcd->ibmd", l2 + c * eps, t2)
    return einsum("ibmd,mbad->ia", Zl, er.ovvv)

def l_new(c, er, t2, l2):
    Zl = einsum("ikbc,kmcd->ibmd", l2 + c * eps, t2)
    # ovvv[m,b,a,d] = -vvvo[a,d,b,m]; Zl -> (i,(d b m)) cheap transpose
    Zr = Zl.transpose(0, 3, 1, 2).reshape(nocc, -1)
    return -jnp.dot(Zr, er.vvvo.reshape(nvir, -1).T)

check("Zl", l_cur(0.0, eris, t2, l2), l_new(0.0, eris, t2, l2))
timeit("Zl cur", l_cur, eris, t2, l2)
timeit("Zl new (vvvo gemm)", l_new, eris, t2, l2)

# ---- J: m3 ovvv piece: "ijcd,kd->ijck" + "kcba,ijck->ijab" -------------
def j_cur(c, er, t1, l2):
    tmp = einsum("ijcd,kd->ijck", l2 + c * eps, t1)
    return -einsum("kcba,ijck->ijab", er.ovvv, tmp)

def j_new(c, er, t1, l2):
    tmp = einsum("ijcd,kd->ijkc", l2 + c * eps, t1).reshape(o2, ov)
    out = -jnp.dot(tmp, er.ovvv.reshape(ov, v2))  # (kc),(ba) natural
    return out.reshape(nocc, nocc, nvir, nvir).transpose(0, 1, 3, 2)

check("m3 ovvv", j_cur(0.0, eris, t1, l2), j_new(0.0, eris, t1, l2))
timeit("m3 ovvv cur", j_cur, eris, t1, l2)
timeit("m3 ovvv new (natural gemm)", j_new, eris, t1, l2)

# ---- I: wovoo tau piece: "icdb,jkdb->icjk" -----------------------------
def i_cur(c, er, tau_l):
    return 0.25 * einsum("icdb,jkdb->icjk", er.ovvv, tau_l + c * eps)

def i_new(c, er, tau_l):
    out = jnp.dot(er.ovvv.reshape(ov, v2), (tau_l + c * eps).reshape(o2, v2).T)
    return 0.25 * out.reshape(nocc, nvir, nocc, nocc)

check("wovoo tau", i_cur(0.0, eris, tau_l), i_new(0.0, eris, tau_l))
timeit("wovoo tau cur", i_cur, eris, tau_l)
timeit("wovoo tau new (flat dot)", i_new, eris, tau_l)

# ---- A+F+M: bandwidth-only t1/vv contractions against ovvv -------------
def afm_cur(c, er, t1, vvmat):
    fvv = einsum("mf,amef->ae", t1 + c * eps, er.vovv)
    v1t = einsum("jbac,jc->ba", er.ovvv, t1)
    l1t = einsum("icab,bc->ia", er.ovvv, vvmat)
    return fvv, v1t, l1t

def afm_2step(c, er, t1, vvmat):
    # contract the CONTIGUOUS trailing index first, then the stray one
    t1_ = t1 + c * eps
    fvv = einsum("amef,mf->ae", er.vovv, t1_)
    v1t = einsum("jbac,jc->ba", er.ovvv, t1_)
    l1t = einsum("icab,bc->ia", er.ovvv, vvmat)
    return fvv, v1t, l1t

vvmat = jnp.asarray(rng.standard_normal((nvir, nvir)) * 0.01, dt)
timeit("Fvv+v1+l1vv scatter cur", afm_cur, eris, t1, vvmat)
timeit("Fvv+v1+l1vv scatter 2step", afm_2step, eris, t1, vvmat)

# ---- Wovvo apply: "imae,mbej->ijab" + antisym --------------------------
def w_cur(c, er, t2, W):
    tmp = einsum("imae,mbej->ijab", t2 + c * eps, W)
    tmp = tmp + einsum("ie,ma,mbje->ijab", t1, t1, er.ovov)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    return tmp - tmp.transpose(0, 1, 3, 2)

def w_new(c, er, t2, W):
    t2r = (t2 + c * eps).transpose(0, 2, 1, 3).reshape(ov, ov)   # (ia),(me)
    Wr = W.transpose(0, 2, 1, 3).reshape(ov, ov)                  # (me),(bj)
    tmp = jnp.dot(t2r, Wr).reshape(nocc, nvir, nvir, nocc)
    tmp = tmp.transpose(0, 3, 1, 2)                               # i j a b
    tmp = tmp + einsum("ie,ma,mbje->ijab", t1, t1, er.ovov)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    return tmp - tmp.transpose(0, 1, 3, 2)

Wovvo = jax.jit(lambda er, a, b: ccsd_ops.cc_Wovvo(er, a, b))(eris, t1, t2)
check("Wovvo apply", w_cur(0.0, eris, t2, Wovvo), w_new(0.0, eris, t2, Wovvo))
timeit("Wovvo apply cur", w_cur, eris, t2, Wovvo)
timeit("Wovvo apply new (ov x ov gemm)", w_new, eris, t2, Wovvo)

# ---- v4 build: "ljdb,klcd->jcbk" ---------------------------------------
def v4_cur(c, er, t2):
    return einsum("ljdb,klcd->jcbk", er.oovv, t2 + c * eps) + er.ovvo

def v4_new(c, er, t2):
    Br = er.oovv.transpose(1, 3, 0, 2).reshape(ov, ov)            # (jb),(ld)
    Ar = (t2 + c * eps).transpose(1, 3, 0, 2).reshape(ov, ov)     # (kc),(ld)
    out = jnp.dot(Br, Ar.T).reshape(nocc, nvir, nocc, nvir)       # j b k c
    return out.transpose(0, 3, 1, 2) + er.ovvo                    # j c b k

check("v4", v4_cur(0.0, eris, t2), v4_new(0.0, eris, t2))
timeit("v4 cur", v4_cur, eris, t2)
timeit("v4 new (ov x ov gemm)", v4_new, eris, t2)
