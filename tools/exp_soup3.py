"""Round-3 soup experiments: measure each optimization avenue at pVTZ shapes.

Each experiment times a BASELINE formulation (what ops/ccsd.py ships today)
against one candidate restructuring, on the real TPU chip, at the production
shapes (nocc=14, nvir=162 — C2H2/cc-pVTZ).  Random operands: these are pure
layout/throughput probes; numerics equality is asserted per pair.

Avenues (VERDICT r2 item 2):
  A. stacked t+lambda ladder      — one (2 o^2, p) x (p, p) GEMM instead of two
  B. pre-permuted ovvv views      — kill per-iteration transposes of the
                                    238 MB ovvv block (m3-kcba, ladder-Y,
                                    Zl chain, wovoo-icdb)
  C. X|Y stacked RHS              — one M=196 GEMM for the two tau.(ef) dots
  D. reshape-dot vs einsum        — Wovvo apply as explicit dot_general

Run:  python tools/exp_soup3.py  (requires the TPU tunnel; ~2 min)
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

from ecw_cc_tpu.ops.ladder import (PackedVVVV, _pack_pairs, _unpack_pairs,
                                   packed_vvvv_contract)

einsum = jnp.einsum
o, v = 14, 162
p = v * (v - 1) // 2
dt = jnp.float32
K = 30

rng = np.random.default_rng(0)


def arr(*shape, scale=0.1):
    return jnp.asarray(rng.standard_normal(shape) * scale, dt)


def antisym_last2(x):
    return x - jnp.swapaxes(x, -1, -2)


def antisym4(x):
    x = x - jnp.swapaxes(x, -1, -2)
    return x - jnp.transpose(x, (1, 0, 2, 3))


def timeit(name, f, *arrays):
    @jax.jit
    def runk(c0, *arrs):
        def body(_, c):
            out = f(c, *arrs)
            if not isinstance(out, tuple):
                out = (out,)
            return sum(jnp.sum(o_) for o_ in out) * 1e-30 + c
        return jax.lax.fori_loop(0, K, body, c0)

    x0 = jnp.asarray(0.0, dt)
    float(runk(x0, *arrays))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(runk(x0, *arrays))
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    print(f"{name:44s} {best:8.3f} ms", flush=True)
    return best


def check(name, a, b, tol=2e-2):
    d = float(jnp.max(jnp.abs(a - b)))
    s = float(jnp.max(jnp.abs(a))) + 1e-30
    ok = d <= tol * s
    print(f"  [{'ok' if ok else 'MISMATCH'}] {name}: rel {d / s:.2e}", flush=True)
    assert ok, (name, d, s)


# operands
tau = antisym4(arr(o, o, v, v))
l2 = antisym4(arr(o, o, v, v))
t1 = arr(o, v)
t2 = antisym4(arr(o, o, v, v))
oovv = antisym4(arr(o, o, v, v))
ovvv = antisym_last2(arr(o, v, v, v))
wc_half = arr(p, p, scale=0.05)
wc = wc_half + wc_half.T  # pair-swap symmetric like the real operand
packed = PackedVVVV(wc=wc)
eps = 1e-30

print(f"== shapes: o={o} v={v} p={p} ==", flush=True)

timeit("null (overhead floor)", lambda c, a: a * (1.0 + c), t1)

# ---------------- A. stacked t+lambda ladder ----------------
def a_base(c, tau, l2):
    y1 = packed_vvvv_contract(packed, tau + c * eps)
    y2 = packed_vvvv_contract(packed, l2)
    return y1, y2

def a_stacked(c, tau, l2):
    xc = jnp.concatenate([
        _pack_pairs((tau + c * eps).reshape(o * o, v * v), v),
        _pack_pairs(l2.reshape(o * o, v * v), v)], axis=0)
    yc = jax.lax.dot_general(xc, wc,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=dt)
    z = _unpack_pairs(yc, v).reshape(2, o, o, v, v)
    z = z - jnp.swapaxes(z, -1, -2)
    return z[0], z[1]

r1 = jax.jit(lambda a, b: a_base(0.0, a, b))(tau, l2)
r2_ = jax.jit(lambda a, b: a_stacked(0.0, a, b))(tau, l2)
check("stacked ladder == 2x packed (t)", r1[0], r2_[0])
check("stacked ladder == 2x packed (l)", r1[1], r2_[1])
timeit("A ladder baseline (2 packed calls)", a_base, tau, l2)
timeit("A ladder stacked (1 GEMM)", a_stacked, tau, l2)

# ---------------- B1. m3 kcba term ----------------
# m3 -= einsum("kcba,ijck->ijab", ovvv, tmp), tmp = einsum("ijcd,kd->ijck", l2, t1)
ovvv_ckab = jnp.transpose(ovvv, (1, 0, 3, 2))  # (c,k,a,b) — build-time view

def b1_base(c, l2, t1):
    tmp = einsum("ijcd,kd->ijck", l2 + c * eps, t1)
    return einsum("kcba,ijck->ijab", ovvv, tmp)

def b1_view(c, l2, t1):
    tmp = einsum("ijcd,kd->ijck", l2 + c * eps, t1)
    # rows (ij), cols (ck) @ view rows (ck), cols (ab)
    tmp_r = jnp.transpose(tmp, (0, 1, 3, 2)).reshape(o * o, v * o)
    # careful: tmp is (i,j,c,k); want cols ordered (c,k) -> transpose to ijck->ij,(c,k): already (c,k)!
    tmp_r = tmp.reshape(o * o, v * o)
    out = jax.lax.dot_general(
        tmp_r, ovvv_ckab.reshape(v * o, v * v),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dt)
    return out.reshape(o, o, v, v)

check("m3-kcba view == einsum",
      jax.jit(lambda a, b: b1_base(0.0, a, b))(l2, t1),
      jax.jit(lambda a, b: b1_view(0.0, a, b))(l2, t1))
timeit("B1 m3-kcba einsum", b1_base, l2, t1)
timeit("B1 m3-kcba pre-permuted dot", b1_view, l2, t1)

# ---------------- B2. ladder-corr Y ----------------
ovvv_efmb = jnp.transpose(ovvv, (2, 3, 0, 1))  # (e,f,m,b)

def b2_base(c, tau):
    return einsum("ijef,mbef->ijmb", tau + c * eps, ovvv)

def b2_view(c, tau):
    out = jax.lax.dot_general(
        (tau + c * eps).reshape(o * o, v * v),
        ovvv_efmb.reshape(v * v, o * v),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dt)
    return out.reshape(o, o, o, v)

check("Y view == einsum",
      jax.jit(lambda a: b2_base(0.0, a))(tau),
      jax.jit(lambda a: b2_view(0.0, a))(tau))
timeit("B2 Y einsum", b2_base, tau)
timeit("B2 Y pre-permuted dot", b2_view, tau)

# ---------------- B3. Zl chain ----------------
ovvv_bmda = jnp.transpose(ovvv, (1, 0, 3, 2))  # (b,m,d,a) — same perm as ckab

def b3_base(c, l2, t2):
    Zl = einsum("ikbc,kmcd->ibmd", l2 + c * eps, t2)
    return einsum("ibmd,mbad->ia", Zl, ovvv)

def b3_view(c, l2, t2):
    Zl = einsum("ikbc,kmcd->ibmd", l2 + c * eps, t2)
    out = jax.lax.dot_general(
        Zl.reshape(o, v * o * v), ovvv_bmda.reshape(v * o * v, v),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dt)
    return out

check("Zl view == einsum",
      jax.jit(lambda a, b: b3_base(0.0, a, b))(l2, t2),
      jax.jit(lambda a, b: b3_view(0.0, a, b))(l2, t2))
timeit("B3 Zl chain einsum", b3_base, l2, t2)
timeit("B3 Zl chain pre-permuted dot", b3_view, l2, t2)

# ---------------- B4. wovoo icdb term ----------------
def b4_base(c, tau):
    return 0.25 * einsum("icdb,jkdb->icjk", ovvv, tau + c * eps)

def b4_view(c, tau):
    out = 0.25 * jax.lax.dot_general(
        ovvv.reshape(o * v, v * v), (tau + c * eps).reshape(o * o, v * v),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=dt)
    return out.reshape(o, v, o, o)

check("wovoo-icdb view == einsum",
      jax.jit(lambda a: b4_base(0.0, a))(tau),
      jax.jit(lambda a: b4_view(0.0, a))(tau))
timeit("B4 wovoo-icdb einsum", b4_base, tau)
timeit("B4 wovoo-icdb reshape dot", b4_view, tau)

# ---------------- C. X|Y stacked RHS ----------------
oovv_efmn = jnp.transpose(oovv, (2, 3, 0, 1))  # (e,f,m,n)
XY_rhs = jnp.concatenate([oovv_efmn.reshape(v * v, o * o),
                          ovvv_efmb.reshape(v * v, o * v)], axis=1)

def c_base(c, tau):
    X = einsum("ijef,mnef->ijmn", tau + c * eps, oovv)
    Y = einsum("ijef,mbef->ijmb", tau + c * eps, ovvv)
    return X, Y

def c_stacked(c, tau):
    out = jax.lax.dot_general(
        (tau + c * eps).reshape(o * o, v * v), XY_rhs,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=dt)
    X = out[:, :o * o].reshape(o, o, o, o)
    Y = out[:, o * o:].reshape(o, o, o, v)
    return X, Y

rb = jax.jit(lambda a: c_base(0.0, a))(tau)
rs = jax.jit(lambda a: c_stacked(0.0, a))(tau)
check("X stacked == einsum", rb[0], rs[0])
check("Y stacked == einsum", rb[1], rs[1])
timeit("C X+Y separate einsums", c_base, tau)
timeit("C X|Y one stacked GEMM", c_stacked, tau)

# ---------------- D. Wovvo apply: einsum vs reshape dot ----------------
W = arr(o, v, v, o)  # (m,b,e,j)

def d_base(c, t2):
    return einsum("imae,mbej->ijab", t2 + c * eps, W)

def d_dot(c, t2):
    A = jnp.transpose(t2 + c * eps, (0, 2, 1, 3)).reshape(o * v, o * v)  # (ia),(me)
    B = jnp.transpose(W, (0, 2, 1, 3)).reshape(o * v, v * o)             # (me),(bj)
    out = jax.lax.dot_general(A, B,
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=dt)
    return jnp.transpose(out.reshape(o, v, v, o), (0, 3, 1, 2))  # (ia)(bj)->ijab

check("Wovvo-apply dot == einsum",
      jax.jit(lambda a: d_base(0.0, a))(t2),
      jax.jit(lambda a: d_dot(0.0, a))(t2))
timeit("D Wovvo apply einsum", d_base, t2)
timeit("D Wovvo apply explicit dot", d_dot, t2)

# ---------------- E. v4 from Wovvo-core identity ----------------
# v4[j,c,b,k] = -sum_{nf} oovv[j,n,b,f] t2[k,n,f,c]  (== 2x Wovvo t2-core,
# derivation in round-3 notes); measure einsum-as-written vs the identity
# route reusing a (me)(bj)-layout GEMM.
def e_base(c, t2):
    return einsum("ljdb,klcd->jcbk", oovv, t2 + c * eps)

def e_ident(c, t2):
    A = jnp.transpose(oovv, (0, 2, 1, 3)).reshape(o * v, o * v)   # (jb),(nf)
    B = jnp.transpose(t2 + c * eps, (1, 3, 0, 2)).reshape(o * v, o * v)  # (nf),(kc)
    out = -jax.lax.dot_general(A, B,
                               dimension_numbers=(((1,), (0,)), ((), ())),
                               preferred_element_type=dt)
    return jnp.transpose(out.reshape(o, v, o, v), (0, 3, 1, 2))  # (jb)(kc)->jcbk

check("v4 identity == einsum",
      jax.jit(lambda a: e_base(0.0, a))(t2),
      jax.jit(lambda a: e_ident(0.0, a))(t2))
timeit("E v4 einsum as written", e_base, t2)
timeit("E v4 identity-layout dot", e_ident, t2)
