"""Decompose the o^4 v^2 'oooo family' cost (the surprise hot spot).

exp_m3_r3.py localized ~1.3 ms of the m3 group to its woooo/ltau terms
(trivial FLOPs and bytes); tools/profile_soup_r3.py found the T-side
oooo family similarly hot (~1.2 ms).  This probe times each sub-piece
chained (R reps in one jit; null row = dispatch overhead to subtract).

Run:  python tools/exp_oooo_r3.py [pvtz|pvdz] [reps]
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
from ecw_cc_tpu.ops.ccsd_sect import _tau_b  # noqa: E402
from ecw_cc_tpu.ops.spinsect import (  # noqa: E402
    sector_einsum as _S, sector_info, wrap)

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 40

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
l2 = t2 * 0.5
SYM = True


def W(arr, kinds):
    return wrap(arr, kinds, info, sym=SYM)


def timeit(name, fn):
    @jax.jit
    def run(t1, t2, l2):
        def body(i, carry):
            eps = carry * jnp.float32(1e-30)
            s = fn(t1 + eps, t2 + eps, l2 + eps)
            return carry + s * jnp.float32(1e-25)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    float(run(t1, t2, l2))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(run(t1, t2, l2))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:46s} {best * 1e3:8.3f} ms", flush=True)
    return best


def blocksum(x):
    if hasattr(x, "blocks"):
        return sum(jnp.sum(b) for b in x.blocks.values())
    return jnp.sum(x)


timeit("null", lambda a, b, c: jnp.sum(a))
timeit("tau (lambda form: t2 + 2 outer)",
       lambda a, b, c: blocksum(W(b, "oovv")
                                + _S("ia,jb->ijab", W(a, "ov").scale(2.0),
                                     W(a, "ov"))))
timeit("tau (T form: _tau_b antisym)",
       lambda a, b, c: blocksum(_tau_b(W(b, "oovv"), W(a, "ov"))))


def f_ltau(a, b, c):
    l2b = W(c, "oovv")
    tau = W(b, "oovv") + _S("ia,jb->ijab", W(a, "ov").scale(2.0), W(a, "ov"))
    return blocksum(_S("ijcd,klcd->ijkl", l2b, tau))


def f_ltau_raw(a, b, c):
    # same contraction but on RAW t2/l2 wraps (no tau build)
    return blocksum(_S("ijcd,klcd->ijkl", W(c, "oovv"), W(b, "oovv")))


def f_ltau_consume(a, b, c):
    ltau = _S("ijcd,klcd->ijkl", W(c, "oovv"), W(b, "oovv"))
    return blocksum(_S("klab,ijkl->ijab", W(eris.oovv, "oovv"), ltau))


def f_woooo_build(a, b, c):
    t1b = W(a, "ov")
    tau = W(b, "oovv") + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    woooo = (W(eris.oooo, "oooo").scale(0.5)
             + _S("ijcd,klcd->ijkl", W(eris.oovv, "oovv"), tau).scale(0.25)
             + _S("jilc,kc->jilk", W(eris.ooov, "ooov"), t1b))
    return blocksum(woooo)


def f_woooo_consume(a, b, c):
    woooo = _S("ijcd,klcd->ijkl", W(eris.oovv, "oovv"), W(b, "oovv"))
    return blocksum(_S("klab,ijkl->ijab", W(c, "oovv"), woooo))


def f_dense_ltau(a, b, c):
    return jnp.sum(jnp.einsum("ijcd,klcd->ijkl", c, b))


timeit("ltau via tau", f_ltau)
timeit("ltau on raw l2.t2 (no tau)", f_ltau_raw)
timeit("ltau + klab consumer", f_ltau_consume)
timeit("woooo build (incl tau)", f_woooo_build)
timeit("woooo(raw) + klab.l2 consumer", f_woooo_consume)
timeit("DENSE ijcd,klcd->ijkl (control)", f_dense_ltau)
