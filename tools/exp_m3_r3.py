"""Variant probes for the hottest sectored soup groups (m3 / L1 / oooo).

tools/profile_soup_r3.py (chained, overhead-corrected) ranks the real
per-iteration cost of the lambda m3 family at ~1.76 ms, the L1 soup at
~1.28 ms and the T-side oooo family at ~1.23 ms — together ~45% of the
fused t+lambda kernels — far above both their FLOP (~0.2-0.3 ms at the
23 TF/s f32 ceiling) and byte (~0.1 ms) floors.  Hypotheses probed:

  h1  in-loop transposes of loop-invariant eris blocks (are they LICM'd?)
  h2  per-kernel fixed overhead (batch the survivor GEMMs of one term)
  h3  the einsum path itself (hand-matricized flat dots)

Each variant runs CHAINED (R reps inside one jit; ~24 ms dispatch+fetch
round trip amortized; fixed overhead measured by a null row and printed).

Run:  python tools/exp_m3_r3.py [pvtz|pvdz] [reps]
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


def chained(fn, *ops):
    @jax.jit
    def run(t1, t2, l2, *ops):
        def body(i, carry):
            eps = carry * jnp.float32(1e-30)
            s = fn(t1 + eps, t2 + eps, l2 + eps, *ops)
            return carry + s * jnp.float32(1e-25)

        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

    return run, ops


def timeit(name, fn, *ops):
    f, ops = chained(fn, *ops)
    float(f(t1, t2, l2, *ops))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        v = float(f(t1, t2, l2, *ops))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{name:44s} {best * 1e3:8.3f} ms", flush=True)
    return best


def blocksum(x):
    if hasattr(x, "blocks"):
        return sum(jnp.sum(b) for b in x.blocks.values())
    return jnp.sum(x)


null = timeit("null (overhead row)", lambda a, b, c: jnp.sum(a))

# ---------------- m3 family -------------------------------------------------
def m3_v0(a, b, c):
    """Control: ops/ccsd_sect.lupdate_sect's m3 block verbatim."""
    t1b, t2b, l2b = W(a, "ov"), W(b, "oovv"), W(c, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    woooo = (W(eris.oooo, "oooo").scale(0.5)
             + _S("ijcd,klcd->ijkl", W(eris.oovv, "oovv"), tau).scale(0.25)
             + _S("jilc,kc->jilk", W(eris.ooov, "ooov"), t1b))
    m3 = _S("klab,ijkl->ijab", l2b, woooo)
    ltau = _S("ijcd,klcd->ijkl", l2b, tau)
    m3 = m3 + _S("klab,ijkl->ijab", W(eris.oovv, "oovv"), ltau).scale(0.25)
    lt1 = _S("ijcd,kd->ijck", l2b, t1b)
    m3 = m3 + _S("kcba,ijck->ijab", W(eris.ovvv, "ovvv"), lt1).scale(-1.0)
    return blocksum(m3)


# h1: the ovvv operand pre-transposed OUTSIDE the loop to the dot layout
ovvv_ckba = jnp.transpose(eris.ovvv, (1, 0, 2, 3))  # (c,k,b,a)


def m3_v1(a, b, c, ovvv_t):
    t1b, t2b, l2b = W(a, "ov"), W(b, "oovv"), W(c, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    woooo = (W(eris.oooo, "oooo").scale(0.5)
             + _S("ijcd,klcd->ijkl", W(eris.oovv, "oovv"), tau).scale(0.25)
             + _S("jilc,kc->jilk", W(eris.ooov, "ooov"), t1b))
    m3 = _S("klab,ijkl->ijab", l2b, woooo)
    ltau = _S("ijcd,klcd->ijkl", l2b, tau)
    m3 = m3 + _S("klab,ijkl->ijab", W(eris.oovv, "oovv"), ltau).scale(0.25)
    lt1 = _S("ijcd,kd->ijck", l2b, t1b)
    m3 = m3 + _S("ckba,ijck->ijab", wrap(ovvv_t, "vovv", info, sym=SYM),
                 lt1).scale(-1.0)
    return blocksum(m3)


# h3: only the ovvv term, control vs hand-matricized flat dot
def m3_ovvv_only_v0(a, b, c):
    t1b, l2b = W(a, "ov"), W(c, "oovv")
    lt1 = _S("ijcd,kd->ijck", l2b, t1b)
    return blocksum(_S("kcba,ijck->ijab", W(eris.ovvv, "ovvv"), lt1))


def m3_ovvv_only_v1(a, b, c, ovvv_t):
    t1b, l2b = W(a, "ov"), W(c, "oovv")
    lt1 = _S("ijcd,kd->ijck", l2b, t1b)
    return blocksum(_S("ckba,ijck->ijab",
                       wrap(ovvv_t, "vovv", info, sym=SYM), lt1))


def m3_oooo_only(a, b, c):
    t1b, t2b, l2b = W(a, "ov"), W(b, "oovv"), W(c, "oovv")
    tau = t2b + _S("ia,jb->ijab", t1b.scale(2.0), t1b)
    woooo = (W(eris.oooo, "oooo").scale(0.5)
             + _S("ijcd,klcd->ijkl", W(eris.oovv, "oovv"), tau).scale(0.25)
             + _S("jilc,kc->jilk", W(eris.ooov, "ooov"), t1b))
    m3 = _S("klab,ijkl->ijab", l2b, woooo)
    ltau = _S("ijcd,klcd->ijkl", l2b, tau)
    m3 = m3 + _S("klab,ijkl->ijab", W(eris.oovv, "oovv"), ltau).scale(0.25)
    return blocksum(m3)


# h2/h3: DENSE route for the whole m3 family (one einsum per term on the
# full sorted arrays; the sector machinery bypassed entirely)
def m3_dense(a, b, c):
    tau = b + jnp.einsum("ia,jb->ijab", 2.0 * a, a)
    woooo = (0.5 * eris.oooo
             + 0.25 * jnp.einsum("ijcd,klcd->ijkl", eris.oovv, tau)
             + jnp.einsum("jilc,kc->jilk", eris.ooov, a))
    m3 = jnp.einsum("klab,ijkl->ijab", c, woooo)
    ltau = jnp.einsum("ijcd,klcd->ijkl", c, tau)
    m3 = m3 + 0.25 * jnp.einsum("klab,ijkl->ijab", eris.oovv, ltau)
    lt1 = jnp.einsum("ijcd,kd->ijck", c, a)
    m3 = m3 - jnp.einsum("kcba,ijck->ijab", eris.ovvv, lt1)
    return jnp.sum(m3)


t_v0 = timeit("m3 family: control (sectored+sym)", m3_v0)
timeit("m3 family: pre-transposed ovvv (h1)", m3_v1, ovvv_ckba)
timeit("m3 family: DENSE (no sectors)", m3_dense)
timeit("m3 ovvv term only: control", m3_ovvv_only_v0)
timeit("m3 ovvv term only: pre-transposed", m3_ovvv_only_v1, ovvv_ckba)
timeit("m3 oooo terms only", m3_oooo_only)
print(f"(null overhead {null*1e3:.3f} ms is included in every row)",
      flush=True)
