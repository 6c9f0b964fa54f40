"""One-process TPU measurement pass (the axon tunnel admits one holder):

  1. per-piece profile of the pVTZ full iteration (rdm1/energy/t/lambda,
     dense vs spin-sector paths)
  2. Pallas ladder prove-or-discard: correctness vs XLA + timing
  3. iter_precision modes on the production solver ('highest' vs 'high' vs
     'default'), iterations-to-1e-6 and ms/iter

Run:  python tools/tpu_measure.py [pvdz|pvtz]
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
from ecw_cc_tpu.ops.ccsd import GCC
from ecw_cc_tpu.ops.vexp import Exp
from ecw_cc_tpu.solvers.gs import Solver_CCSD

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

mol, ghf = bench.build_host(basis)
eris = build_eris_device(mol, ghf, dtype="float32")
sect = jax.jit(ladder.vvvv_spin_sectors)(eris.vvvv)
nocc, nvir = eris.nocc, eris.nvir
print(f"== {basis}: nocc={nocc} nvir={nvir} ==", flush=True)
dt = jnp.float32
mo_e = jnp.diag(eris.fock)
eia = mo_e[:nocc, None] - mo_e[None, nocc:]
eijab = eia[:, None, :, None] + eia[None, :, None, :]
t2 = eris.oovv / eijab
t1 = jnp.zeros((nocc, nvir), dt)
l1, l2 = t1 * 0.5, t2 * 0.5
K = 10
eps = 1e-30


def timeit(name, f, *arrays):
    # big tensors are jit ARGUMENTS (closure constants get shipped to the
    # remote compile service: 3.3 GB HLO -> many-minute compiles)
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
    print(f"{name:32s} {best:8.2f} ms", flush=True)
    return best


# ---- 1. piece profile ------------------------------------------------------
timeit("rdm1 (gamma_CCSD)",
       lambda c, a, b, x, y: ccsd_ops.gamma_CCSD(a + c * eps, b, x, y),
       t1, t2, l1, l2)
timeit("energy",
       lambda c, er, a, b: ccsd_ops.energy(er, a + c * eps, b, None),
       eris, t1, t2)
timeit("tupdate dense",
       lambda c, er, a, b: ccsd_ops.tupdate(er, a + c * eps, b),
       eris, t1, t2)
timeit("tupdate sector",
       lambda c, er, s, a, b: ccsd_ops.tupdate(er, a + c * eps, b,
                                               vvvv_op=s),
       eris, sect, t1, t2)
timeit("lupdate dense",
       lambda c, er, a, b, x, y: ccsd_ops.lupdate(er, a + c * eps, b, x, y),
       eris, t1, t2, l1, l2)
timeit("lupdate sector",
       lambda c, er, s, a, b, x, y: ccsd_ops.lupdate(
           er, a + c * eps, b, x, y, vvvv_op=s),
       eris, sect, t1, t2, l1, l2)
packed = jax.jit(ladder.pack_vvvv)(eris.vvvv)
timeit("tupdate packed",
       lambda c, er, s, a, b: ccsd_ops.tupdate(er, a + c * eps, b,
                                               vvvv_op=s),
       eris, packed, t1, t2)
timeit("lupdate packed",
       lambda c, er, s, a, b, x, y: ccsd_ops.lupdate(
           er, a + c * eps, b, x, y, vvvv_op=s),
       eris, packed, t1, t2, l1, l2)
timeit("ladder sector only",
       lambda c, s, b: ladder.sector_vvvv_contract(s, b + c * eps),
       sect, t2)
timeit("ladder packed only",
       lambda c, s, b: ladder.packed_vvvv_contract(s, b + c * eps),
       packed, t2)
timeit("ladder dense only",
       lambda c, er, a, b: ladder.ladder_contract(er, a + c * eps, b, b),
       eris, t1, t2)

# ---- 2. Pallas ladder: prove or discard ------------------------------------
tau_r = np.asarray(t2.reshape(nocc * nocc, nvir * nvir))
vv_r = np.asarray(eris.vvvv.reshape(nvir * nvir, nvir * nvir))
a = jnp.asarray(tau_r)
b = jnp.asarray(vv_r)
ref = np.asarray(jax.jit(ladder._ladder_mm_xla)(a, b))
try:
    outp = np.asarray(jax.jit(ladder._ladder_mm_pallas)(a, b))
    err = np.max(np.abs(outp - ref)) / max(np.max(np.abs(ref)), 1e-30)
    print(f"pallas ladder rel err: {err:.2e}", flush=True)
    timeit("ladder mm XLA",
           lambda c, a_, b_: ladder._ladder_mm_xla(a_ + c * eps, b_), a, b)
    timeit("ladder mm Pallas",
           lambda c, a_, b_: ladder._ladder_mm_pallas(a_ + c * eps, b_), a, b)
except Exception as exc:
    print(f"pallas ladder FAILED: {exc!r}", flush=True)

# ---- 3. production solver under precision modes ----------------------------
# free the diagnostic ladder operands first: sect + packed + dense vvvv
# together exceeded HBM at pVTZ during the solver section (the solver
# rebuilds its own operand via _get_vvvv_op)
del sect, packed, a, b
target_np = np.diag(np.asarray(ghf.mo_occ, dtype=np.float64))
for prec in ("highest", "high", "default", "bf16", "hybrid"):
    config.set_config(iter_precision=prec)
    exp = Exp(0.01, [[["mat", target_np]]], mol=mol, mo_coeff=ghf.mo_coeff)
    solver = Solver_CCSD(GCC(eris), exp, conv="tl", conv_thres=1e-6,
                         diis="", maxiter=60)
    run = solver._build_device_solver("", False)
    Lw = jnp.asarray(solver.myVexp.L_check(0.01)[0], dtype=dt)
    args = (solver.tsini, solver.lsini, solver.tdini, solver.ldini)
    alpha_v = jnp.asarray(0.0, dt)
    vv = solver._get_vvvv_op()
    out = run(eris, vv, Lw, *args, alpha_v)
    k = int(out[6])
    ep = float(out[8][k - 1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(eris, vv, Lw, *args, alpha_v)
        _ = float(out[8][int(out[6]) - 1])
        best = min(best, (time.perf_counter() - t0) / max(int(out[6]), 1) * 1e3)
    print(f"solver precision={prec:8s} iters={k:3d} ms/iter={best:8.2f} "
          f"Ep={ep:.8f}", flush=True)
config.set_config(iter_precision="highest")
