"""Round-3 TPU measurement pass: sectored/sym soup kernels + packed DIIS.

One process (the axon tunnel admits one holder).  For each kernel-route
combo this reuses bench.bench_config, i.e. the REAL production solver
(fixed-iteration ms/iter, iter_precision 'high'/'bf16' rows, converging
diis='tl' solve_ms), then times the (T) energy dense vs sectored.

Run:  python tools/tpu_measure_r3.py [pvtz|pvdz]

Rows to transcribe into BASELINE.md / README / CLAUDE.md:
  r2-dense      — round-2 production path (packed ladder, dense soup)
  sectored      — spin-sorted + sector-blocked soup + balanced-row ladder
  sectored+sym  — + closed-shell mirror symmetry (the r3 default)
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32")
config.setup_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

COMBOS = (
    ("r2-dense", dict(spin_sorted=False, soup_sector=False, soup_sym=False)),
    ("sectored", dict(spin_sorted=True, soup_sector=True, soup_sym=False)),
    ("sectored+sym", dict(spin_sorted=True, soup_sector=True, soup_sym=True)),
)

out = {}
for name, flags in COMBOS:
    config.set_config(**flags)
    t0 = time.perf_counter()
    res = bench.bench_config(basis, n_iters=10, numpy_baseline=False,
                             measure_high=True, measure_solve=True)
    res["wall_s"] = round(time.perf_counter() - t0, 1)
    out[name] = res
    print(f"== {name}: {json.dumps(res)}", flush=True)

# ---- (T): dense pair-scan vs sectored ---------------------------------------
config.set_config(spin_sorted=True, soup_sector=True, soup_sym=True)
from ecw_cc_tpu.models.eris import build_eris_device  # noqa: E402
from ecw_cc_tpu.ops import ccsd_t, ladder  # noqa: E402
from ecw_cc_tpu.ops.spinsect import sector_info  # noqa: E402

mol, ghf = bench.build_host(basis)
eris, vvvv_op = build_eris_device(mol, ghf, dtype="float32",
                                  pack_ladder=True, sort_spin=True)
nocc = eris.nocc
perm = ladder.spin_sort_perm(np.asarray(ghf.orbspin), nocc)
info = sector_info(np.asarray(ghf.orbspin)[perm], nocc)
sym = ccsd_t.eris_spin_restricted(eris, info)
diag = jnp.diag(eris.fock)
eia = diag[:nocc, None] - diag[None, nocc:]
eijab = eia[:, None, :, None] + eia[None, :, None, :]
t2 = eris.oovv / eijab
t1 = jnp.zeros_like(eia)


def timeit(name, fn, *args):
    f = jax.jit(fn)
    val = float(f(*args))           # compile + force execution (axon:
    best = np.inf                   # block_until_ready can be a no-op)
    for _ in range(3):
        t0 = time.perf_counter()
        val = float(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best * 1e3:9.1f} ms   E_T={val:.8f}", flush=True)
    return best * 1e3


et_d = timeit("(T) dense scan", lambda er, a, b: ccsd_t.energy_t(er, a, b),
              eris, t1, t2)
et_s = timeit("(T) sectored", lambda er, a, b: ccsd_t.energy_t_sect(
    er, a, b, info, sym=False), eris, t1, t2)
et_y = timeit("(T) sectored+sym", lambda er, a, b: ccsd_t.energy_t_sect(
    er, a, b, info, sym=True), eris, t1, t2)
out["t_energy_ms"] = {"dense": round(et_d, 1), "sectored": round(et_s, 1),
                      "sectored_sym": round(et_y, 1), "sym_gate": bool(sym)}

# ---- CCSD(T) target generation wall time (Gexp build, end-user facing) ------
from ecw_cc_tpu.models.gamma_exp import Gexp  # noqa: E402
from ecw_cc_tpu.models.molecule import Molecule  # noqa: E402

t0 = time.perf_counter()
g = Gexp(Molecule("c2h2", "cc-pvdz"), "CCSD(T)")
g.build()
out["gexp_ccsdt_pvdz_s"] = round(time.perf_counter() - t0, 1)
out["gexp_ccsdt_pvdz_Eexp"] = round(float(g.Eexp), 6)

print(json.dumps(out))
