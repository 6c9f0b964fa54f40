"""pVTZ time-to-solution: iter_precision='hybrid' vs 'highest' (round 3).

The r3 sectored kernels dropped the all-'highest' converging solve
(diis='tl', 1e-6) to ~270 ms; the 'high' fast leg runs 12.0 vs 14.3
ms/iter, so the hybrid schedule (fast leg until |r|<hybrid_switch, then
'highest' to the same 1e-6 fixed point) is worth re-measuring — in r2 it
bought only ~3 % end-to-end.

Run:  python tools/solve_hybrid_r3.py [pvtz|pvdz]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32",
                  spin_sorted=True, soup_sector=True, soup_sym=True)
config.setup_jax()

import numpy as np  # noqa: E402

import bench  # noqa: E402

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

out = {}
for mode in ("highest", "hybrid"):
    config.set_config(iter_precision=mode)
    res = bench.bench_config(basis, n_iters=3, numpy_baseline=False,
                             measure_high=False, measure_solve=True)
    out[mode] = {k: res[k] for k in ("solve_ms", "solve_iters")}
    print(f"== {mode}: {json.dumps(out[mode])}", flush=True)
print(json.dumps(out))
