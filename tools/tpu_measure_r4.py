"""Round-4 TPU measurement pass: sector-GEMM emission modes + (T) bf16.

One process (the axon tunnel admits one holder).  Reuses
bench.bench_config (the REAL production solver) under each
config.soup_gemm emission scheme, then the (T) rows incl. the r4 bf16
slab mode.

Run:  python tools/tpu_measure_r4.py [pvtz|pvdz] [--no-t]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32")
config.setup_jax()

import bench  # noqa: E402

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

out = {}
for mode in ("sep", "kconcat", "flip", "kconcat+flip"):
    config.set_config(soup_gemm=mode)
    t0 = time.perf_counter()
    res = bench.bench_config(basis, n_iters=40, numpy_baseline=False,
                             measure_high=True, measure_solve=True)
    res["wall_s"] = round(time.perf_counter() - t0, 1)
    out[mode] = res
    print(f"== soup_gemm={mode}: {json.dumps(res)}", flush=True)
config.set_config(soup_gemm="sep")

if "--no-t" not in sys.argv:
    t0 = time.perf_counter()
    res_t = bench.bench_t(basis)
    res_t["wall_s"] = round(time.perf_counter() - t0, 1)
    out["t"] = res_t
    print(f"== (T): {json.dumps(res_t)}", flush=True)

print(json.dumps(out))
