"""Re-measure the packed/sectored-vs-dense crossover at pVDZ (r3 VERDICT
next #4): the nvir >= 96 gate (config.ladder_packed_min_nvir) was measured
BEFORE the flat-GEMM engine and the sectored/sym kernels; if the sorted
production route now wins at nvir=62, the pVDZ bench/production path (and
all pVDZ-sized target generation) inherits the r3/r4 eliminations.

One TPU process.  Run:  python tools/crossover_r4.py [pvdz|pvtz]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32")
config.setup_jax()

import bench  # noqa: E402

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz", "631g": "6-31g"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvdz"]

# bench_config picks the route from resolve_mode(nvir): force each side
# via the ladder gate (packed => pack-on-build + sorted + sectored + sym
# when the gates hold; dense => the r2 route the pVDZ row runs today)
COMBOS = (
    ("dense-route", dict(ladder_packed_min_nvir=1024)),
    ("packed-sorted-route", dict(ladder_packed_min_nvir=8)),
)

out = {}
for name, flags in COMBOS:
    config.set_config(**flags)
    t0 = time.perf_counter()
    res = bench.bench_config(basis, n_iters=40, numpy_baseline=False,
                             measure_high=True, measure_solve=True)
    res["wall_s"] = round(time.perf_counter() - t0, 1)
    out[name] = res
    print(f"== {name}: {json.dumps(res)}", flush=True)
config.set_config(ladder_packed_min_nvir=96)
print(json.dumps(out))
