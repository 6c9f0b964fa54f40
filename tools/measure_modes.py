"""Measure the round-3 structure-elimination matrix on the real chip.

Runs the REAL production solver (bench.bench_config) at cc-pVTZ across
{soup_sector x soup_sym} and, for the winning route, the iter_precision
modes — one process (the axon tunnel is single-client), sequential.

Usage:  python tools/measure_modes.py [basis=cc-pvtz] [n_iters=20]

Prints one table row per mode:
  sector sym  prec      ms/iter  eff.TF/s(path)  dense-equiv TF/s
(dense-equiv = r2's 367 GF dense FLOP count / time — the honest
cross-round comparison axis).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    basis = sys.argv[1] if len(sys.argv) > 1 else "cc-pvtz"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    import bench
    from ecw_cc_tpu import config

    rows = []

    def run(sector, sym, prec):
        config.set_config(soup_sector=bool(sector), soup_sym=bool(sym),
                          iter_precision=prec)
        r = bench.bench_config(basis, n_iters, None)
        dense_f = r.get("flops_per_iter_dense", r["flops_per_iter"])
        row = (sector, sym, prec, r["value_ms"], r["tflops"],
               dense_f / r["value_ms"] / 1e9,
               r.get("solve_ms"), r.get("solve_iters"))
        rows.append(row)
        print(f"sector={sector} sym={sym} prec={prec:8s} "
              f"{r['value_ms']:7.2f} ms/iter  {r['tflops']:6.2f} TF/s  "
              f"dense-equiv {row[5]:6.2f} TF/s  "
              f"solve {row[6]} ms / {row[7]} it", flush=True)

    # route matrix at 'highest'
    for sector, sym in ((0, 0), (1, 0), (1, 1)):
        run(sector, sym, "highest")
    # precision modes on the full route
    for prec in ("high", "default", "bf16", "hybrid"):
        run(1, 1, prec)

    print("\nsector sym prec ms_iter tflops dense_equiv solve_ms solve_iters")
    for row in rows:
        print(*row)


if __name__ == "__main__":
    main()
