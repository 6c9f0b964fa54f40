"""Jacobian / Newton solver smoke test (counterpart of reference
test/Tram_test.py): builds the exact coupled (T1, Lambda1) Jacobian by
autodiff and takes Newton steps on H2O/STO-3G.

Run:  python examples/newton_smoke.py

NOTE (axon TPU environments): the axon plugin force-selects the TPU backend;
for a CPU run do jax.config.update("jax_platforms", "cpu") after importing
jax (see CLAUDE.md).
"""

import numpy as np

import os

import jax

# f64 parity mode (the default) runs on CPU: the axon plugin force-selects
# the TPU backend, where f64 is emulated/slow and eager dispatch crosses a
# network tunnel.  Set ECW_CC_TPU_DTYPE=float32 for the TPU production mode.
if os.environ.get("ECW_CC_TPU_DTYPE", "float64") != "float32":
    jax.config.update("jax_platforms", "cpu")

from ecw_cc_tpu import ECW

ecw = ECW("h2o", "sto-3g")
ecw.Build_GS_exp("mat", "HF", field=[0.02, 0.01, 0.0])

res = ecw.CCS_GS([0.05], method="newton", conv_thres=1e-8, maxiter=20)
print("\nNewton converged:", res[0])
print("Ep per iteration:", np.round(res[1], 10))

# steepest descent: stability needs beta < 1/max(eia)^2 (~0.002 with the
# O 1s orbital in the window), same fragility as the reference method
res2 = ecw.CCS_GS([0.05], method="descend", beta=0.002, conv_thres=1e-6,
                  maxiter=500)
print("\nSteepest descent:", res2[0])
