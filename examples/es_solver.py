"""Excited-state ECW-CCS on H2O with QChem transition-dipole targets
(counterpart of reference test/Test_ECW_ES.py: H2O/6-31++g** ES solve,
lambda loop over 15 points).

Run:  python examples/es_solver.py

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

ecw = ECW("h2o", "6-31++g**")

# QChem H2O EOM-CCSD references (reference gamma_exp.py:27-94):
#   ES1: 7.6051 eV, tr dip y = (0.523742+0.550251)/2
#   ES2: 9.9605 eV, tr dip z = (0.622534+0.649058)/2
dip1 = (0.523742 + 0.550251) / 2.0
dip2 = (0.622534 + 0.649058) / 2.0
es_prop = [[["trdip", (dip1, 0.0, 0.0)]], [["trdip", (0.0, 0.0, dip2)]]]
ecw.Build_ES_exp_input(es_prop)

# lambda loop 0 -> 0.1 (reference Test_ECW_ES.py:41-44)
Larray = np.linspace(0, 0.1, 15)
ecw.CCS_ES(Larray, L_loop=True, diis="all", conv="rl", conv_thres=1e-5,
           maxiter=80, print_ite=False)
ecw.print_results_ES()
