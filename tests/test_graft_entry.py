"""Driver-artifact regression: __graft_entry__ must work in a FRESH process
WITHOUT tests/conftest.py's CPU pinning — exactly how the driver runs it.

Round-1/2 post-mortem: dryrun_multichip failed both rounds because eager
array builds dispatched to the default platform (the axon TPU) and died on
chip-side problems (mesh bug r01, libtpu mismatch r02).  The entry now pins
the CPU backend itself; this test proves that in a subprocess that inherits
the real environment (axon plugin active via sitecustomize, no conftest).
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The driver's environment: axon sitecustomize active (inherited
    PYTHONPATH kept!), none of conftest's pinning/env overrides."""
    env = os.environ.copy()
    # ECW_CC_TPU_JAX_CACHE: conftest sets "0" for the in-suite AOT-load
    # hazard (many executables in ONE process); the dryrun subprocess is a
    # fresh process like the driver's — give it the warm cache back.
    for k in ("ECW_CC_TPU_X64", "ECW_CC_TPU_DTYPE", "ECW_CC_TPU_ITERPREC",
              "XLA_FLAGS", "JAX_PLATFORMS", "ECW_CC_TPU_JAX_CACHE"):
        env.pop(k, None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_fresh_subprocess():
    """dryrun_multichip(8) must go green with no conftest help — and must
    not touch any non-CPU backend even when one is registered."""
    code = ("import __graft_entry__ as g; g.dryrun_multichip(8); "
            "print('SUBPROCESS_DRYRUN_DONE')")
    r = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                       env=_driver_env(), capture_output=True, text=True,
                       timeout=900)
    assert r.returncode == 0, (
        f"dryrun subprocess failed (rc={r.returncode}):\n"
        f"--- stdout ---\n{r.stdout[-2000:]}\n--- stderr ---\n{r.stderr[-4000:]}")
    assert "SUBPROCESS_DRYRUN_DONE" in r.stdout
    assert "cpu-only buffers" in r.stdout


def test_entry_shapes_and_step():
    """entry() returns a jittable step; run it once (conftest CPU backend)."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.pop(0)
    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    t1n, t2n, l1n, l2n, ep = out
    assert t1n.shape == args[0].shape
    assert t2n.shape == args[1].shape
    assert np.isfinite(float(ep))
