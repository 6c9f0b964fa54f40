"""EE Davidson cycle-count probe on the chip (r4 VERDICT next #4).

Measures warm EOM-EE solves at the bench pVDZ config with Koopman vs CIS
guesses, right-only and 2-root+left, counting Davidson cycles via a
wrapped dispatcher.  Run on the TPU (or CPU with JAX_PLATFORMS unset ->
axon default).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    import ecw_cc_tpu.config as config

    config.set_config(x64=False, dtype="float32")
    config.setup_jax()

    from ecw_cc_tpu.models.eris import build_eris_device
    from ecw_cc_tpu.ops.ccsd_t import solve_ccsd
    from ecw_cc_tpu.ops.ladder import pack_vvvv
    from ecw_cc_tpu.ops import eom
    from ecw_cc_tpu.utils import linalg

    mol, ghf = B.build_host("cc-pvdz")
    eris = build_eris_device(mol, ghf, dtype="float32")
    vvvv_op = pack_vvvv(eris.vvvv)
    t1, t2, _ = solve_ccsd(eris, conv_tol=1e-8, vvvv_op=vvvv_op)

    counts = []
    orig = linalg.davidson_pipelined_device

    def counting(matvec, x0, diag, **kw):
        t0 = time.perf_counter()
        out = orig(matvec, x0, diag, **kw)
        # cycles aren't returned; re-derive from verbose? instead wrap the
        # cycle program call count via a closure counter
        counts.append((time.perf_counter() - t0) * 1e3)
        return out

    # count cycles by wrapping the cached cycle program
    cyc_n = [0]
    orig_pl = linalg._pl_programs

    def wrapped_pl(*a, **k):
        init, cycle, ritz = orig_pl(*a, **k)

        def cycle2(*aa, **kk):
            cyc_n[0] += 1
            return cycle(*aa, **kk)
        return init, cycle2, ritz

    linalg._pl_programs = wrapped_pl

    def run(tag, guess, nroots, left):
        g = None
        if guess == "koopman":
            g = eom.koopman_guesses(eris, nroots)
        # warm-up (compile)
        eom.eom_ccsd(eris, t1, t2, nroots=nroots, tol=1e-5, left=left,
                     vvvv_op=vvvv_op, guess=g)
        best = np.inf
        cycles = 0
        for _ in range(2):
            cyc_n[0] = 0
            t0 = time.perf_counter()
            out = eom.eom_ccsd(eris, t1, t2, nroots=nroots, tol=1e-5,
                               left=left, vvvv_op=vvvv_op, guess=g)
            dt = (time.perf_counter() - t0) * 1e3
            if dt < best:
                best, cycles = dt, cyc_n[0]
        w = out[0]
        print(f"{tag:<28s} {best:8.1f} ms  cycles={cycles:3d}  "
              f"w_eV={[round(x * 27.2114, 3) for x in w]}", flush=True)

    run("right koopman nroots=1", "koopman", 1, False)
    run("right cis     nroots=1", "cis", 1, False)
    run("left2 koopman nroots=2", "koopman", 2, True)
    run("left2 cis     nroots=2", "cis", 2, True)


if __name__ == "__main__":
    main()
