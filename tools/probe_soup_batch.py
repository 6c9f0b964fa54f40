"""Measure candidate batching schemes for the small-M sector soup GEMMs.

r3 VERDICT weak #5 / next #2: at pVTZ the sectored soup runs ~25 GEMMs with
M in 49..98 (oa=ob=7 canonical occupied pairs); the step profile blames MXU
M-tile padding for the 11.0-vs-6.7 ms gap to the HBM byte floor.  The MXU
streams M rows against a stationary weight tile, so small-M GEMMs pay the
pipeline latency per tile-pass; candidate fixes group work to amortize it.

Schemes measured at the exact canonical-block shapes of the pVTZ soup
(C2H2/cc-pVTZ sorted-sym layout: oa=7, va=81 -> M=49, K=N=567):

  sep      k separate GEMMs (the current sector_einsum emission)
  kconcat  one GEMM per output block: contributions summed over contracted
           spin sectors ride ONE dot with K *= k (operand concat copies)
  batch    one batched dot_general (k as a batch dim)
  mstack   M-concat of k left blocks against a SHARED right operand
           (only valid when the RHS block coincides; upper bound probe)
  flipMN   the transposed orientation (stream the big dim as M)
  dense    the dense-layout control (M=196, K=N=2268 = 4x work)

Usage: python tools/probe_soup_batch.py [--cpu]  (one JSON line per scheme)
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--oa", type=int, default=7)
    ap.add_argument("--va", type=int, default=81)
    ap.add_argument("--k", type=int, default=5,
                    help="GEMMs per group (surviving sector count)")
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ecw_cc_tpu import config as cfg
    cfg.setup_jax()

    oa, va, k = args.oa, args.va, args.k
    M, K, N = oa * oa, oa * va, oa * va
    rng = np.random.default_rng(0)
    dt = jnp.float32
    A = [jnp.asarray(rng.standard_normal((M, K)), dt) for _ in range(k)]
    B = [jnp.asarray(rng.standard_normal((K, N)), dt) for _ in range(k)]
    Ad = jnp.asarray(rng.standard_normal((4 * M, 4 * K)), dt)
    Bd = jnp.asarray(rng.standard_normal((4 * K, 4 * N)), dt)
    Ak = jnp.concatenate(A, axis=1)            # (M, k*K)
    Bk = jnp.concatenate(B, axis=0)            # (k*K, N)
    Ab = jnp.stack(A)
    Bb = jnp.stack(B)
    Am = jnp.concatenate(A, axis=0)            # (k*M, K)

    def chain(f, *ops):
        def step(c, _):
            out = f(c, *ops[1:])
            # fold the output back into the carry so XLA can't hoist
            return c + 1e-20 * jnp.sum(out), None
        def run(x):
            y, _ = jax.lax.scan(step, x, None, length=args.iters)
            return y
        return jax.jit(run)

    An = jnp.concatenate(B, axis=1)            # (K, k*N) as N-concat RHS
    schemes = {}
    schemes["sep"] = (lambda a, *bs: sum(a @ b for b in bs), A[0], *B)
    schemes["one"] = (lambda a, b: a @ b, A[0], B[0])
    schemes["kconcat"] = (lambda a, b: a @ b, Ak, Bk)
    schemes["nconcat"] = (lambda a, b: a @ b, A[0], An)
    schemes["batch"] = (
        lambda a, b: jnp.einsum("kmn,knp->kmp", a, b)[0], Ab, Bb)
    schemes["mstack"] = (lambda a, b: a @ b, Am, B[0])
    schemes["flipMN"] = (lambda a, *bs: sum((b.T @ a.T).T for b in bs),
                         A[0], *B)
    schemes["dense"] = (lambda a, b: a @ b, Ad, Bd)

    results = {}
    for name, (f, *ops) in schemes.items():
        g = chain(f, *ops)
        y = g(ops[0])
        float(jnp.sum(y))          # force execution (axon lazy errors)
        t0 = time.perf_counter()
        y = g(ops[0])
        float(jnp.sum(y))
        dt_ms = (time.perf_counter() - t0) * 1e3 / args.iters
        flops = {
            "sep": 2 * M * K * N * k, "kconcat": 2 * M * k * K * N,
            "one": 2 * M * K * N, "nconcat": 2 * M * K * k * N,
            "batch": 2 * k * M * K * N, "mstack": 2 * k * M * K * N,
            "flipMN": 2 * M * K * N * k, "dense": 2 * 64 * M * K * N,
        }[name]
        results[name] = {"ms": round(dt_ms, 4),
                         "gflops": round(flops / dt_ms / 1e6, 1)}
    print(json.dumps({"backend": jax.default_backend(),
                      "M": M, "K": K, "N": N, "k": k, **results}))


if __name__ == "__main__":
    main()
