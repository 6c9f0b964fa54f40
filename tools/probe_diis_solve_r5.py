"""Micro-probes for the converging-solve overhead levers (r5):

1. fetch batching: np.asarray on two device arrays sequentially vs ONE
   jax.device_get pytree — does the axon runtime batch the round trips?
2. the DIIS bordered solve: jnp.linalg.solve on the (S+1)x(S+1) bordered
   system vs the SPD reduction (Bm y = mask -> c = y / sum(y)) vs an
   unrolled-at-trace-time Cholesky solve of the same SPD system.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import ecw_cc_tpu.config as config

    config.set_config(x64=False, dtype="float32")
    config.setup_jax()
    import jax
    import jax.numpy as jnp

    # --- 1. fetch batching --------------------------------------------
    a = jnp.arange(102, dtype=jnp.float32)
    b = jnp.asarray(7, jnp.int32)
    jax.block_until_ready((a, b))
    float(jnp.sum(a))

    best_seq = best_tree = np.inf
    for _ in range(20):
        t0 = time.perf_counter()
        _ = int(np.asarray(b)); _ = np.asarray(a)
        best_seq = min(best_seq, (time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        _ = jax.device_get((b, a))
        best_tree = min(best_tree, (time.perf_counter() - t0) * 1e3)
    print(f"fetch 2 arrays: sequential {best_seq:.2f} ms, "
          f"device_get tuple {best_tree:.2f} ms", flush=True)

    # --- 2. bordered solve variants -----------------------------------
    S = 15
    rng = np.random.default_rng(0)
    E = rng.standard_normal((S, 40))
    Bh = (E @ E.T).astype(np.float32)

    def bordered(Bm):
        Bfull = jnp.zeros((S + 1, S + 1), Bm.dtype)
        Bfull = Bfull.at[:S, :S].set(Bm)
        border = -jnp.ones((S,), Bm.dtype)
        Bfull = Bfull.at[S, :S].set(border).at[:S, S].set(border)
        rhs = jnp.zeros((S + 1,), Bm.dtype).at[S].set(-1.0)
        sol = jnp.linalg.solve(Bfull, rhs)
        return sol[:S]

    def spd(Bm):
        y = jnp.linalg.solve(Bm, jnp.ones((S,), Bm.dtype))
        return y / jnp.sum(y)

    def chol_unrolled(Bm):
        # trace-time unrolled Cholesky solve of Bm y = 1 (no pivoting;
        # Bm PSD + identity padding). 3S small fused steps.
        L = [[None] * S for _ in range(S)]
        for j in range(S):
            d = Bm[j, j] - sum((L[j][k] ** 2 for k in range(j)),
                               start=jnp.asarray(0.0, Bm.dtype))
            dj = jnp.sqrt(jnp.maximum(d, 1e-30))
            L[j][j] = dj
            for i in range(j + 1, S):
                off = Bm[i, j] - sum((L[i][k] * L[j][k] for k in range(j)),
                                     start=jnp.asarray(0.0, Bm.dtype))
                L[i][j] = off / dj
        y = [None] * S
        for i in range(S):
            y[i] = (1.0 - sum((L[i][k] * y[k] for k in range(i)),
                              start=jnp.asarray(0.0, Bm.dtype))) / L[i][i]
        z = [None] * S
        for i in reversed(range(S)):
            z[i] = (y[i] - sum((L[k][i] * z[k] for k in range(i + 1, S)),
                               start=jnp.asarray(0.0, Bm.dtype))) / L[i][i]
        zv = jnp.stack(z)
        return zv / jnp.sum(zv)

    Bm = jnp.asarray(Bh)
    for name, fn in (("bordered 16x16 linalg.solve", bordered),
                     ("SPD 15x15 linalg.solve", spd),
                     ("SPD unrolled cholesky", chol_unrolled)):
        # chain 200 dependent solves in one dispatch
        @jax.jit
        def chain(B0, fn=fn):
            def body(i, B):
                c = fn(B)
                return B + 1e-6 * jnp.outer(c, c)
            return jax.lax.fori_loop(0, 200, body, B0)
        r = chain(Bm); jax.block_until_ready(r); float(jnp.sum(r))
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(chain(Bm)))
            best = min(best, (time.perf_counter() - t0) / 200 * 1e3)
        c0 = np.asarray(fn(Bm))
        cb = np.asarray(bordered(Bm))
        print(f"{name:<30s} {best:8.4f} ms/solve  "
              f"max|c-c_bordered|={np.abs(c0 - cb).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
