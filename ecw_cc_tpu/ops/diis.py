"""On-device DIIS (Pulay mixing) as a fixed-size ring buffer, jit/while_loop-safe.

Replaces pyscf.lib.diis.DIIS used by the reference solvers
(Solver_GS.py:149-152, 666-673; Solver_ES.py:227-230): `update(x)` is called
with the current iterate; the error vector is the successive difference
x_k - x_{k-1}; extrapolation starts once `min_space` vectors are stored and
keeps at most `space` vectors (oldest evicted).

State is a NamedTuple of fixed-shape arrays so it threads through
lax.while_loop carries.  The bordered DIIS system is solved with masked
identity padding for unfilled slots; a singular solve falls back to the
un-extrapolated iterate.

HBM notes (the history buffers are 2 x space x n = ~1.2 GB at pVTZ with
space=15, so per-iteration traffic here is a measurable slice of the solve):
  - rows are written UNCONDITIONALLY via dynamic-update-slice (a not-pushed
    first-iteration row is garbage but masked out by nvec and overwritten at
    the same head next call) — no full-buffer jnp.where copies;
  - the Gram matrix B is maintained INCREMENTALLY in the state: one
    (space, n) @ (n,) matvec per call instead of the full (space, n) x
    (n, space) Gram recompute.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class DIISState(NamedTuple):
    xs: jnp.ndarray      # (space, n)
    errs: jnp.ndarray    # (space, n)
    last: jnp.ndarray    # (n,)
    B: jnp.ndarray       # (space, space) — Gram matrix errs @ errs.T
    nvec: jnp.ndarray    # () int32 — number of stored vectors (capped at space)
    head: jnp.ndarray    # () int32 — next write position
    has_last: jnp.ndarray  # () bool


def diis_init(n, space=15, dtype=jnp.float64):
    return DIISState(
        xs=jnp.zeros((space, n), dtype=dtype),
        errs=jnp.zeros((space, n), dtype=dtype),
        last=jnp.zeros((n,), dtype=dtype),
        B=jnp.zeros((space, space), dtype=dtype),
        nvec=jnp.zeros((), dtype=jnp.int32),
        head=jnp.zeros((), dtype=jnp.int32),
        has_last=jnp.zeros((), dtype=bool),
    )


def diis_update(state: DIISState, x, min_space=2):
    """Returns (new_state, x_extrapolated)."""
    space = state.xs.shape[0]
    x = x.astype(state.xs.dtype)

    err = x - state.last
    # Write rows unconditionally (in-place dynamic-update-slice); advance
    # head/nvec only when a previous iterate exists.  A not-pushed row is
    # garbage, but nvec keeps it masked and the same head overwrites it.
    push = state.has_last
    xs = state.xs.at[state.head].set(x)
    errs = state.errs.at[state.head].set(err)
    head = jnp.where(push, (state.head + 1) % space, state.head)
    nvec = jnp.where(push, jnp.minimum(state.nvec + 1, space), state.nvec)

    # incremental Gram update: only the head row/col changes
    g = errs @ err                      # (space,) — one pass over the history
    B = state.B.at[state.head, :].set(g).at[:, state.head].set(g)

    # bordered DIIS system with masked padding
    valid = jnp.arange(space) < nvec
    vmask = valid[:, None] & valid[None, :]
    Bm = jnp.where(vmask, B, jnp.eye(space, dtype=B.dtype))
    Bfull = jnp.zeros((space + 1, space + 1), dtype=B.dtype)
    Bfull = Bfull.at[:space, :space].set(Bm)
    border = jnp.where(valid, -1.0, 0.0).astype(B.dtype)
    Bfull = Bfull.at[space, :space].set(border)
    Bfull = Bfull.at[:space, space].set(border)
    rhs = jnp.zeros((space + 1,), dtype=B.dtype).at[space].set(-1.0)
    sol = jnp.linalg.solve(Bfull, rhs)
    c = jnp.where(valid, sol[:space], 0.0)
    x_ext = c @ xs

    ok = (nvec >= min_space) & jnp.all(jnp.isfinite(x_ext))
    x_new = jnp.where(ok, x_ext, x)
    return DIISState(xs=xs, errs=errs, last=x_new, B=B, nvec=nvec, head=head,
                     has_last=jnp.ones((), dtype=bool)), x_new
