"""Flat-GEMM einsum: collapse 2-operand contractions to one 2-D dot.

XLA's TPU lowering of a dot_general with MULTIPLE contracting/free
dimensions is pathological at CC kernel shapes: the identical data as a
flat (M,K)x(K,N) GEMM runs up to 11x faster (measured on the bench chip:
`ijcd,klcd->ijkl` at nocc=14/nvir=162 is 1.07 ms as a 4-D einsum vs
0.10 ms flattened).  The fix must not ADD memory traffic, though: a first
version that transposed arbitrary operands into GEMM layout lost more to
the materialized copies than the flat dot recovered (pVTZ step 12.0 ->
13.0 ms).  `gemm_einsum` therefore flattens ONLY when both operands carry
their contraction letters as a contiguous PREFIX or SUFFIX in matching
order — then the reshape is free and the single-contracting-dim
lax.dot_general replaces the slow multi-dim form at zero byte cost.
Measured on the hot families this covers (the o^4 v^2 woooo/X/ltau terms
and the tau.ovvv Y twins): 3-11x per contraction.

Everything else falls back to jnp.einsum unchanged (same transposes it
would have emitted anyway).  Exact: same multiply-add set, flattened
reduction order (f64 parity ~1e-15 rel).  Differentiable and vmap-safe
(reshape/dot_general only).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _plan(spec):
    """Static plan for a 2-operand spec, or None to fall back.

    Plan = (nfa, nfb, a_pre, b_pre, perm_o): whether each operand carries
    the contraction block as prefix (True) or suffix (False), and the
    output transpose (einsum would emit the same one)."""
    if "->" not in spec or "." in spec:
        return None
    ins, out = spec.split("->")
    parts = ins.split(",")
    if len(parts) != 2:
        return None
    la, lb = parts
    if len(set(la)) != len(la) or len(set(lb)) != len(lb) \
            or len(set(out)) != len(out):
        return None
    sa, sb, so = set(la), set(lb), set(out)
    if not so <= (sa | sb):
        return None
    if sa & sb & so:                   # batch letters
        return None
    if (sa - sb - so) or (sb - sa - so):   # implicit single-operand sums
        return None
    ca = [c for c in la if c in sb and c not in so]
    if not ca:
        return None                    # outer product: einsum is fine
    k = len(ca)

    def block(letters):
        if list(letters[:k]) == ca:
            return True                # prefix
        if list(letters[-k:]) == ca:
            return False               # suffix
        return None

    a_pre = block(la)
    b_pre = block(lb)
    if a_pre is None or b_pre is None:
        return None                    # needs an operand transpose: bail
    fa = [c for c in la if c not in ca]
    fb = [c for c in lb if c not in ca]
    perm_o = tuple((fa + fb).index(c) for c in out)
    return len(fa), len(fb), a_pre, b_pre, perm_o


_PLANS = {}


def gemm_einsum(spec, *ops, **kw):
    """Drop-in jnp.einsum replacement routing eligible 2-operand
    contractions through one flat single-contracting-dim dot (see module
    docstring)."""
    kw.pop("optimize", None)   # meaningless for the 2-operand flat route
    if len(ops) != 2 or kw:
        if len(ops) > 2:
            kw.setdefault("optimize", True)
        return jnp.einsum(spec, *ops, **kw)
    spec = spec.replace(" ", "")
    plan = _PLANS.get(spec, False)
    if plan is False:
        plan = _PLANS[spec] = _plan(spec)
    if plan is None:
        return jnp.einsum(spec, *ops)
    nfa, nfb, a_pre, b_pre, perm_o = plan
    a, b = ops
    sa = a.shape[a.ndim - nfa:] if a_pre else a.shape[:nfa]
    sb = b.shape[b.ndim - nfb:] if b_pre else b.shape[:nfb]
    M = int(np.prod(sa, dtype=np.int64)) if sa else 1
    N = int(np.prod(sb, dtype=np.int64)) if sb else 1
    A2 = a.reshape((-1, M) if a_pre else (M, -1))
    B2 = b.reshape((-1, N) if b_pre else (N, -1))
    dn = (((0 if a_pre else 1,), (0 if b_pre else 1,)), ((), ()))
    O = lax.dot_general(A2, B2, dn)
    O = O.reshape(tuple(sa) + tuple(sb))
    if perm_o != tuple(range(O.ndim)):
        O = jnp.transpose(O, perm_o)
    return O
