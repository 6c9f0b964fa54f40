"""Sharding rules for the ECW-CC tensors over a ('dp', 'tp') mesh.

Layout rationale (jax-ml scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert the collectives):

  - vvvv <ab||ef>: sharded along the FIRST virtual axis over 'tp'.  In the
    ladder matmul  M[ij, ab] = tau[ij, ef] . W[ab, ef]  the contraction axis
    (ef) stays local after an all-gather-free formulation: each shard owns a
    slice of rows `ab`, computes its output slice locally — no collective at
    all for the dominant term.
  - ovvv / vovv: sharded along their largest virtual axis over 'tp'.
  - oovv / amplitude tensors t2, l2: sharded along the LAST virtual axis over
    'tp' (contractions against vvvv reduce over it -> psum), occupied axes
    replicated (nocc is small in this domain).
  - one-electron data (fock, t1, l1): replicated.
  - an optional leading 'dp' batch axis (lambda sweep / alpha scan / states)
    maps to `vmap` + sharding over 'dp'.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from ecw_cc_tpu.models.eris import GEris


def eris_shardings(mesh):
    """Per-block NamedShardings for a GEris pytree."""
    def S(*spec):
        return NamedSharding(mesh, P(*spec))

    return {
        "fock": S(),
        "oooo": S(),
        "ooov": S(),
        "oovo": S(),
        "oovv": S(None, None, None, "tp"),
        "ovov": S(),
        "ovvo": S(),
        "ovvv": S(None, "tp", None, None),
        "ovoo": S(),
        "vvvv": S("tp", None, None, None),
        "vooo": S(),
        "vovo": S(),
        "voov": S(),
        "vovv": S("tp", None, None, None),
        "vvoo": S(),
        "vvvo": S(),
    }


def amp_shardings(mesh):
    """Shardings for the amplitude pytree {t1, t2, l1, l2}."""
    def S(*spec):
        return NamedSharding(mesh, P(*spec))

    return {
        "t1": S(), "l1": S(),
        "t2": S(None, None, None, "tp"),
        "l2": S(None, None, None, "tp"),
    }


def shard_eris(eris: GEris, mesh) -> GEris:
    sh = eris_shardings(mesh)
    return GEris(**{k: jax.device_put(getattr(eris, k), sh[k])
                    for k in GEris._fields})


def shard_vvvv_op(vvvv_op, mesh):
    """Shard a non-dense ladder operand (ops/ladder.py) over 'tp'.

    PackedVVVV.wc[A, E] is sharded along its ROW (output-pair) axis — the
    same all-gather-free reasoning as the dense vvvv rule: each shard owns a
    slice of output pairs A=(a<b) and contracts the full local E axis; the
    only cross-shard step is the o^2 v^2 unpack/antisymmetrize of the
    result.  p = nvir(nvir-1)/2 is odd for half of all nvir (13041 at
    cc-pVTZ), so the row axis is ZERO-PADDED to a multiple of the 'tp'
    axis size first; packed_vvvv_contract slices the padded output columns
    back to p.  Spin-sector tuples shard along each sector's first axis."""
    if vvvv_op is None:
        return None
    import jax.numpy as jnp

    from ecw_cc_tpu.ops.ladder import PackedVVVV

    if isinstance(vvvv_op, PackedVVVV):
        wc = vvvv_op.wc
        tp = mesh.shape["tp"]
        pad = (-wc.shape[0]) % tp
        if pad:
            wc = jnp.concatenate(
                [wc, jnp.zeros((pad, wc.shape[1]), wc.dtype)], axis=0)
        return PackedVVVV(wc=jax.device_put(
            wc, NamedSharding(mesh, P("tp", None))))
    return tuple(
        jax.device_put(s, NamedSharding(mesh, P("tp", None, None, None)))
        for s in vvvv_op)
