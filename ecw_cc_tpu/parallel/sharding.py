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

    from ecw_cc_tpu.ops.ladder import PackedVVVV, SectoredVVVV

    tp = mesh.shape["tp"]

    def pad_rows(w):
        pad = (-w.shape[0]) % tp
        if pad:
            w = jnp.concatenate(
                [w, jnp.zeros((pad, w.shape[1]), w.dtype)], axis=0)
        return jax.device_put(w, NamedSharding(mesh, P("tp", None)))

    if isinstance(vvvv_op, PackedVVVV):
        return PackedVVVV(wc=pad_rows(vvvv_op.wc))
    if isinstance(vvvv_op, SectoredVVVV):
        # each sector GEMM is independently row-sharded (output pairs);
        # the contraction (column) axes stay local -> no collective in the
        # ladder itself, same as the packed rule
        return SectoredVVVV(wc_aa=pad_rows(vvvv_op.wc_aa),
                            wc_bb=pad_rows(vvvv_op.wc_bb),
                            w_ab=pad_rows(vvvv_op.w_ab))
    return tuple(
        jax.device_put(s, NamedSharding(mesh, P("tp", None, None, None)))
        for s in vvvv_op)
