"""Property tests of the spin-sector engine (ops/spinsect.py) with
UNEQUAL alpha/beta sector sizes — the open-shell-shaped layouts no
RHF-derived fixture exercises.  The engine's contract: for tensors whose
support really is the balanced-halves rule, sector_einsum equals the dense
einsum exactly, for any SectorInfo."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from ecw_cc_tpu.ops.spinsect import (SectorInfo, _balanced, _slices,
                                     sector_einsum, sliced_support, wrap)

INFOS = [SectorInfo(2, 3, 4, 2), SectorInfo(3, 1, 2, 5),
         SectorInfo(2, 2, 3, 3)]


def _rand_balanced(rng, kinds, info, scale=1.0):
    """Random dense tensor supported exactly on the balanced spin blocks."""
    dims = {"o": info.nocc, "v": info.nvir}
    arr = np.zeros(tuple(dims[k] for k in kinds))
    sl = _slices(info)
    for key in itertools.product((0, 1), repeat=len(kinds)):
        if _balanced(key):
            idx = tuple(sl[(k, s)] for k, s in zip(kinds, key))
            arr[idx] = rng.standard_normal(arr[idx].shape) * scale
    return arr


SPECS = [
    # (spec, operand kinds) — shapes of the production soup/rdm1/(T) terms
    ("ijef,mnef->ijmn", ("oovv", "oovv")),
    ("imae,me->ia", ("oovv", "ov")),
    ("mf,amef->ae", ("ov", "vovv")),
    ("jnfb,mnef->mbej", ("oovv", "oovv")),
    ("ijab,ijab->", ("oovv", "oovv")),
    ("ia,jb,ijab->", ("ov", "ov", "oovv")),
]


@pytest.mark.parametrize("info", INFOS, ids=lambda i: f"oa{i.oa}ob{i.ob}")
def test_sector_einsum_matches_dense_unequal_sectors(info):
    rng = np.random.default_rng(7)
    for spec, kindses in SPECS:
        ops_dense = [_rand_balanced(rng, k, info) for k in kindses]
        ref = np.einsum(spec, *ops_dense, optimize=True)
        ops_b = [wrap(jnp.asarray(a), k, info)
                 for a, k in zip(ops_dense, kindses)]
        out = sector_einsum(spec, *ops_b)
        got = np.asarray(out.dense() if hasattr(out, "dense") else out)
        assert np.allclose(ref, got, atol=1e-12), spec


@pytest.mark.parametrize("info", INFOS, ids=lambda i: f"oa{i.oa}ob{i.ob}")
def test_sliced_support_slab_contractions(info):
    """Slab tensors (one axis fixed at a known spin — the (T) scan body
    pattern) keep exactness under sector_einsum with sliced_support."""
    from ecw_cc_tpu.ops.spinsect import SpinBlocked

    rng = np.random.default_rng(11)
    t2 = _rand_balanced(rng, "oovv", info)
    vovv = _rand_balanced(rng, "vovv", info)
    for sJ, J in ((0, 0), (1, info.oa)):  # one row from each occ sector
        t2J = t2[J]
        ref = np.einsum("kae,ebc->kabc", t2J, vovv[:, J], optimize=True)
        kinds, sup = sliced_support("oovv", {0: sJ})
        t2J_b = SpinBlocked.from_dense(jnp.asarray(t2J), kinds, info,
                                       support=sup)
        kinds_v, sup_v = sliced_support("vovv", {1: sJ})
        vovvJ_b = SpinBlocked.from_dense(jnp.asarray(vovv[:, J]), kinds_v,
                                         info, support=sup_v)
        got = np.asarray(sector_einsum("kae,ebc->kabc", t2J_b,
                                       vovvJ_b).dense())
        assert np.allclose(ref, got, atol=1e-12)


def test_energy_t_sect_unequal_sectors():
    """The sectored (T) energy equals the dense pair scan on a SYNTHETIC
    unequal-sector system (random balanced blocks; parity needs only that
    both routes evaluate the same expression on the same blocks)."""
    from ecw_cc_tpu.models.eris import GEris
    from ecw_cc_tpu.ops.ccsd_t import energy_t, energy_t_sect

    info = SectorInfo(2, 3, 4, 2)
    rng = np.random.default_rng(3)
    no, nv = info.nocc, info.nvir
    blocks = {f: jnp.zeros((0,)) for f in GEris._fields}
    fo = np.concatenate([-1.0 - rng.random(info.oa),
                         -1.2 - rng.random(info.ob)])
    fv = np.concatenate([1.0 + rng.random(info.va),
                         1.3 + rng.random(info.vb)])
    blocks["fock"] = jnp.asarray(np.diag(np.concatenate([fo, fv])))
    for name in ("vovv", "ovoo", "oovv"):
        blocks[name] = jnp.asarray(_rand_balanced(rng, name, info,
                                                  scale=0.1))
    eris = GEris(**blocks)
    t1 = jnp.asarray(_rand_balanced(rng, "ov", info, scale=0.05))
    t2 = jnp.asarray(_rand_balanced(rng, "oovv", info, scale=0.05))
    e_dense = float(energy_t(eris, t1, t2))
    e_sect = float(energy_t_sect(eris, t1, t2, info, sym=False))
    assert abs(e_dense - e_sect) < 1e-12 * max(1.0, abs(e_dense))
