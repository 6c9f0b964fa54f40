"""Segment-level on-chip profile of the r3 production step (sectored+sym).

Times each piece of the iteration body separately at pVTZ shapes so the
gap between the measured full step (~14.3 ms) and its ~6.7 ms HBM byte
floor can be attributed: rdm1 (gamma), energy, ladder GEMMs, t-soup,
lambda-soup.  Segment sums exceed the fused full step (XLA fuses across
the boundaries we cut here); the ranking is what matters.

Run:  python tools/profile_step_r3.py [pvtz|pvdz]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import ecw_cc_tpu.config as config

config.set_config(x64=False, dtype="float32",
                  spin_sorted=True, soup_sector=True, soup_sym=True)
config.setup_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402
from ecw_cc_tpu.models.eris import build_eris_device  # noqa: E402
from ecw_cc_tpu.ops import ccsd as ccsd_ops  # noqa: E402
from ecw_cc_tpu.ops import ladder as ladder_ops  # noqa: E402
from ecw_cc_tpu.ops.ccsd_sect import (  # noqa: E402
    gamma_inter_sect, lupdate_sect, tupdate_sect)
from ecw_cc_tpu.ops.spinsect import sector_info  # noqa: E402

basis = {"pvdz": "cc-pvdz", "pvtz": "cc-pvtz"}[
    sys.argv[1] if len(sys.argv) > 1 else "pvtz"]

mol, ghf = bench.build_host(basis)
eris, vvvv_op = build_eris_device(mol, ghf, dtype="float32",
                                  pack_ladder=True, sort_spin=True)
nocc, nvir = eris.nocc, eris.nvir
perm = ladder_ops.spin_sort_perm(np.asarray(ghf.orbspin), nocc)
info = sector_info(np.asarray(ghf.orbspin)[perm], nocc)
print(f"== {basis}: nocc={nocc} nvir={nvir} ==", flush=True)

diag = jnp.diag(eris.fock)
eia = diag[:nocc, None] - diag[None, nocc:]
eijab = eia[:, None, :, None] + eia[None, :, None, :]
t2 = eris.oovv / eijab
rng = np.random.default_rng(0)
t1 = jnp.asarray(rng.standard_normal((nocc, nvir)) * 0.01, jnp.float32)
l1, l2 = t1 * 0.5, t2 * 0.5
target = jnp.asarray(np.diag(np.asarray(ghf.mo_occ)[perm]), jnp.float32)
Lw = bench.LW


def timeit(name, fn, *args, reps=12):
    f = jax.jit(fn)
    out = f(*args)
    # force values (axon: block_until_ready may be a no-op)
    float(sum(jnp.sum(jnp.abs(jnp.atleast_1d(x)))
              for x in jax.tree_util.tree_leaves(out)))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0])))
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:34s} {best * 1e3:8.2f} ms", flush=True)
    return best


# --- full production step (the bench body) ----------------------------------
step = bench.device_full_step(target, Lw, sect_info=info, sym=True)
timeit("full step (sectored+sym)", step, eris, vvvv_op, t1, t2, l1, l2)

# --- segments ----------------------------------------------------------------
def seg_rdm1(er, a, b, c, d):
    return ccsd_ops.gamma_CCSD(
        a, b, c, d, inter=gamma_inter_sect(a, b, c, d, info, sym=True))


def seg_energy(er, a, b):
    fsp = er.fock
    return ccsd_ops.energy(er, a, b, fsp)


def seg_tau_ladder(sect, a, b, c):
    tau = ccsd_ops.make_tau(b, a, a)
    return ladder_ops.balanced_stacked_sectored_contract(
        sect, tau, c, info.oa, sym=True)


def seg_tsoup(er, a, b, lt):
    return tupdate_sect(er, a, b, er.fock, info, vvvv_op=None,
                        ladder_pre=lt, sym=True)


def seg_lsoup(er, a, b, c, d, ll):
    return lupdate_sect(er, a, b, c, d, er.fock, info, vvvv_op=None,
                        ladder_pre=ll, sym=True)


lt, ll = jax.jit(seg_tau_ladder)(vvvv_op, t1, t2, l2)
timeit("rdm1 (gamma sectored)", seg_rdm1, eris, t1, t2, l1, l2)
timeit("energy", seg_energy, eris, t1, t2)
timeit("tau + balanced ladder GEMMs", seg_tau_ladder, vvvv_op, t1, t2, l2)
timeit("t-soup (ladder precomputed)", seg_tsoup, eris, t1, t2, lt)
timeit("l-soup (ladder precomputed)", seg_lsoup, eris, t1, t2, l1, l2, ll)
