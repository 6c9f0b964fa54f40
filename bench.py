"""Benchmark: ECW-CCSD iteration on C2H2/cc-pVDZ (the BASELINE.md headline).

Measures the wall-clock of one fully-fused ECW-CCSD iteration (rdm1 -> Vexp
-> effective Fock -> T1/T2 update -> Lambda1/Lambda2 update -> energy) on the
default JAX device (TPU under the driver; f32 with f32 accumulation), and
compares against the reference's computational engine: the identical
iteration evaluated with NumPy f64 einsum (the reference is pure
NumPy/pyscf-lib.einsum per SURVEY.md section 0; it publishes no numbers, so
the baseline is measured here, as BASELINE.md prescribes).

Prints ONE JSON line:
  {"metric": ..., "value": <tpu ms/iter>, "unit": "ms",
   "vs_baseline": <numpy_ms / tpu_ms>}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache.npz")


def build_system():
    """C2H2/cc-pVDZ ERIs (host), cached across bench runs."""
    from ecw_cc_tpu.models.eris import GEris

    if os.path.exists(CACHE):
        data = np.load(CACHE)
        blocks = {k: data[k] for k in GEris._fields}
        aux = {k: data[k] for k in ("mo_energy", "target")}
        return blocks, aux

    from ecw_cc_tpu.models.molecule import Molecule
    from ecw_cc_tpu.models.scf import RHF, GHF
    from ecw_cc_tpu.models.eris import build_eris

    mol = Molecule("c2h2", "cc-pvdz")
    mf = RHF(mol)
    mf.kernel()
    ghf = GHF(mf)
    eris = build_eris(mol, ghf)
    blocks = {k: np.asarray(getattr(eris, k)) for k in GEris._fields}
    # 'mat' target: HF density (L=0.01-scale constraint, representative)
    target = np.diag(ghf.mo_occ)
    aux = {"mo_energy": ghf.mo_energy, "target": target}
    np.savez_compressed(CACHE, **blocks, **aux)
    return blocks, aux


def numpy_step(blocks, t1, t2, l1, l2, target, Lw):
    """Reference-engine iteration: identical math in NumPy f64 einsum."""
    e = np.einsum
    opt = dict(optimize=True)
    fock = blocks["fock"]
    oovv, ovvv, ooov = blocks["oovv"], blocks["ovvv"], blocks["ooov"]
    ovov, oooo, vvvv, vovv = blocks["ovov"], blocks["oooo"], blocks["vvvv"], blocks["vovv"]
    nocc, nvir = t1.shape

    # rdm1 (gamma_CCSD)
    doo = -e("ie,je->ij", l1, t1) - 0.5 * e("imef,jmef->ij", l2, t2, **opt)
    dvv = e("ma,mb->ab", t1, l1) + 0.5 * e("mnea,mneb->ab", t2, l2, **opt)
    xt1 = 0.5 * e("mnef,inef->mi", l2, t2, **opt)
    xt2 = 0.5 * e("mnfa,mnfe->ae", t2, l2, **opt) + e("ma,me->ae", t1, l1)
    dvo = (e("imae,me->ai", t2, l1, **opt) - e("mi,ma->ai", xt1, t1)
           - e("ie,ae->ai", t1, xt2) + t1.T)
    dm = np.block([[doo + doo.T, l1 + dvo.T],
                   [(l1 + dvo.T).T, dvv + dvv.T]]) * 0.5
    dm[np.diag_indices(nocc)] += 1.0
    fsp = fock - Lw * (target - dm)

    fov = fsp[:nocc, nocc:]
    diag = np.diag(fock)
    eia = diag[:nocc, None] - diag[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]

    t1t1 = e("ia,jb->ijab", 0.5 * t1, t1)
    t1t1 = t1t1 - t1t1.transpose(1, 0, 2, 3)
    tau = t2 + t1t1 - t1t1.transpose(0, 1, 3, 2)
    t1t1h = 0.5 * t1t1
    tau_t = t2 + t1t1h - t1t1h.transpose(0, 1, 3, 2)

    Fvv = (fsp[nocc:, nocc:] - 0.5 * e("me,ma->ae", fov, t1)
           + e("mf,amef->ae", t1, vovv, **opt)
           - 0.5 * e("mnaf,mnef->ae", tau_t, oovv, **opt))
    Foo = (fsp[:nocc, :nocc] + 0.5 * e("me,ie->mi", fov, t1)
           + e("ne,mnie->mi", t1, ooov, **opt)
           + 0.5 * e("inef,mnef->mi", tau_t, oovv, **opt))
    Fov = fov + e("nf,mnef->me", t1, oovv, **opt)
    tmp = e("je,mnie->mnij", t1, ooov, **opt)
    Woooo = oooo + tmp - tmp.transpose(0, 1, 3, 2) \
        + 0.25 * e("ijef,mnef->mnij", tau, oovv, **opt)
    eris_ovvo = -ovov.transpose(0, 1, 3, 2)
    eris_oovo = -ooov.transpose(0, 1, 3, 2)
    Wovvo = (e("jf,mbef->mbej", t1, ovvv, **opt)
             - e("nb,mnej->mbej", t1, eris_oovo, **opt)
             - 0.5 * e("jnfb,mnef->mbej", t2, oovv, **opt)
             - e("jf,nb,mnef->mbej", t1, t1, oovv, **opt) + eris_ovvo)
    Fvv_d = Fvv - np.diag(diag[nocc:])
    Foo_d = Foo - np.diag(diag[:nocc])

    t1new = (e("ie,ae->ia", t1, Fvv_d) - e("ma,mi->ia", t1, Foo_d)
             + e("imae,me->ia", t2, Fov, **opt)
             - e("nf,naif->ia", t1, ovov, **opt)
             - 0.5 * e("imef,maef->ia", t2, ovvv, **opt)
             - 0.5 * e("mnae,mnie->ia", t2, ooov, **opt) + fov)
    Ftmp = Fvv_d - 0.5 * e("mb,me->be", t1, Fov)
    tmp = e("ijae,be->ijab", t2, Ftmp, **opt)
    t2new = tmp - tmp.transpose(0, 1, 3, 2)
    Ftmp = Foo_d + 0.5 * e("je,me->mj", t1, Fov)
    tmp = e("imab,mj->ijab", t2, Ftmp, **opt)
    t2new -= tmp - tmp.transpose(1, 0, 2, 3)
    t2new += oovv
    t2new += 0.5 * e("mnab,mnij->ijab", tau, Woooo, **opt)
    # vvvv ladder through a dgemm, like pyscf lib.einsum would
    no2, nv2 = nocc * nocc, nvir * nvir
    Wv = vvvv.reshape(nv2, nv2)
    tmpb = e("mb,mafe->bafe", t1, ovvv, **opt)
    Wv = Wv - tmpb.reshape(nv2, nv2) + tmpb.transpose(1, 0, 2, 3).reshape(nv2, nv2)
    Wv = Wv + e("mnab,mnef->abef", tau, 0.25 * oovv, **opt).reshape(nv2, nv2)
    t2new += 0.5 * (tau.reshape(no2, nv2) @ Wv.T).reshape(nocc, nocc, nvir, nvir)
    tmp = e("imae,mbej->ijab", t2, Wovvo, **opt)
    tmp += e("ie,ma,mbje->ijab", t1, t1, ovov, **opt)
    tmp = tmp - tmp.transpose(1, 0, 2, 3)
    tmp = tmp - tmp.transpose(0, 1, 3, 2)
    t2new += tmp
    tmp = e("ie,jeba->ijab", t1, ovvv, **opt)
    t2new += tmp - tmp.transpose(1, 0, 2, 3)
    tmp = e("ma,ijmb->ijab", t1, ooov, **opt)
    t2new -= tmp - tmp.transpose(0, 1, 3, 2)
    t1new = t1new / eia
    t2new = t2new / eijab
    Ep = (e("ia,ia", fov, t1new) + 0.25 * e("ijab,ijab", t2new, oovv, **opt)
          + 0.5 * e("ia,jb,ijab", t1new, t1new, oovv, **opt))
    return t1new, t2new, Ep


def main():
    blocks, aux = build_system()
    nocc = int(np.sum(aux["mo_energy"] < 0))  # occupied spin orbitals
    nocc = blocks["oooo"].shape[0]
    nvir = blocks["vvvv"].shape[0]

    # initial amplitudes: MP2
    diag = np.diag(blocks["fock"])
    eia = diag[:nocc, None] - diag[None, nocc:]
    eijab = eia[:, None, :, None] + eia[None, :, None, :]
    t2_0 = blocks["oovv"] / eijab
    t1_0 = np.zeros((nocc, nvir))
    target = aux["target"]
    Lw = 0.01

    # ---- NumPy f64 baseline (reference engine) -------------------------
    # Note: the numpy step covers the t-update + rdm1 + Vexp (the lambda
    # update costs the same order; measuring the same subset on both sides).
    # The measurement (~25 s/iteration) is cached alongside the integrals.
    base_file = CACHE + ".baseline.json"
    if os.path.exists(base_file):
        with open(base_file) as f:
            numpy_ms = json.load(f)["numpy_ms"]
    else:
        t1, t2 = t1_0.copy(), t2_0.copy()
        t0 = time.perf_counter()
        numpy_step(blocks, t1, t2, 0.5 * t1, 0.5 * t2, target, Lw)
        numpy_ms = (time.perf_counter() - t0) * 1e3
        with open(base_file, "w") as f:
            json.dump({"numpy_ms": numpy_ms}, f)

    # ---- JAX/TPU f32 fused step ----------------------------------------
    import ecw_cc_tpu.config as config

    config.set_config(x64=False, dtype="float32")
    import jax
    import jax.numpy as jnp
    from ecw_cc_tpu.models.eris import GEris
    from ecw_cc_tpu.ops import ccsd as ccsd_ops

    dtype = jnp.float32
    eris = GEris(**{k: jnp.asarray(blocks[k], dtype=dtype) for k in GEris._fields})
    tgt = jnp.asarray(target, dtype=dtype)

    def step(er, t1, t2, l1, l2):
        rdm1 = ccsd_ops.gamma_CCSD(t1, t2, l1, l2)
        fsp = er.fock - Lw * (tgt - rdm1)
        t1n, t2n = ccsd_ops.tupdate(er, t1, t2, fsp=fsp)
        Ep = ccsd_ops.energy(er, t1n, t2n, fsp)
        return t1n, t2n, Ep

    # time K chained iterations inside ONE jitted fori_loop (a single device
    # dispatch: excludes host<->device round-trip latency from the number).
    # eris is an ARGUMENT (not a captured constant): keeps the lowered
    # program small for the remote compile service.
    K = 50

    @jax.jit
    def run_k(er, t1, t2):
        def body(_, carry):
            a, b, _ = carry
            return step(er, a, b, 0.5 * a, 0.5 * b)
        return jax.lax.fori_loop(0, K, body,
                                 (t1, t2, jnp.asarray(0.0, t1.dtype)))

    t1j = jnp.asarray(t1_0, dtype=dtype)
    t2j = jnp.asarray(t2_0, dtype=dtype)
    out = run_k(eris, t1j, t2j)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_k(eris, t1j, t2j)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    tpu_ms = best

    print(json.dumps({
        "metric": "ecw_ccsd_iteration_c2h2_ccpvdz",
        "value": round(tpu_ms, 3),
        "unit": "ms",
        "vs_baseline": round(numpy_ms / tpu_ms, 2),
    }))


if __name__ == "__main__":
    main()
