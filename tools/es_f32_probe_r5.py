"""One-iteration sensitivity probe for the f32 ES instability (r5).

Replicates SolverES_Device's body (solvers/es.py:689-754) ONCE in f64 on
CPU, starting from the converged f64 state (/tmp/es_f64_state.npz from
tools/es_f32_drift_r5.py), then repeats it with selected inputs rounded to
f32.  The stage whose rounding reproduces the 2.5 eV jump (7.13 -> 9.7 eV
after ONE f32 iteration) is the amplifier.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import ecw_cc_tpu.config as config

config.set_config(x64=True, dtype="float64")
config.setup_jax()

import numpy as np
import jax.numpy as jnp
from ecw_cc_tpu import ECW
from ecw_cc_tpu.ops import ccs as ccs_ops
from ecw_cc_tpu.ops.ccs import Gccs
from ecw_cc_tpu.ops.vexp import Exp, make_es_vexp_device
from ecw_cc_tpu.solvers.es import Solver_ES

EV = 27.2114


def r32(x):
    return np.asarray(x, np.float32).astype(np.float64)


def main():
    ecw = ECW("h2o", "6-31++g**")
    dip1 = (0.523742 + 0.550251) / 2.0
    dip2 = (0.622534 + 0.649058) / 2.0
    ecw.Build_ES_exp_input([[["trdip", (dip1, 0.0, 0.0)]],
                            [["trdip", (0.0, 0.0, dip2)]]])
    L = 0.1
    V = Exp(L, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    s = Solver_ES(Gccs(ecw.eris), V, rn_ini=ecw.r_ini, conv_var="rl",
                  conv_thres=1e-7, maxiter=120, diis="all")
    vexp_fn = make_es_vexp_device(V)
    eris = s.mycc.eris
    Lflat = jnp.asarray(np.concatenate(
        [np.atleast_1d(np.asarray(st, float)) for st in V.L]))

    z = np.load("/tmp/es_f64_state.npz")
    seed = {k: np.asarray(z[k]) for k in
            ("ts", "ls", "rn", "ln", "r0n", "l0n")}
    ov = np.zeros((2, 2), dtype=np.int32)
    for i, r in enumerate(ecw.r_ini):
        w = np.argwhere(np.asarray(r) == 1)
        ov[i] = w[0]

    def one_iter(st, round_stages=()):
        """round_stages: subset of {'state','rdm1','vexp','fsp','tl',
        'rinter'} — cast that stage's INPUTS/outputs through f32."""
        R = lambda tag, x: jnp.asarray(r32(x)) if tag in round_stages else x
        ts = R("state", jnp.asarray(st["ts"]))
        ls = R("state", jnp.asarray(st["ls"]))
        rn = R("state", jnp.asarray(st["rn"]))
        ln = R("state", jnp.asarray(st["ln"]))
        r0n = R("state", jnp.asarray(st["r0n"]))
        l0n = R("state", jnp.asarray(st["l0n"]))

        rdm1_gs = ccs_ops.gamma_CCS(ts, ls)
        rdm1_es = jnp.stack([ccs_ops.gamma_es_CCS(ts, ln[i], rn[i], r0n[i],
                                                  l0n[i]) for i in range(2)])
        tr_r = jnp.stack([ccs_ops.gamma_tr_CCS(ts, ln[i], jnp.zeros_like(ts),
                                               1.0, l0n[i]) for i in range(2)])
        tr_l = jnp.stack([ccs_ops.gamma_tr_CCS(ts, ls, rn[i], r0n[i], 1.0)
                          for i in range(2)])
        rdm1_gs, rdm1_es = R("rdm1", rdm1_gs), R("rdm1", rdm1_es)
        tr_r, tr_l = R("rdm1", tr_r), R("rdm1", tr_l)

        V00, Vnn, V0n, Vn0, Delta = vexp_fn(rdm1_gs, rdm1_es, tr_r, tr_l,
                                            Lflat)
        V00, Vnn = R("vexp", V00), R("vexp", Vnn)
        V0n, Vn0 = R("vexp", V0n), R("vexp", Vn0)

        fsp0 = R("fsp", eris.fock - V00)
        fspn = R("fsp", eris.fock[None] - Vnn)

        T1i = ccs_ops.T1inter(eris, ts, fsp0)
        ts = ccs_ops.tsupdate(eris, ts, T1i, rsn=rn, r0n=r0n, vn=V0n)
        L1i = ccs_ops.L1inter(eris, ts, fsp0)
        ls = ccs_ops.lsupdate(eris, ts, ls, L1i, rsn=rn, lsn=ln, r0n=r0n,
                              l0n=l0n, vn=Vn0)
        ts, ls = R("tl", ts), R("tl", ls)

        Em = np.zeros(2)
        for i in range(2):
            Ri = ccs_ops.R1inter(eris, ts, fspn[i], V0n[i])
            if "rinter" in round_stages:
                Ri = tuple(jnp.asarray(r32(x)) for x in Ri)
            Em_i, _, _ = ccs_ops.Extract_Em_r(eris, rn[i], r0n[i], Ri,
                                              ov=(int(ov[i, 0]),
                                                  int(ov[i, 1])))
            Em[i] = float(Em_i)
        return Em

    base = one_iter(seed)
    print(f"f64 one-iter Em: {base * EV}")
    for stages in [("state",), ("rdm1",), ("vexp",), ("fsp",), ("tl",),
                   ("rinter",),
                   ("state", "rdm1", "vexp", "fsp", "tl", "rinter")]:
        em = one_iter(seed, stages)
        print(f"round {','.join(stages):<40s} Em_eV={np.round(em * EV, 4)}"
              f"  dE1={abs(em[0] - base[0]) * EV:.2e} eV")


if __name__ == "__main__":
    main()
