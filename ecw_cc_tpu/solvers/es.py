"""Excited-state ECW-CCS solver: coupled T, Lambda, R/L/r0/l0 equations.

Re-implements reference Solver_ES.py (class Solver_ES :26-496): per
iteration, all state and transition rdm1s are built, the Vexp[n,m] matrix is
refreshed, the GS t/lambda amplitudes are updated with the ES-coupling terms,
and each excited state's (r, r0, l, l0) is updated with its energy extracted
from the largest amplitude; spin/orthonormality are monitored.  DIIS modes
'GS' | 'ES' | 'all' mirror Solver_ES.py:320-411.

A Davidson-refined variant (`SCF_diag`) replaces the reference's partially
stale SCF_diag (Solver_ES.py:502-862): at each macro-iteration the R1
equations are diagonalized in the full singles space (the intended behavior;
system sizes there are tiny) instead of the power-iteration rsupdate.
"""

from __future__ import annotations

import copy

import numpy as np
import jax.numpy as jnp

from ecw_cc_tpu.ops import ccs as ccs_ops
from ecw_cc_tpu.models.scf import HostDIIS
from ecw_cc_tpu.utils import linalg as ulinalg

format_float = "{:.4e}"

try:
    from tabulate import tabulate
except ImportError:  # pragma: no cover
    tabulate = None


class Solver_ES:
    def __init__(self, mycc, Vexp, rn_ini=None, tsini=None, lsini=None,
                 val_core=None, rini_koop_idx=None, conv_var="tl",
                 conv_thres=1e-6, diis="", maxiter=40, maxdiis=20, mindiis=2,
                 tablefmt="rst"):
        self.mycc = mycc
        self.Vexp_class = Vexp
        self.nbr_states = Vexp.nbr_states
        self.tablefmt = tablefmt
        self.nocc = mycc.nocc
        self.nvir = mycc.nvir
        self.dim = self.nocc + self.nvir
        self.EHF = getattr(mycc.eris, "EHF", None)

        self.tsini = (np.zeros((self.nocc, self.nvir)) if tsini is None
                      else np.asarray(tsini))
        self.lsini = (np.zeros((self.nocc, self.nvir)) if lsini is None
                      else np.asarray(lsini))

        fock_diag = np.diag(np.asarray(mycc.fock))
        if rn_ini is None:
            if val_core is None:
                val_core = [self.nbr_states - 1, 0]
            self.rn_ini, de = ulinalg.koopman_init_guess(
                fock_diag, self._mo_occ(), val_core, koop_idx=rini_koop_idx)
        else:
            if len(rn_ini) != self.nbr_states - 1:
                raise ValueError("number of initial r vectors inconsistent "
                                 "with the experimental data")
            self.rn_ini = [np.asarray(r) for r in rn_ini]
            de = [ulinalg.get_DE(fock_diag, r) for r in self.rn_ini]

        self.ln_ini = [r.copy() for r in self.rn_ini]
        zero_f = np.zeros((self.dim, self.dim))
        self.r0_ini = [float(ccs_ops.r0_fromE(mycc.eris, d, jnp.zeros_like(jnp.asarray(r)),
                                              jnp.asarray(r), jnp.asarray(zero_f)))
                       for r, d in zip(self.rn_ini, de)]
        self.l0_ini = [x for x in self.r0_ini]
        self.E_ini = -np.asarray(de)
        print(" Initial Koopman energies in eV: ", -self.E_ini * 27.2114)

        self.diis = diis
        self.maxdiis = maxdiis
        self.mindiis = mindiis
        self.maxiter = maxiter
        self.conv_thres = conv_thres
        if conv_var not in ("Ep", "rl", "tl", "all"):
            raise ValueError("accepted convergence parameter is Ep, tl, rl or all")
        self.conv_var = conv_var

    def _mo_occ(self):
        occ = np.zeros(self.dim)
        occ[: self.nocc] = 1.0
        return occ

    # -- convergence checks (reference Solver_ES.py:119-140) --------------
    def _conv(self, dic):
        if self.conv_var == "Ep":
            return np.asarray(dic["Ep"]).copy()
        if self.conv_var == "tl":
            return np.asarray(dic["ts"]) + np.asarray(dic["ls"])
        if self.conv_var == "rl":
            ans = np.zeros_like(np.asarray(dic["rn"][0]))
            for r, l in zip(dic["rn"], dic["ln"]):
                ans = ans + np.asarray(r) + np.asarray(l)
            return ans
        ans = np.asarray(dic["ts"]) + np.asarray(dic["ls"])
        for r, l in zip(dic["rn"], dic["ln"]):
            ans = ans + np.asarray(r) + np.asarray(l)
        return ans

    # ------------------------------------------------------------------
    def SCF(self, L=None, dic_amp_ini=None, diis=None, force_alpha=True,
            print_ite=True, use_diag=False):
        """Coupled multi-state SCF (reference Solver_ES.py:146-496)."""
        Vexp_class = self.Vexp_class
        nbr_states = self.nbr_states
        mycc = self.mycc
        eris = mycc.eris
        nocc, nvir = self.nocc, self.nvir

        if L is None:
            L = Vexp_class.L
        else:
            L = Vexp_class.L_check(L)

        if dic_amp_ini is None:
            ts = jnp.asarray(self.tsini)
            ls = jnp.asarray(self.lsini)
            rn = [jnp.asarray(r) for r in self.rn_ini]
            ln = [jnp.asarray(l) for l in self.ln_ini]
            r0n = list(self.r0_ini)
            l0n = list(self.l0_ini)
            ov = [tuple(int(x[0]) for x in np.where(np.asarray(r) == 1))
                  for r in self.rn_ini]
            ov = [o if len(o) == 2 else None for o in ov]
        else:
            ts = jnp.asarray(dic_amp_ini["ts"])
            ls = jnp.asarray(dic_amp_ini["ls"])
            rn = [jnp.asarray(r) for r in dic_amp_ini["rn"]]
            ln = [jnp.asarray(l) for l in dic_amp_ini["ln"]]
            r0n = list(dic_amp_ini["r0n"])
            l0n = list(dic_amp_ini["l0n"])
            ov = [None] * (nbr_states - 1)

        dic_amp = {"ts": ts, "ls": ls, "rn": rn, "ln": ln, "r0n": r0n, "l0n": l0n}
        rnew = [None] * (nbr_states - 1)
        lnew = [None] * (nbr_states - 1)
        r0new = [None] * (nbr_states - 1)
        l0new = [None] * (nbr_states - 1)
        fsp = [None] * nbr_states
        rdm1 = [None] * nbr_states
        tr_rdm1 = [None] * (nbr_states - 1)
        Spin = np.zeros(nbr_states - 1)
        diis = self.diis if diis is None else diis

        Delta = np.zeros((nbr_states, nbr_states))
        Ep = np.zeros((nbr_states, 2))
        conv = 0.0
        Dconv = 1.0
        ite = 0
        Delta_ite, Ep_ite, conv_ite = [], [], []
        amp_diis = HostDIIS(space=self.maxdiis, min_space=self.mindiis) if diis else None

        table, headers = [], []
        if print_ite:
            headers = ["ite", "Dconv " + str(self.conv_var)]
            for i in range(nbr_states - 1):
                cols = [f"ES {i + 1}", "norm", "Delta_r", "Delta_l", "2S+1",
                        "r0", "l0", "Er", "El"]
                if i > 0:
                    cols.append("Ortho wrt ES 1")
                headers.extend(cols)

        fock = jnp.asarray(mycc.fock)
        C_norm = np.eye(nbr_states - 1)
        Conv_text = ""

        while Dconv > self.conv_thres:
            conv_old = conv

            # all rdm1 / tr_rdm1 (reference :254-268)
            rdm1[0] = ccs_ops.gamma_CCS(ts, ls)
            for n in range(1, nbr_states):
                rdm1[n] = ccs_ops.gamma_es_CCS(ts, ln[n - 1], rn[n - 1],
                                               r0n[n - 1], l0n[n - 1])
                tr_r = ccs_ops.gamma_tr_CCS(ts, ln[n - 1], jnp.zeros_like(ts),
                                            1.0, l0n[n - 1])
                tr_l = ccs_ops.gamma_tr_CCS(ts, ls, rn[n - 1], r0n[n - 1], 1.0)
                tr_rdm1[n - 1] = [tr_r, tr_l]

            # Vexp updates (reference :274-296).  Vexp[0,0] is reset every
            # macro-iteration: the reference resets it inside the (0,0)
            # Vexp_update, which is skipped when the GS has no target data —
            # the ES DEk contribution would then accumulate unboundedly.
            Vexp_class.Vexp[0, 0] = np.zeros((self.dim, self.dim))
            if Vexp_class.exp_data[0]:
                Delta[0, 0], _ = Vexp_class.Vexp_update(
                    np.asarray(rdm1[0]), tr_rdm1, (0, 0), L=L)
            for n in range(1, nbr_states):
                if Vexp_class.exp_data[n]:
                    names = Vexp_class.prop_names[n]
                    if "trdip" in names or "trmat" in names:
                        Delta[n, 0], _ = Vexp_class.Vexp_update(
                            np.asarray(tr_rdm1[n - 1][0]),
                            np.asarray(tr_rdm1[n - 1][1]), (n, 0), L=L)
                        Delta[0, n], _ = Vexp_class.Vexp_update(
                            np.asarray(tr_rdm1[n - 1][1]),
                            np.asarray(tr_rdm1[n - 1][0]), (0, n), L=L)
                    else:
                        Delta[n, n], _ = Vexp_class.Vexp_update(
                            np.asarray(rdm1[n]), np.asarray(rdm1[0]), (n, n), L=L)
                        fsp[n] = fock - jnp.asarray(Vexp_class.Vexp[n, n])
                if fsp[n] is None:
                    fsp[n] = fock
            if Vexp_class.Vexp[0, 0] is not None:
                fsp[0] = fock - jnp.asarray(np.asarray(Vexp_class.Vexp[0, 0],
                                                       dtype=float))
            else:
                fsp[0] = fock
            Delta_ite.append(Delta.copy())

            # stacked ES quantities for the coupled GS updates
            def stack_v(col):
                # col: list over n of Vexp[0,n] or Vexp[n,0] (may be None)
                out = []
                for v in col:
                    if v is None or np.isscalar(v):
                        out.append(np.zeros((self.dim, self.dim)))
                    else:
                        out.append(np.asarray(v, dtype=float))
                return jnp.asarray(np.stack(out))

            # t update with ES coupling (reference :301-305)
            v0n = stack_v([Vexp_class.Vexp[0, n] for n in range(1, nbr_states)])
            T1i = ccs_ops.T1inter(eris, ts, fsp[0])
            ts = ccs_ops.tsupdate(eris, ts, T1i, rsn=jnp.stack(rn),
                                  r0n=jnp.asarray(r0n), vn=v0n)

            # lambda update with ES coupling (reference :309-314)
            vn0 = stack_v([Vexp_class.Vexp[n, 0] for n in range(1, nbr_states)])
            L1i = ccs_ops.L1inter(eris, ts, fsp[0])
            ls = ccs_ops.lsupdate(eris, ts, ls, L1i, rsn=jnp.stack(rn),
                                  lsn=jnp.stack(ln), r0n=jnp.asarray(r0n),
                                  l0n=jnp.asarray(l0n), vn=vn0)

            if diis == "GS":
                vec = np.concatenate([np.ravel(ls), np.ravel(ts)])
                lsv, tsv = np.split(amp_diis.update(vec), 2)
                ls = jnp.asarray(lsv.reshape(nocc, nvir))
                ts = jnp.asarray(tsv.reshape(nocc, nvir))

            # per-state R/L updates (reference :332-373)
            for n in range(1, nbr_states):
                vexp = Vexp_class.Vexp[0, n]
                vexp = None if (vexp is None or np.isscalar(vexp)) else jnp.asarray(
                    np.asarray(vexp, dtype=float))
                Rinter = ccs_ops.R1inter(eris, ts, fsp[n], vexp)
                En_r, o, v = ccs_ops.Extract_Em_r(eris, rn[n - 1], r0n[n - 1],
                                                  Rinter, ov=ov[n - 1])
                En_r = float(En_r)
                o, v = int(o), int(v)
                rnew[n - 1] = ccs_ops.rsupdate(eris, rn[n - 1], r0n[n - 1],
                                               Rinter, En_r,
                                               force_alpha=force_alpha)
                rov = ccs_ops.get_ov(ln[n - 1], l0n[n - 1], rn[n - 1],
                                     r0n[n - 1], (o, v))
                rnew[n - 1] = rnew[n - 1].at[o, v].set(float(rov))
                r0new[n - 1] = float(ccs_ops.r0_fromE(eris, En_r, ts, rn[n - 1],
                                                      vexp, fsp=fsp[n]))

                vexp_l = Vexp_class.Vexp[n, 0]
                vexp_l = None if (vexp_l is None or np.isscalar(vexp_l)) else \
                    jnp.asarray(np.asarray(vexp_l, dtype=float))
                Linter = ccs_ops.es_L1inter(eris, ts, fsp[n], vexp_l)
                En_l, o, v = ccs_ops.Extract_Em_l(eris, ln[n - 1], l0n[n - 1],
                                                  Linter, ov=ov[n - 1])
                En_l = float(En_l)
                o, v = int(o), int(v)
                lnew[n - 1] = ccs_ops.es_lsupdate(eris, ln[n - 1], l0n[n - 1],
                                                  En_l, Linter,
                                                  force_alpha=force_alpha)
                lov = ccs_ops.get_ov(rn[n - 1], r0n[n - 1], ln[n - 1],
                                     l0n[n - 1], (o, v))
                lnew[n - 1] = lnew[n - 1].at[o, v].set(float(lov))
                l0new[n - 1] = float(ccs_ops.l0_fromE(eris, En_l, ts, ln[n - 1],
                                                      vexp_l, fsp=fsp[n]))
                Ep[n, 0] = En_r
                Ep[n, 1] = En_l

            # DIIS over ES or all amplitudes (reference :376-411)
            if diis == "ES":
                vec = np.concatenate(
                    [np.ravel(rnew[0]), np.ravel(lnew[0]),
                     np.atleast_1d(r0new[0]), np.atleast_1d(l0new[0])])
                vec = amp_diis.update(vec)
                nov = nocc * nvir
                rnew[0] = jnp.asarray(vec[:nov].reshape(nocc, nvir))
                lnew[0] = jnp.asarray(vec[nov:2 * nov].reshape(nocc, nvir))
                r0new[0] = float(vec[-2])
                l0new[0] = float(vec[-1])
            elif diis == "all":
                nES = len(r0new)
                vec = np.concatenate(
                    [np.ravel(ts), np.ravel(ls)]
                    + [np.ravel(r) for r in rnew] + [np.ravel(l) for l in lnew]
                    + [np.atleast_1d(x) for x in r0new]
                    + [np.atleast_1d(x) for x in l0new])
                vec = amp_diis.update(vec)
                nov = nocc * nvir
                ts = jnp.asarray(vec[:nov].reshape(nocc, nvir))
                ls = jnp.asarray(vec[nov:2 * nov].reshape(nocc, nvir))
                for i in range(nES):
                    rnew[i] = jnp.asarray(
                        vec[(2 + i) * nov:(3 + i) * nov].reshape(nocc, nvir))
                    lnew[i] = jnp.asarray(
                        vec[(2 + nES + i) * nov:(3 + nES + i) * nov].reshape(nocc, nvir))
                    r0new[i] = float(vec[-2 * nES + i])
                    l0new[i] = float(vec[-nES + i])

            # orthonormality / spin diagnostics (reference :419-421)
            C_norm = ulinalg.check_ortho([np.asarray(x) for x in lnew],
                                         [np.asarray(x) for x in rnew],
                                         l0new, r0new)
            for i in range(nbr_states - 1):
                Spin[i] = ulinalg.check_spin(np.asarray(rnew[i]), np.asarray(lnew[i]))

            rn = [x for x in rnew]
            ln = [x for x in lnew]
            r0n = list(r0new)
            l0n = list(l0new)
            dic_amp = {"ts": np.asarray(ts), "ls": np.asarray(ls),
                       "rn": [np.asarray(x) for x in rn],
                       "ln": [np.asarray(x) for x in ln],
                       "r0n": r0n, "l0n": l0n}

            # GS energy with ES contributions (reference :436-438)
            vexp0 = stack_v([Vexp_class.Vexp[0, n] for n in range(1, nbr_states)])
            Ep[0, 0] = float(ccs_ops.energy_ccs(eris, ts, fsp[0],
                                                rsn=jnp.stack(rn),
                                                r0n=jnp.asarray(r0n), vn=vexp0))
            Ep_ite.append(Ep.copy())

            conv = self._conv({**dic_amp, "Ep": Ep, "fsp": fsp[0]})
            if ite > 0:
                Dconv = float(np.linalg.norm(conv - conv_old))
            conv_ite.append(Dconv)

            if print_ite:
                tmp = [ite, format_float.format(Dconv)]
                for i in range(nbr_states - 1):
                    cols = ["", format_float.format(C_norm[i, i]),
                            Delta[i + 1, 0], Delta[0, i + 1], 2 * Spin[i] + 1,
                            r0n[i], l0n[i], Ep[i + 1, 0], Ep[i + 1, 1]]
                    if i > 0:
                        cols.append(format_float.format((C_norm[0, i] + C_norm[i, 0]) / 2))
                    tmp.extend(cols)
                table.append(tmp)

            if ite >= self.maxiter:
                Conv_text = "Max iteration reached"
                break
            if Dconv > 10.0:
                Conv_text = f"Diverges for lambda = {L} after {ite} iterations"
                break
            ite += 1
        else:
            Conv_text = f"Convergence reached for lambda= {L}, after {ite} iteration"

        if print_ite and tabulate is not None:
            print(tabulate(table, headers, tablefmt=self.tablefmt))

        return Conv_text, dic_amp, Delta, Ep, np.asarray(rdm1[0])

    # ------------------------------------------------------------------
    def SCF_diag(self, L=None, dic_amp_ini=None, print_ite=True,
                 davidson=False, max_space=20):
        """Davidson-style variant: at each macro-iteration the R1/L1 updates
        are replaced by diagonalization of the similarity-transformed singles
        matrix (intended behavior of the reference's stale SCF_diag,
        Solver_ES.py:502-862).  With davidson=True the matrix-free
        non-symmetric Davidson solver (utils.linalg.davidson_nosym, the
        analogue of pyscf lib.davidson_nosym1 at Solver_ES.py:710-711) is
        used with the orbital-energy-difference diagonal preconditioner;
        otherwise exact dense diagonalization."""
        Vexp_class = self.Vexp_class
        nbr_states = self.nbr_states
        mycc = self.mycc
        eris = mycc.eris
        nocc, nvir = self.nocc, self.nvir
        if L is None:
            L = Vexp_class.L
        else:
            L = Vexp_class.L_check(L)

        ts = jnp.asarray(self.tsini if dic_amp_ini is None else dic_amp_ini["ts"])
        ls = jnp.asarray(self.lsini if dic_amp_ini is None else dic_amp_ini["ls"])
        rn = [jnp.asarray(r) for r in (self.rn_ini if dic_amp_ini is None
                                       else dic_amp_ini["rn"])]
        ln = [jnp.asarray(l) for l in (self.ln_ini if dic_amp_ini is None
                                       else dic_amp_ini["ln"])]
        r0n = list(self.r0_ini if dic_amp_ini is None else dic_amp_ini["r0n"])
        l0n = list(self.l0_ini if dic_amp_ini is None else dic_amp_ini["l0n"])

        fock = jnp.asarray(mycc.fock)
        Delta = np.zeros((nbr_states, nbr_states))
        Ep = np.zeros((nbr_states, 2))
        conv = 0.0
        Dconv = 1.0
        ite = 0
        Conv_text = ""
        rdm1_gs = None
        nov = nocc * nvir

        while Dconv > self.conv_thres:
            conv_old = conv
            rdm1_gs = ccs_ops.gamma_CCS(ts, ls)
            fsp = [fock] * nbr_states
            if Vexp_class.exp_data[0]:
                Delta[0, 0], _ = Vexp_class.Vexp_update(
                    np.asarray(rdm1_gs), None, (0, 0), L=L)
                fsp[0] = fock - jnp.asarray(np.asarray(Vexp_class.Vexp[0, 0],
                                                       dtype=float))
            for n in range(1, nbr_states):
                rdm1_n = ccs_ops.gamma_es_CCS(ts, ln[n - 1], rn[n - 1],
                                              r0n[n - 1], l0n[n - 1])
                names = Vexp_class.prop_names[n]
                if Vexp_class.exp_data[n] and not ("trdip" in names or "trmat" in names):
                    Delta[n, n], _ = Vexp_class.Vexp_update(
                        np.asarray(rdm1_n), np.asarray(rdm1_gs), (n, n), L=L)
                    fsp[n] = fock - jnp.asarray(np.asarray(Vexp_class.Vexp[n, n],
                                                           dtype=float))

            T1i = ccs_ops.T1inter(eris, ts, fsp[0])
            ts = ccs_ops.tsupdate(eris, ts, T1i)
            L1i = ccs_ops.L1inter(eris, ts, fsp[0])
            ls = ccs_ops.lsupdate(eris, ts, ls, L1i)

            # diagonalization of the R1 map in the singles space
            for n in range(1, nbr_states):
                Rinter = ccs_ops.R1inter(eris, ts, fsp[n], None)
                Fab, Fji, W, F, Tia, Pia = Rinter
                if davidson:
                    # matrix-free Davidson on the R1 map with the
                    # orbital-gap diagonal preconditioner
                    diag_f = np.diag(np.asarray(mycc.fock))
                    precond = (-diag_f[:nocc, None] + diag_f[None, nocc:]
                               ).ravel() + float(F)

                    def matvec(v):
                        r = jnp.asarray(v.reshape(nocc, nvir))
                        out = ccs_ops.R1eq(r, 0.0, Rinter)
                        return np.asarray(out).ravel()

                    x0 = [np.ravel(np.asarray(rn[n - 1]))]
                    conv_dav, w_dav, xs = ulinalg.davidson_nosym(
                        matvec, x0, precond, nroots=1, max_space=max_space,
                        follow=True)
                    Em = float(w_dav[0])
                    vec = np.asarray(xs[0])
                    vec = vec / np.linalg.norm(vec)
                    rn[n - 1] = jnp.asarray(vec.reshape(nocc, nvir))
                    r0n[n - 1] = float(ccs_ops.r0_fromE(eris, Em, ts, rn[n - 1],
                                                        None, fsp=fsp[n]))
                    ln[n - 1] = rn[n - 1]
                    l0n[n - 1] = r0n[n - 1]
                    Ep[n, 0] = Em
                    Ep[n, 1] = Em
                    continue
                A = (jnp.einsum("ab,ij->iajb", Fab, jnp.eye(nocc))
                     - jnp.einsum("ji,ab->iajb", Fji, jnp.eye(nvir))
                     + jnp.einsum("akic->iakc", W).reshape(nocc, nvir, nocc, nvir))
                A = A.reshape(nov, nov) + F * jnp.eye(nov)
                w, vecs = np.linalg.eig(np.asarray(A))
                order = np.argsort(w.real)
                # target the state with largest overlap with current rn
                overlaps = np.abs(np.asarray(vecs).T @ np.ravel(np.asarray(rn[n - 1])))
                k = int(np.argmax(overlaps))
                Em = float(w[k].real)
                vec = np.real(vecs[:, k])
                vec = vec / np.linalg.norm(vec)
                rn[n - 1] = jnp.asarray(vec.reshape(nocc, nvir))
                r0n[n - 1] = float(ccs_ops.r0_fromE(eris, Em, ts, rn[n - 1],
                                                    None, fsp=fsp[n]))
                ln[n - 1] = rn[n - 1]
                l0n[n - 1] = r0n[n - 1]
                Ep[n, 0] = Em
                Ep[n, 1] = Em

            Ep[0, 0] = float(ccs_ops.energy_ccs(eris, ts, fsp[0]))
            conv = np.asarray(ts) + np.asarray(ls)
            if ite > 0:
                Dconv = float(np.linalg.norm(conv - conv_old))
            if ite >= self.maxiter:
                Conv_text = "Max iteration reached"
                break
            if Dconv > 30.0:
                Conv_text = f"Diverges for lambda = {L} after {ite} iterations"
                break
            ite += 1
        else:
            Conv_text = f"Convergence reached for lambda= {L}, after {ite} iteration"

        dic_amp = {"ts": np.asarray(ts), "ls": np.asarray(ls),
                   "rn": [np.asarray(x) for x in rn],
                   "ln": [np.asarray(x) for x in ln], "r0n": r0n, "l0n": l0n}
        return Conv_text, dic_amp, Delta, Ep, np.asarray(rdm1_gs)
