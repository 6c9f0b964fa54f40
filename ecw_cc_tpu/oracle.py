"""Determinant-space (FCI) oracle for validating CC kernels from first principles.

Builds the second-quantized operator
    H = sum_pq  f~_pq  p+ q  +  1/4 sum_pqrs <pq||rs> p+ q+ s r
as a dense matrix over all determinants, where f~ is chosen so that the
normal-ordered one-body coefficient equals the effective Fock matrix `fsp`
used by the CC kernels:  f~_pq = fsp_pq - sum_{i in occ} <pi||qi>.

With T = sum t_ia a+_a a_i as a (nilpotent) matrix, Hbar = e^-T H e^T is exact
in this space, and:
    T1 residual_ia      = <Phi_i^a| Hbar |0>
    E_corr              = <0| Hbar |0> - E_ref
    Lambda1 (commutator)= <0|(1+L)[Hbar, E_ai]|0>
    EOM singles matrix  = <Phi_ia| Hbar - E_ref... |Phi_jb>   (for R/L checks)

This is an independent construction: it never uses the factorized CC
equations, so agreement at 1e-10 validates them non-circularly.
"""

from __future__ import annotations

import itertools

import numpy as np


class DetSpace:
    def __init__(self, nmo, nelec):
        self.nmo = nmo
        self.nelec = nelec
        self.dets = [sum(1 << o for o in occ)
                     for occ in itertools.combinations(range(nmo), nelec)]
        self.index = {d: i for i, d in enumerate(self.dets)}
        self.dim = len(self.dets)

    # -- elementary second quantization on bitmask determinants -------------
    @staticmethod
    def _ann(det, p):
        if not (det >> p) & 1:
            return None, 0
        sign = (-1) ** bin(det & ((1 << p) - 1)).count("1")
        return det & ~(1 << p), sign

    @staticmethod
    def _cre(det, p):
        if (det >> p) & 1:
            return None, 0
        sign = (-1) ** bin(det & ((1 << p) - 1)).count("1")
        return det | (1 << p), sign

    def op_matrix_1e(self, f):
        """sum_pq f_pq p+ q as a dense matrix."""
        H = np.zeros((self.dim, self.dim))
        nz = np.argwhere(np.abs(f) > 1e-300)
        for icol, det in enumerate(self.dets):
            for p, q in nz:
                d1, s1 = self._ann(det, q)
                if d1 is None:
                    continue
                d2, s2 = self._cre(d1, p)
                if d2 is None:
                    continue
                H[self.index[d2], icol] += f[p, q] * s1 * s2
        return H

    def op_matrix_2e(self, eri):
        """1/4 sum_pqrs <pq||rs> p+ q+ s r  (eri[p,q,r,s] = <pq||rs>, antisym)."""
        H = np.zeros((self.dim, self.dim))
        nmo = self.nmo
        for icol, det in enumerate(self.dets):
            occ = [o for o in range(nmo) if (det >> o) & 1]
            for r, s in itertools.combinations(occ, 2):
                dr, sr = self._ann(det, r)
                ds_, ss = self._ann(dr, s)
                if ds_ is None:
                    continue
                for q in range(nmo):
                    dq, sq = self._cre(ds_, q)
                    if dq is None:
                        continue
                    for p in range(q):
                        # 1/4 sum over all pqrs with eri antisymmetric in (p,q)
                        # and (r,s): restricting r<s and p<q gives prefactor 1
                        dp, sp = self._cre(dq, p)
                        if dp is None:
                            continue
                        H[self.index[dp], icol] += eri[p, q, r, s] * sr * ss * sq * sp
        return H

    def excitation_matrix(self, a, i):
        """E_ai = a+_a a_i."""
        f = np.zeros((self.nmo, self.nmo))
        f[a, i] = 1.0
        return self.op_matrix_1e(f)


def hbar_in_sector(fsp, eri, nocc, nelec, t1, t2=None):
    """Exact e^-T H e^T in the nelec-electron determinant space.

    The cluster operators conserve particle number, so T and Hbar act
    within each Fock-space sector separately; with nelec = nocc -/+ 1 the
    projection of this Hbar onto the 1h+2h1p / 1p+2p1h determinants IS the
    EOM-IP/EA-CCSD matrix (used by tests/test_eom_ipea.py to validate the
    Wick-derived sigma equations at arbitrary amplitudes).

    :return: (space, Hbar, E_ref) with E_ref = <0_N| H |0_N> the N-electron
        Fermi-vacuum energy (the reference energy Hbar is measured against).
    """
    nmo = fsp.shape[0]
    occ = list(range(nocc))
    ftilde = fsp - np.einsum("piqi->pq", eri[:, occ][:, :, :, occ])
    space, U, Uinv = cluster_matrices(nmo, nocc, nelec, t1, t2)
    H = space.op_matrix_1e(ftilde) + space.op_matrix_2e(eri)
    E_ref = (np.trace(ftilde[:nocc, :nocc])
             + 0.5 * np.einsum("ijij->",
                               eri[:nocc, :nocc, :nocc, :nocc]))
    return space, Uinv @ H @ U, E_ref


def cluster_matrices(nmo, nocc, nelec, t1, t2=None):
    """(space, e^T, e^-T) in the nelec-electron determinant sector."""
    space = DetSpace(nmo, nelec)
    nvir = nmo - nocc
    T = np.zeros((space.dim, space.dim))
    for i in range(nocc):
        for a in range(nvir):
            if t1[i, a] != 0.0:
                T += t1[i, a] * space.excitation_matrix(nocc + a, i)
    if t2 is not None:
        for i in range(nocc):
            for j in range(nocc):
                for a in range(nvir):
                    for b in range(nvir):
                        if t2[i, j, a, b] != 0.0:
                            Eai = space.excitation_matrix(nocc + a, i)
                            Ebj = space.excitation_matrix(nocc + b, j)
                            T += 0.25 * t2[i, j, a, b] * (Eai @ Ebj)
    return space, CCOracle._expm_nilpotent(T), CCOracle._expm_nilpotent(-T)


class CCOracle:
    """Exact Hbar machinery for CCS/CCSD validation on tiny systems."""

    def __init__(self, fsp, eri, nocc):
        """fsp: effective (normal-ordered) Fock matrix; eri: <pq||rs> antisym;
        nocc: number of occupied spin-orbitals (Fermi vacuum = lowest nocc)."""
        nmo = fsp.shape[0]
        self.nocc, self.nmo = nocc, nmo
        self.space = DetSpace(nmo, nocc)
        occ = list(range(nocc))
        # bare one-body coefficient whose normal-ordered form is fsp
        ftilde = fsp - np.einsum("piqi->pq", eri[:, occ][:, :, :, occ])
        self.H = self.space.op_matrix_1e(ftilde) + self.space.op_matrix_2e(eri)
        self.ref = self.space.index[(1 << nocc) - 1]
        self.E_ref = self.H[self.ref, self.ref]

    def t_matrix(self, t1, t2=None):
        nocc, nvir = t1.shape
        T = np.zeros((self.space.dim, self.space.dim))
        for i in range(nocc):
            for a in range(nvir):
                if t1[i, a] != 0.0:
                    T += t1[i, a] * self.space.excitation_matrix(nocc + a, i)
        if t2 is not None:
            for i in range(nocc):
                for j in range(nocc):
                    for a in range(nvir):
                        for b in range(nvir):
                            if t2[i, j, a, b] != 0.0:
                                Eai = self.space.excitation_matrix(nocc + a, i)
                                Ebj = self.space.excitation_matrix(nocc + b, j)
                                T += 0.25 * t2[i, j, a, b] * (Eai @ Ebj)
        return T

    @staticmethod
    def _expm_nilpotent(T):
        U = np.eye(T.shape[0])
        term = np.eye(T.shape[0])
        for k in range(1, 60):
            term = term @ T / k
            if not np.any(term):
                break
            U = U + term
        return U

    def hbar(self, t1, t2=None):
        T = self.t_matrix(t1, t2)
        U = self._expm_nilpotent(T)
        Uinv = self._expm_nilpotent(-T)
        return Uinv @ self.H @ U

    # -- projections ---------------------------------------------------------
    def singles_index(self, i, a):
        """determinant index of Phi_i^a (a is a virtual offset)."""
        det = (1 << self.nocc) - 1
        det &= ~(1 << i)
        det |= 1 << (self.nocc + a)
        return self.space.index[det]

    def singles_sign(self, i, a):
        """phase of E_{a i}|0> relative to the raw bitmask determinant."""
        det = (1 << self.nocc) - 1
        d1, s1 = self.space._ann(det, i)
        d2, s2 = self.space._cre(d1, self.nocc + a)
        return s1 * s2

    def t1_residual(self, hbar, t1):
        nocc, nvir = t1.shape
        res = np.zeros_like(t1)
        col = hbar[:, self.ref]
        for i in range(nocc):
            for a in range(nvir):
                res[i, a] = col[self.singles_index(i, a)] * self.singles_sign(i, a)
        return res

    def doubles_proj(self, vec, nocc, nvir):
        """<Phi_ij^ab| vec> with E_ai E_bj ordering phases."""
        out = np.zeros((nocc, nocc, nvir, nvir))
        for i in range(nocc):
            for j in range(nocc):
                if i == j:
                    continue
                for a in range(nvir):
                    for b in range(nvir):
                        if a == b:
                            continue
                        det = (1 << nocc) - 1
                        d1, s1 = self.space._ann(det, j)
                        d2, s2 = self.space._cre(d1, nocc + b)
                        d3, s3 = self.space._ann(d2, i)
                        if d3 is None:
                            continue
                        d4, s4 = self.space._cre(d3, nocc + a)
                        if d4 is None:
                            continue
                        out[i, j, a, b] = vec[self.space.index[d4]] * s1 * s2 * s3 * s4
        return out

    def energy(self, hbar):
        return hbar[self.ref, self.ref] - self.E_ref

    def lambda1_residual(self, hbar, t1, l1, l2=None, commutator=True):
        """<0|(1+Lambda) [Hbar, E_ai] |0> (or without commutator's 2nd term)."""
        nocc, nvir = l1.shape
        dim = self.space.dim
        bra = np.zeros(dim)
        bra[self.ref] = 1.0
        for j in range(nocc):
            for b in range(nvir):
                if l1[j, b] != 0.0:
                    idx = self.singles_index(j, b)
                    bra[idx] += l1[j, b] * self.singles_sign(j, b)
        if l2 is not None:
            for i in range(nocc):
                for j in range(nocc):
                    for a in range(nvir):
                        for b in range(nvir):
                            if l2[i, j, a, b] != 0.0:
                                det = (1 << nocc) - 1
                                d1, s1 = self.space._ann(det, j)
                                d2, s2 = self.space._cre(d1, nocc + b)
                                d3, s3 = self.space._ann(d2, i)
                                if d3 is None:
                                    continue
                                d4, s4 = self.space._cre(d3, nocc + a)
                                if d4 is None:
                                    continue
                                bra[self.space.index[d4]] += 0.25 * l2[i, j, a, b] * s1 * s2 * s3 * s4
        res = np.zeros_like(l1)
        ket0 = np.zeros(dim)
        ket0[self.ref] = 1.0
        for i in range(nocc):
            for a in range(nvir):
                E = self.space.excitation_matrix(nocc + a, i)
                val = bra @ hbar @ (E @ ket0)
                if commutator:
                    val -= bra @ E @ (hbar @ ket0)
                res[i, a] = val
        return res
