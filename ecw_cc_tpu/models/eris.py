"""Antisymmetrized spin-orbital ERIs in physicists' notation, as a device pytree.

Replaces reference Eris.py (geris class): the AO ERI tensor is transformed to
the GHF MO basis, antisymmetrized <pq||rs> = <pq|rs> - <pq|sr>, and sliced
into the 16 occ/vir blocks used by the CC kernels (Eris.py:132-150).  The
Fock matrix is diagonal in the canonical HF basis: fock = diag(mo_energy)
(Eris.py:132).

TPU-first design: GEris is a frozen NamedTuple-of-arrays pytree.  Each block
is staged once to the device; the CC kernels consume it inside jit.  Only the
blocks actually used are materialized (all 16 here — small systems; for large
nvir the vvvv block may be sharded along its first two axes, see
ecw_cc_tpu/parallel/sharding.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ecw_cc_tpu.config import get_config, setup_jax


class GEris(NamedTuple):
    """Antisymmetrized <pq||rs> blocks (physicists' notation), G spin-orbital basis."""
    fock: np.ndarray   # (nmo, nmo), diagonal of mo_energy
    oooo: np.ndarray
    ooov: np.ndarray
    oovo: np.ndarray
    oovv: np.ndarray
    ovov: np.ndarray
    ovvo: np.ndarray
    ovvv: np.ndarray
    ovoo: np.ndarray
    vvvv: np.ndarray
    vooo: np.ndarray
    vovo: np.ndarray
    voov: np.ndarray
    vovv: np.ndarray
    vvoo: np.ndarray
    vvvo: np.ndarray

    @property
    def nocc(self):
        return self.oooo.shape[0]

    @property
    def nvir(self):
        return self.vvvv.shape[0]


class ErisHost:
    """Host-side ERI builder + container mirroring the reference `geris` API
    (attributes .fock .oooo ... .nocc .mo_occ .EHF)."""

    def __init__(self, mol, ghf, int_thresh=1e-13, dir_cont=False):
        self.mol = mol
        self.ghf = ghf
        self.orbspin = ghf.orbspin
        nmo = ghf.mo_coeff.shape[1]
        nao = mol.nao
        nocc = int(np.sum(ghf.mo_occ > 0))

        eri_ao = mol.intor("int2e")
        mo_a = ghf.mo_coeff[:nao]
        mo_b = ghf.mo_coeff[nao:]
        if dir_cont:
            # direct contraction against the spin-blocked AO ERI with the
            # full G mo_coeff (reference Eris.py:58-94, dir_cont path)
            eri_g = np.zeros((2 * nao,) * 4)
            for sa in (0, 1):
                for sb in (0, 1):
                    eri_g[sa * nao:(sa + 1) * nao, sa * nao:(sa + 1) * nao,
                          sb * nao:(sb + 1) * nao, sb * nao:(sb + 1) * nao] = eri_ao
            mo = ghf.mo_coeff
            eri = np.einsum("pqrs,pi->iqrs", eri_g, mo, optimize=True)
            eri = np.einsum("iqrs,qj->ijrs", eri, mo, optimize=True)
            eri = np.einsum("ijrs,rk->ijks", eri, mo, optimize=True)
            eri = np.einsum("ijks,sl->ijkl", eri, mo, optimize=True)
        else:
            # AO ERI (chemists (ij|kl)) -> G-format MO (mo = mo_a + mo_b
            # summed rows, spin-forbidden elements zeroed; reference
            # Eris.py:108-120)
            mo = mo_a + mo_b
            eri = np.einsum("pqrs,pi->iqrs", eri_ao, mo, optimize=True)
            eri = np.einsum("iqrs,qj->ijrs", eri, mo, optimize=True)
            eri = np.einsum("ijrs,rk->ijks", eri, mo, optimize=True)
            eri = np.einsum("ijks,sl->ijkl", eri, mo, optimize=True)
            spin = self.orbspin
            forbid = spin[:, None] != spin[None, :]
            eri[forbid, :, :] = 0.0
            eri[:, :, forbid] = 0.0
        # chemists (pq|rs) -> physicists <pr|qs>, antisymmetrize
        eri = eri.transpose(0, 2, 1, 3) - eri.transpose(0, 2, 3, 1)
        if int_thresh:
            eri[np.abs(eri) < int_thresh] = 0.0

        o, v = slice(0, nocc), slice(nocc, nmo)
        self.fock = np.diag(ghf.mo_energy)
        self.oooo = eri[o, o, o, o].copy()
        self.ooov = eri[o, o, o, v].copy()
        self.oovo = eri[o, o, v, o].copy()
        self.oovv = eri[o, o, v, v].copy()
        self.ovov = eri[o, v, o, v].copy()
        self.ovvo = eri[o, v, v, o].copy()
        self.ovvv = eri[o, v, v, v].copy()
        self.ovoo = eri[o, v, o, o].copy()
        self.vvvv = eri[v, v, v, v].copy()
        self.vooo = eri[v, o, o, o].copy()
        self.vovo = eri[v, o, v, o].copy()
        self.voov = eri[v, o, o, v].copy()
        self.vovv = eri[v, o, v, v].copy()
        self.vvoo = eri[v, v, o, o].copy()
        self.vvvo = eri[v, v, v, o].copy()
        self.nocc = nocc
        self.nvir = nmo - nocc
        self.mo_occ = ghf.mo_occ
        self.mo_energy = ghf.mo_energy
        self.mo_coeff = ghf.mo_coeff
        self.EHF = ghf.e_tot
        del eri

    def to_device(self, dtype=None, sharding=None) -> GEris:
        """Stage the blocks as a jax pytree (optionally sharded)."""
        import jax
        import jax.numpy as jnp

        setup_jax()
        dtype = dtype or get_config().dtype
        fields = {}
        for name in GEris._fields:
            arr = jnp.asarray(getattr(self, name), dtype=dtype)
            if sharding is not None and name in sharding:
                arr = jax.device_put(arr, sharding[name])
            fields[name] = arr
        return GEris(**fields)


def build_eris(mol, ghf, int_thresh=1e-13, dir_cont=False):
    return ErisHost(mol, ghf, int_thresh=int_thresh, dir_cont=dir_cont)
