"""Experimental-constraint (Vexp) engine.

Re-implements reference exp_pot.py (class Exp): holds per-state target
("experimental") data, precomputes property integrals in the MO G basis, and
updates the Vexp[n,m] potential matrix plus the relative deviation Delta and
vmax from the current (transition) rdm1s.

Math (exp_pot.py:139-147): for state properties the potential is linear in
gamma,
    Vexp^nn = sum_i L_i * |Aexp_i - Tr(gamma^nn A_i)| * A_i      (prop case)
    Vexp^00 = sum_i L_i * (gamma_exp - gamma^00)                 ('mat' case)
and for transition properties the norm-squared form contracts both left and
right tr-rdm1s.

Design: the host class `Exp` mirrors the reference API exactly (Vexp_update
returning (Delta, vmax), attribute .Vexp as an (n_states, n_states) object
array).  The device path `vexp_gs_update` fuses the GS 'mat'/property update
into a single jitted function used inside the solver while_loop.
"""

from __future__ import annotations

import numpy as np

from ecw_cc_tpu.utils import props as uprops
from ecw_cc_tpu.utils import convert


def _f_trace_mats(exp, trace_mat_fn):
    """Stacked (nh, dim, dim) real/imag structure-factor trace operators —
    the complex FT integrals split into two real trace matrices (shared by
    the GS and ES device Vexp builders; host analogue: Exp.Vexp_update 'F'
    case, reference exp_pot.py:324-341 with its R/G shape bug fixed)."""
    import jax.numpy as jnp

    return (jnp.stack([trace_mat_fn(np.ascontiguousarray(np.real(fa)))
                       for fa in exp.F_int]),
            jnp.stack([trace_mat_fn(np.ascontiguousarray(np.imag(fa)))
                       for fa in exp.F_int]))


def _f_update(trace_F, F_pot, nh_F, tgt_np, rdm1):
    """Per-state structure-factor body shared by the GS and ES device Vexp
    updates: |F| deviation per reciprocal vector, potential = deviation-
    weighted real MO FT integrals scaled 2/nh.

    Returns (vpot, delta_inc, vmax_inc); delta_inc is None when the
    normalization reference is below threshold (host Delta() quirk
    replicated: every component is normalized by |exp[1]|, comp_idx=1)."""
    import jax.numpy as jnp

    dtype = rdm1.dtype
    Fre, Fim = trace_F
    cre = jnp.einsum("hij,ji->h", Fre.astype(dtype), rdm1)
    cim = jnp.einsum("hij,ji->h", Fim.astype(dtype), rdm1)
    tgt_np = np.asarray(tgt_np)
    t_re = jnp.asarray(np.real(tgt_np), dtype=dtype)
    t_im = jnp.asarray(np.imag(tgt_np), dtype=dtype)
    diff = jnp.sqrt((t_re - cre) ** 2 + (t_im - cim) ** 2)
    ref = abs(complex(tgt_np.ravel()[1])) if tgt_np.size > 1 \
        else abs(complex(tgt_np.ravel()[0]))
    delta_inc = jnp.sum(diff) / ref if ref > 1e-6 else None
    dmat = diff[:, None, None] * F_pot.astype(dtype)
    vpot = (2.0 / nh_F) * jnp.sum(dmat, axis=0)
    vmax_inc = jnp.sum(jnp.max(jnp.abs(dmat), axis=(1, 2)))
    return vpot, delta_inc, vmax_inc


class Exp:
    def __init__(self, L, exp_data, mol, mo_coeff, Ek_exp_GS=None, Ek_HF_GS=None,
                 HF_prop=False):
        """See reference exp_pot.py:13-129 for the exp_data format:
        exp_data = [[GS props], [ES1 props], ...], each prop ['name', value]
        with names mat/trmat/Ek/v1e/dip/trdip/DEk/F."""
        self.nbr_states = len(exp_data)
        self.exp_data = exp_data
        self.mo_coeff = np.asarray(mo_coeff)
        self.mol = mol
        self.prop_calc = []
        if not HF_prop:
            self.HF_prop = [[None for _ in exp_data[n]] for n in range(len(exp_data))]
        else:
            self.HF_prop = HF_prop
        self.Ek_HF_GS = Ek_HF_GS

        self.L = self.L_check(L)
        self.charge_center = None

        # AO integrals
        self.Ek_int = None
        self.dip_int = None
        self.v1e_int = None
        self.F_int = None
        self.dic_int = {}
        self.prop_names = []

        for i, state in enumerate(exp_data):
            self.prop_names.append([])
            for prop in state:
                name = prop[0]
                if name == "F":
                    if len(prop) < 4:
                        raise SyntaxError(
                            "structure factors require ['F', F, h, rec_vec]")
                    if self.F_int is None:
                        _, self.F_int = uprops.FT_MO(
                            mol, prop[2], self.mo_coeff, prop[3])
                        # G-format MO potential matrices via the same
                        # transform convention as the other properties
                        # (the reference stores the R-format FT_MO result,
                        # which cannot broadcast against the G-format Vexp —
                        # 'F' was never runnable end-to-end there)
                        self.dic_int["F"] = np.stack([
                            convert.convert_aoint(fa, self.mo_coeff)
                            for fa in self.F_int])
                    self.h = prop[2]
                    self.rec_vec = prop[3]
                if ("dip" in name or "trdip" in name) and self.dip_int is None:
                    self.charge_center = mol.charge_center()
                    self.dip_int = mol.intor("r", origin=self.charge_center)
                    self.dic_int["dip"] = convert.convert_aoint(self.dip_int, self.mo_coeff)
                if "v1e" in name and self.v1e_int is None:
                    self.v1e_int = mol.intor("nuc")
                    self.dic_int["v1e"] = convert.convert_aoint(self.v1e_int, self.mo_coeff)
                if "Ek" in name and self.Ek_int is None:
                    self.Ek_int = mol.intor("kin")
                    self.dic_int["Ek"] = convert.convert_aoint(self.Ek_int, self.mo_coeff)
                self.prop_names[i].append(name)

        self.DEk_GS_idx = None
        for i, name in enumerate(self.prop_names[0]):
            if "DEk" in name:
                self.DEk_GS_idx = i

        self.Ek_exp_GS = Ek_exp_GS
        self.Ek_calc_GS = None
        self.Delta_Ek_GS = None
        self.Vexp = np.full((self.nbr_states, self.nbr_states), None)

    # ------------------------------------------------------------------
    def Vexp_update(self, rdm1, rdm1_add, index, L=None):
        """Update Vexp[index] from the current rdm1(s); return (Delta, vmax).
        Reference exp_pot.py:131-345."""
        n, m = index
        rdm1 = np.asarray(rdm1)
        self.Vexp[n, m] = np.zeros_like(rdm1)
        Delta = 0.0
        vmax = 0.0
        self.prop_calc = []
        L = self.L if L is None else self.L_check(L)
        st_idx = max(index)

        for i, prop in enumerate(self.prop_names[st_idx]):
            if prop == "mat":
                if index == (0, 0):
                    diff = np.subtract(self.exp_data[0][i][1], rdm1)
                    self.Vexp[0, 0] += L[st_idx][i] * diff
                    Delta += self.Delta(0, i, diff)
                    vmax += np.max(np.abs(diff))
                    if self.Ek_exp_GS is not None:
                        self.Ek_calc_GS = uprops.Ekin(
                            self.mol, rdm1, aobasis=False, mo_coeff=self.mo_coeff,
                            ek_int=self.Ek_int, g=True)
                        denom = (np.abs(self.Ek_exp_GS) if self.Ek_HF_GS is None
                                 else np.abs(self.Ek_exp_GS - self.Ek_HF_GS))
                        self.Delta_Ek_GS = np.abs(self.Ek_exp_GS - self.Ek_calc_GS) / denom
                elif n == m:
                    diff = np.subtract(self.exp_data[n][i][1], rdm1)
                    self.Vexp[n, n] += L[st_idx][i] * diff
                    Delta += self.Delta(n, i, diff)
                    vmax += np.max(np.abs(diff))

            if prop == "trmat" and n != m:
                if n == 0:  # left
                    diff = np.subtract(self.exp_data[st_idx][i][1][0], rdm1)
                elif m == 0:  # right
                    diff = np.subtract(self.exp_data[st_idx][i][1][1], rdm1)
                else:
                    raise ValueError("only GS<->ES transition properties supported")
                self.Vexp[n, m] += L[st_idx][i] * diff
                avg = (np.sum(np.abs(self.exp_data[st_idx][i][1][1]))
                       + np.sum(np.abs(self.exp_data[st_idx][i][1][0])))
                Delta += np.sum(np.abs(diff)) / (avg / 2.0)
                vmax += np.max(np.abs(diff))

            if prop in ("Ek", "v1e") and n == m:
                calc = self.calc_prop(prop, rdm1)
                diff = np.abs(self.exp_data[st_idx][i][1] - calc)
                Delta += self.Delta(n, i, diff)
                dmat = diff * self.dic_int[prop]
                self.Vexp[n, n] += L[st_idx][i] * dmat
                vmax += np.max(np.abs(dmat))
                self.prop_calc.append([prop, calc])

            if "DEk" in prop and n == m and n != 0:
                diff_rdm1 = np.subtract(rdm1_add, rdm1)
                calc = self.calc_prop("Ek", diff_rdm1)
                diff = np.abs(self.exp_data[st_idx][i][1] - calc)
                Delta += self.Delta(st_idx, i, diff)
                dmat = diff * self.dic_int["Ek"]
                if self.Vexp[0, 0] is None:
                    self.Vexp[0, 0] = 0.0
                if self.DEk_GS_idx is not None:
                    self.Vexp[0, 0] += L[0][self.DEk_GS_idx] * dmat
                else:
                    self.Vexp[0, 0] += L[st_idx][i] * dmat
                vmax += np.max(np.abs(dmat))
                self.prop_calc.append([prop, calc])

            if prop == "dip" and n == m:
                calc = self.calc_prop("dip", rdm1)
                exp = self.exp_data[st_idx][i][1]
                for j, (d_calc, d_exp) in enumerate(zip(calc, exp)):
                    diff = np.abs(d_exp - d_calc)
                    Delta += self.Delta(st_idx, i, diff, comp_idx=j)
                    dmat = diff * self.dic_int["dip"][j]
                    self.Vexp[n, m] += L[st_idx][i] * dmat
                    vmax += np.max(np.abs(dmat))
                self.prop_calc.append([prop, calc])

            if prop == "trdip" and n != m:
                calc, A_scale = self.calc_prop("dip", rdm1, rdm1_add=rdm1_add)
                exp = self.exp_data[st_idx][i][1]
                for j, (d_calc, d_exp, A) in enumerate(zip(calc, exp, A_scale)):
                    diff = np.abs(d_exp - d_calc)
                    Delta += self.Delta(st_idx, i, diff, comp_idx=j)
                    dmat = diff * self.dic_int["dip"][j] * A
                    self.Vexp[n, m] += L[st_idx][i] * dmat
                    vmax += np.max(np.abs(dmat))
                self.prop_calc.append([prop, calc])

            if prop == "F" and n == m:
                calc = uprops.structure_factor(
                    self.mol, self.h, rdm1, aobasis=False, mo_coeff=self.mo_coeff,
                    F_int=self.F_int, rec_vec=self.rec_vec)
                exp = self.exp_data[st_idx][i][1]
                for F_exp, F_calc, F_int_mo in zip(exp, calc, self.dic_int["F"]):
                    diff = np.abs(F_exp - F_calc)
                    Delta += self.Delta(st_idx, i, diff)
                    dmat = np.real(diff * F_int_mo)
                    self.Vexp[n, n] += L[st_idx][i] * (2.0 / len(self.h)) * dmat
                    vmax += np.max(np.abs(dmat))
                self.prop_calc.append([prop, calc])

        return Delta, vmax

    # ------------------------------------------------------------------
    def calc_prop(self, prop, rdm1, g_format=True, rdm1_add=None):
        """Reference exp_pot.py:347-390."""
        if prop == "Ek":
            f = lambda dm, cint: uprops.Ekin(self.mol, dm, g=g_format, aobasis=False,
                                             mo_coeff=self.mo_coeff, ek_int=cint)
            ints = self.Ek_int
        elif prop == "v1e":
            f = lambda dm, cint: uprops.v1e(self.mol, dm, g=g_format, aobasis=False,
                                            mo_coeff=self.mo_coeff, v1e_int=cint)
            ints = self.v1e_int
        elif prop == "dip":
            a1 = uprops.dipole(self.mol, rdm1, g=g_format, aobasis=False,
                               mo_coeff=self.mo_coeff, dip_int=self.dip_int)
            if rdm1_add is not None:
                a2 = uprops.dipole(self.mol, np.asarray(rdm1_add).T, g=g_format,
                                   aobasis=False, mo_coeff=self.mo_coeff,
                                   dip_int=np.conj(self.dip_int))
                return list(a1 * a2), list(a2)
            return list(a1)
        else:
            raise NotImplementedError("possible properties are Ek, v1e and dip")
        a1 = f(rdm1, ints)
        if rdm1_add is not None:
            a2 = f(np.asarray(rdm1_add).T, np.conj(ints))
            return a1 * a2, a2
        return a1

    def Delta(self, n_st, i_prop, prop_diff, comp_idx=1, threshold=1e-6):
        """Relative deviation; reference exp_pot.py:392-448."""
        exp_val = self.exp_data[n_st][i_prop][1]
        hf = self.HF_prop[n_st][i_prop] if n_st < len(self.HF_prop) else None
        if isinstance(prop_diff, np.ndarray) and n_st == 0:
            if hf is None:
                return np.sum(np.abs(prop_diff)) / np.sum(np.abs(exp_val))
            return np.sum(np.abs(prop_diff)) / np.sum(np.abs(exp_val - hf))
        if isinstance(exp_val, (list, tuple, np.ndarray)) and not np.isscalar(exp_val):
            ref = exp_val[comp_idx]
            if abs(ref) > threshold:
                if hf is None:
                    return prop_diff / np.abs(ref)
                return prop_diff / np.abs(ref - hf[comp_idx])
            return 0.0
        if isinstance(exp_val, (float, np.floating)) and abs(exp_val) > threshold:
            if hf is None:
                return prop_diff / np.abs(exp_val)
            return prop_diff / np.abs(exp_val - hf)
        return 0.0

    def L_check(self, L):
        """Normalize the weight format to [[w per prop] per state].
        Reference exp_pot.py:459-489."""
        if isinstance(L, (float, int)):
            return [[float(L)] * len(st) for st in self.exp_data]
        if isinstance(L, (list, np.ndarray)):
            if len(L) != self.nbr_states:
                raise SyntaxError(
                    "constraint-weight length must equal the number of states "
                    "(did you forget L_loop=True?)")
            out = []
            for st, l in zip(self.exp_data, L):
                l = list(np.atleast_1d(l))
                if len(st) != len(l) and len(l) == 1:
                    l = l * len(st)
                elif len(st) != len(l):
                    raise SyntaxError("wrong syntax for L list")
                out.append([float(x) for x in l])
            return out
        raise SyntaxError("L must be a float or a nested list")


# ---------------------------------------------------------------------------
# Device-side fused GS Vexp update (used inside jitted solver loops)
# ---------------------------------------------------------------------------

def make_gs_vexp_device(exp: Exp, perm=None):
    """Compile the GS Vexp update into a pure function
        (rdm1, L) -> (Vexp00, Delta, vmax)
    for use inside lax.while_loop.  Supports the GS property set
    mat/Ek/v1e/dip (the cases exercised by Solver_GS; reference
    Solver_GS.py:166-168, 691-692).

    Two MO transforms are involved, replicating the reference exactly:
      - potential matrices use utilities.convert_aoint (C^-1 A C^-H,
        reference utilities.py:311-339) -> exp.dic_int;
      - property VALUES are Tr(A_ao gamma_ao), equivalent to contracting the
        properly transformed operator C^T A_G C with gamma_mo.

    perm: optional MO permutation (new_from_old; ops/ladder.spin_sort_perm)
    when the consumer's rdm1 lives in the spin-SORTED layout: every MO-basis
    matrix (mat targets, potential/trace operators, HF reference rdm1) is
    permuted ONCE at setup so the returned update consumes/produces sorted-
    layout matrices.  All Delta/vmax scalars are permutation-invariant.
    """
    import jax.numpy as jnp

    if perm is None:
        pmat = lambda M: M
    else:
        P = np.asarray(perm)
        pmat = lambda M: np.asarray(M)[np.ix_(P, P)]

    names = list(exp.prop_names[0])
    targets = [exp.exp_data[0][i][1] if n != "mat"
               else pmat(exp.exp_data[0][i][1])
               for i, n in enumerate(names)]
    pot_mats = {k: jnp.asarray(
        np.real(v)[..., :, :] if perm is None
        else np.real(np.asarray(v))[..., P, :][..., :, P])
        for k, v in exp.dic_int.items()}
    hf_props = [p if (names[i] != "mat" or p is None) else pmat(p)
                for i, p in enumerate(exp.HF_prop[0])]
    C = np.asarray(exp.mo_coeff)

    def _trace_mat(A_ao):
        A_g = convert.convert_r_to_g_rdm1(A_ao) * 2.0  # block-diag expand (no 1/2)
        return jnp.asarray(pmat(C.T @ A_g @ C))

    trace_mats = {}
    if exp.Ek_int is not None:
        trace_mats["Ek"] = _trace_mat(exp.Ek_int)
    if exp.v1e_int is not None:
        trace_mats["v1e"] = _trace_mat(exp.v1e_int)
    if exp.dip_int is not None:
        trace_mats["dip"] = jnp.stack([_trace_mat(exp.dip_int[c]) for c in range(3)])
    if exp.F_int is not None and "F" in names:
        # structure factors: the potential matrix is the real part of the
        # MO-transformed FT integral (dic_int['F']); shared GS/ES helper
        trace_mats["F"] = _f_trace_mats(exp, _trace_mat)
        nh_F = len(exp.h)

    def device_update(rdm1, L):
        v = jnp.zeros_like(rdm1)
        delta = jnp.asarray(0.0, dtype=rdm1.dtype)
        vmax = jnp.asarray(0.0, dtype=rdm1.dtype)
        for i, name in enumerate(names):
            w = L[i]
            if name == "mat":
                tgt = jnp.asarray(targets[i], dtype=rdm1.dtype)
                diff = tgt - rdm1
                v = v + w * diff
                hf = hf_props[i]
                if hf is None:
                    den = jnp.sum(jnp.abs(tgt))
                else:
                    den = jnp.sum(jnp.abs(tgt - jnp.asarray(hf, dtype=rdm1.dtype)))
                delta = delta + jnp.sum(jnp.abs(diff)) / den
                vmax = vmax + jnp.max(jnp.abs(diff))
            elif name in ("Ek", "v1e"):
                A_pot = pot_mats[name].astype(rdm1.dtype)
                A_tr = trace_mats[name].astype(rdm1.dtype)
                calc = jnp.einsum("ij,ji->", A_tr, rdm1)
                exp_val = jnp.asarray(targets[i], dtype=rdm1.dtype)
                diff = jnp.abs(exp_val - calc)
                hf = hf_props[i]
                den = jnp.abs(exp_val) if hf is None else jnp.abs(exp_val - hf)
                delta = delta + jnp.where(jnp.abs(exp_val) > 1e-6, diff / den, 0.0)
                dmat = diff * A_pot
                v = v + w * dmat
                vmax = vmax + jnp.max(jnp.abs(dmat))
            elif name == "dip":
                A_pot = pot_mats["dip"].astype(rdm1.dtype)  # (3, dim, dim)
                A_tr = trace_mats["dip"].astype(rdm1.dtype)
                calc = jnp.einsum("xij,ji->x", A_tr, rdm1)
                exp_val = jnp.asarray(targets[i], dtype=rdm1.dtype)
                diff = jnp.abs(exp_val - calc)
                hf = hf_props[i]
                if hf is None:
                    den = jnp.abs(exp_val)
                else:
                    den = jnp.abs(exp_val - jnp.asarray(hf, dtype=rdm1.dtype))
                delta = delta + jnp.sum(jnp.where(jnp.abs(exp_val) > 1e-6, diff / den, 0.0))
                dmat = diff[:, None, None] * A_pot
                v = v + w * jnp.sum(dmat, axis=0)
                vmax = vmax + jnp.sum(jnp.max(jnp.abs(dmat), axis=(1, 2)))
            elif name == "F":
                vpot, delta_inc, vmax_inc = _f_update(
                    trace_mats["F"], pot_mats["F"], nh_F, targets[i], rdm1)
                if delta_inc is not None:
                    delta = delta + delta_inc
                v = v + w * vpot
                vmax = vmax + vmax_inc
            else:
                raise NotImplementedError(
                    f"device GS Vexp does not support {name!r}; use the host path")
        return v, delta, vmax

    return device_update


def make_es_vexp_device(exp: Exp):
    """Compile the multi-state Vexp update into a pure jitted function

        (rdm1_gs, rdm1_es, tr_r, tr_l, Lflat) ->
            (V00, Vnn, V0n, Vn0, Delta)

    where rdm1_es/tr_r/tr_l are stacked (n_es, dim, dim), Vnn/V0n/Vn0 are
    stacked potentials and Delta is the (n_states, n_states) deviation
    matrix.  Supports the property set exercised by Solver_ES
    (mat/Ek/v1e/dip/F for the GS; mat/Ek/v1e/dip/DEk/trdip/trmat/F for ES;
    reference exp_pot.py:131-345 and Solver_ES.py:274-296).  Lflat is the
    flattened per-state per-property weight vector.
    """
    import jax.numpy as jnp

    n_states = exp.nbr_states
    names = [list(p) for p in exp.prop_names]
    # flat offsets into Lflat
    offs = []
    k = 0
    for st in names:
        offs.append(k)
        k += len(st)
    gs_update = make_gs_vexp_device(exp) if names[0] else None

    pot_mats = {kk: jnp.asarray(np.real(vv)) for kk, vv in exp.dic_int.items()}
    C = np.asarray(exp.mo_coeff)

    def _trace_mat(A_ao):
        A_g = convert.convert_r_to_g_rdm1(A_ao) * 2.0
        return jnp.asarray(C.T @ A_g @ C)

    trace_mats = {}
    if exp.Ek_int is not None:
        trace_mats["Ek"] = _trace_mat(exp.Ek_int)
    if exp.v1e_int is not None:
        trace_mats["v1e"] = _trace_mat(exp.v1e_int)
    if exp.dip_int is not None:
        trace_mats["dip"] = jnp.stack([_trace_mat(exp.dip_int[c])
                                       for c in range(3)])
    if exp.F_int is not None and any("F" in st for st in names):
        # structure factors for ES states: shared GS/ES helper
        trace_mats["F"] = _f_trace_mats(exp, _trace_mat)
        nh_F = len(exp.h)
    targets = exp.exp_data
    DEk_GS_idx = exp.DEk_GS_idx

    def update(rdm1_gs, rdm1_es, tr_r, tr_l, Lflat):
        dtype = rdm1_gs.dtype
        dim = rdm1_gs.shape[0]
        n_es = n_states - 1
        Delta = jnp.zeros((n_states, n_states), dtype)
        V00 = jnp.zeros((dim, dim), dtype)
        Vnn = jnp.zeros((n_es, dim, dim), dtype)
        V0n = jnp.zeros((n_es, dim, dim), dtype)
        Vn0 = jnp.zeros((n_es, dim, dim), dtype)

        if gs_update is not None:
            Lgs = Lflat[offs[0]: offs[0] + len(names[0])]
            v, d, _ = gs_update(rdm1_gs, Lgs)
            V00 = V00 + v
            Delta = Delta.at[0, 0].set(d)

        for n in range(1, n_states):
            st = names[n]
            base = offs[n]
            for i, name in enumerate(st):
                w = Lflat[base + i]
                if name == "mat":
                    tgt = jnp.asarray(targets[n][i][1], dtype=dtype)
                    diff = tgt - rdm1_es[n - 1]
                    Vnn = Vnn.at[n - 1].add(w * diff)
                    den = jnp.sum(jnp.abs(tgt))
                    Delta = Delta.at[n, n].add(jnp.sum(jnp.abs(diff)) / den)
                elif name == "trmat":
                    tgtL = jnp.asarray(targets[n][i][1][0], dtype=dtype)
                    tgtR = jnp.asarray(targets[n][i][1][1], dtype=dtype)
                    # right (n,0) built from tr_r; left (0,n) from tr_l
                    diffR = tgtR - tr_r[n - 1]
                    diffL = tgtL - tr_l[n - 1]
                    Vn0 = Vn0.at[n - 1].add(w * diffR)
                    V0n = V0n.at[n - 1].add(w * diffL)
                    avg = 0.5 * (jnp.sum(jnp.abs(tgtR)) + jnp.sum(jnp.abs(tgtL)))
                    Delta = Delta.at[n, 0].add(jnp.sum(jnp.abs(diffR)) / avg)
                    Delta = Delta.at[0, n].add(jnp.sum(jnp.abs(diffL)) / avg)
                elif name in ("Ek", "v1e"):
                    A_tr = trace_mats[name].astype(dtype)
                    A_pot = pot_mats[name].astype(dtype)
                    calc = jnp.einsum("ij,ji->", A_tr, rdm1_es[n - 1])
                    exp_val = jnp.asarray(targets[n][i][1], dtype=dtype)
                    diff = jnp.abs(exp_val - calc)
                    Delta = Delta.at[n, n].add(
                        jnp.where(jnp.abs(exp_val) > 1e-6,
                                  diff / jnp.abs(exp_val), 0.0))
                    Vnn = Vnn.at[n - 1].add(w * diff * A_pot)
                elif name == "dip":
                    A_tr = trace_mats["dip"].astype(dtype)
                    A_pot = pot_mats["dip"].astype(dtype)
                    calc = jnp.einsum("xij,ji->x", A_tr, rdm1_es[n - 1])
                    exp_val = jnp.asarray(targets[n][i][1], dtype=dtype)
                    diff = jnp.abs(exp_val - calc)
                    Delta = Delta.at[n, n].add(jnp.sum(
                        jnp.where(jnp.abs(exp_val) > 1e-6,
                                  diff / jnp.abs(exp_val), 0.0)))
                    Vnn = Vnn.at[n - 1].add(
                        w * jnp.sum(diff[:, None, None] * A_pot, axis=0))
                elif name == "DEk":
                    # Ek difference fed back into V00 (exp_pot.py:256-282)
                    A_tr = trace_mats["Ek"].astype(dtype)
                    A_pot = pot_mats["Ek"].astype(dtype)
                    diff_rdm1 = rdm1_gs - rdm1_es[n - 1]
                    calc = jnp.einsum("ij,ji->", A_tr, diff_rdm1)
                    exp_val = jnp.asarray(targets[n][i][1], dtype=dtype)
                    diff = jnp.abs(exp_val - calc)
                    Delta = Delta.at[n, n].add(
                        jnp.where(jnp.abs(exp_val) > 1e-6,
                                  diff / jnp.abs(exp_val), 0.0))
                    if DEk_GS_idx is not None:
                        wgs = Lflat[offs[0] + DEk_GS_idx]
                    else:
                        wgs = w
                    V00 = V00 + wgs * diff * A_pot
                elif name == "trdip":
                    A_tr = trace_mats["dip"].astype(dtype)
                    A_pot = pot_mats["dip"].astype(dtype)
                    exp_val = jnp.asarray(targets[n][i][1], dtype=dtype)
                    # right update (n,0): rdm1 = tr_r, rdm1_add = tr_l
                    for (VT, mat_main, mat_add, dl, dr) in (
                            ("n0", tr_r[n - 1], tr_l[n - 1], n, 0),
                            ("0n", tr_l[n - 1], tr_r[n - 1], 0, n)):
                        a1 = jnp.einsum("xij,ji->x", A_tr, mat_main)
                        a2 = jnp.einsum("xij,ji->x", A_tr, mat_add.T)
                        calc = a1 * a2
                        diff = jnp.abs(exp_val - calc)
                        dmat = jnp.sum((diff * a2)[:, None, None] * A_pot,
                                       axis=0)
                        if VT == "n0":
                            Vn0 = Vn0.at[n - 1].add(w * dmat)
                        else:
                            V0n = V0n.at[n - 1].add(w * dmat)
                        Delta = Delta.at[dl, dr].add(jnp.sum(
                            jnp.where(jnp.abs(exp_val) > 1e-6,
                                      diff / jnp.abs(exp_val), 0.0)))
                elif name == "F":
                    # state structure factor (shared GS/ES body, _f_update)
                    vpot, delta_inc, _ = _f_update(
                        trace_mats["F"], pot_mats["F"], nh_F,
                        targets[n][i][1], rdm1_es[n - 1])
                    if delta_inc is not None:
                        Delta = Delta.at[n, n].add(delta_inc)
                    Vnn = Vnn.at[n - 1].add(w * vpot)
                else:
                    raise NotImplementedError(
                        f"device ES Vexp does not support {name!r}")
        return V00, Vnn, V0n, Vn0, Delta

    return update
