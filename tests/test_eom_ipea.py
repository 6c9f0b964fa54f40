"""EOM-IP/EA-CCSD validation (ops/eom_ipea.py, Wick-derived sigma).

Certification chain:
  1. determinant-space identity at RANDOM amplitudes: the full
     (connected=False) sigma matrix equals  P (e^-T H_N e^T) P  projected
     onto the 1h+2h1p (IP) / 1p+2p1h (EA) determinants, built independently
     by oracle.hbar_in_sector — validates every generated term, sign and
     prefactor, with no CC equations in the loop;
  2. the connected (production) variant differs from the full one by
     exactly E_corr * identity at converged amplitudes;
  3. physics: for a 2-electron system the 1h+2h1p space spans the entire
     (N-1)-electron sector, so EOM-IP-CCSD eigenvalues are EXACT
     (== 1-electron eigenvalues minus the CCSD total electronic energy);
  4. the Davidson production path reproduces the dense-matrix eigenvalues,
     and left eigenvectors satisfy A^T L = omega L with <L|R> = 1.
"""

import numpy as np
import pytest

from ecw_cc_tpu.models.eris import GEris
from ecw_cc_tpu.oracle import hbar_in_sector
from ecw_cc_tpu.ops import eom_ipea


# ---------------------------------------------------------------------------
# synthetic spin-orbital systems (random but properly symmetric f / <pq||rs>)
# ---------------------------------------------------------------------------

def _rand_fv(nmo, nocc, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((nmo, nmo)) * 0.1
    f = f + f.T
    f[np.diag_indices(nmo)] = np.concatenate(
        [np.linspace(-2.0, -1.0, nocc), np.linspace(0.5, 2.0, nmo - nocc)])
    v = rng.standard_normal((nmo,) * 4) * 0.05
    v = v - v.transpose(1, 0, 2, 3)
    v = v - v.transpose(0, 1, 3, 2)
    v = v + v.transpose(2, 3, 0, 1)
    return f, v


def _geris_from_fv(f, v, nocc):
    import jax.numpy as jnp

    o, vv = slice(0, nocc), slice(nocc, None)
    blocks = dict(
        fock=f,
        oooo=v[o, o, o, o], ooov=v[o, o, o, vv], oovo=v[o, o, vv, o],
        oovv=v[o, o, vv, vv], ovov=v[o, vv, o, vv], ovvo=v[o, vv, vv, o],
        ovvv=v[o, vv, vv, vv], ovoo=v[o, vv, o, o], vvvv=v[vv, vv, vv, vv],
        vooo=v[vv, o, o, o], vovo=v[vv, o, vv, o], voov=v[vv, o, o, vv],
        vovv=v[vv, o, vv, vv], vvoo=v[vv, vv, o, o], vvvo=v[vv, vv, vv, o])
    return GEris(**{k: jnp.asarray(b) for k, b in blocks.items()})


def _rand_amps(nocc, nvir, seed=1, scale=0.05):
    rng = np.random.default_rng(seed)
    t1 = rng.standard_normal((nocc, nvir)) * scale
    t2 = rng.standard_normal((nocc, nocc, nvir, nvir)) * scale
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = t2 - t2.transpose(0, 1, 3, 2)
    return t1, t2


# ---------------------------------------------------------------------------
# determinant-space construction of the EOM basis + matrix
# ---------------------------------------------------------------------------

def _ipea_basis(space, nocc, nmo, kind):
    """[(det_index, sign)] of the R-space kets, in the same order as the
    packed sigma storage: 1h (i) then 2h1p (i<j, a) for IP; 1p (a) then
    2p1h (i, a<b) for EA.  Kets are the operator strings applied to the
    N-electron reference bitmask (a+_a a_j a_i |0> applies a_i first)."""
    ref = (1 << nocc) - 1
    nvir = nmo - nocc
    basis = []
    if kind == "ip":
        for i in range(nocc):
            d, s = space._ann(ref, i)
            basis.append((space.index[d], s))
        for i in range(nocc):
            for j in range(i + 1, nocc):
                for a in range(nvir):
                    d1, s1 = space._ann(ref, i)
                    d2, s2 = space._ann(d1, j)
                    d3, s3 = space._cre(d2, nocc + a)
                    basis.append((space.index[d3], s1 * s2 * s3))
    else:
        for a in range(nvir):
            d, s = space._cre(ref, nocc + a)
            basis.append((space.index[d], s))
        for i in range(nocc):
            for a in range(nvir):
                for b in range(a + 1, nvir):
                    d1, s1 = space._ann(ref, i)
                    d2, s2 = space._cre(d1, nocc + b)
                    d3, s3 = space._cre(d2, nocc + a)
                    basis.append((space.index[d3], s1 * s2 * s3))
    return basis


def _unit_r(nocc, nvir, kind, col):
    """(r1, r2) unit vector for packed column `col` (same ordering as
    _ipea_basis)."""
    if kind == "ip":
        r1 = np.zeros(nocc)
        r2 = np.zeros((nocc, nocc, nvir))
        n1 = nocc
        if col < n1:
            r1[col] = 1.0
        else:
            k = col - n1
            pairs = [(i, j) for i in range(nocc) for j in range(i + 1, nocc)]
            (i, j), a = pairs[k // nvir], k % nvir
            r2[i, j, a] = 1.0
            r2[j, i, a] = -1.0
    else:
        r1 = np.zeros(nvir)
        r2 = np.zeros((nocc, nvir, nvir))
        n1 = nvir
        if col < n1:
            r1[col] = 1.0
        else:
            k = col - n1
            pairs = [(a, b) for a in range(nvir) for b in range(a + 1, nvir)]
            i, (a, b) = k // len(pairs), pairs[k % len(pairs)]
            r2[i, a, b] = 1.0
            r2[i, b, a] = -1.0
    return r1, r2


def _pack_sigma(s1, s2, nocc, nvir, kind):
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    rows = list(s1.ravel())
    if kind == "ip":
        for i in range(nocc):
            for j in range(i + 1, nocc):
                for a in range(nvir):
                    rows.append(s2[i, j, a])
    else:
        for i in range(nocc):
            for a in range(nvir):
                for b in range(a + 1, nvir):
                    rows.append(s2[i, a, b])
    return np.asarray(rows)


def _sigma_matrix(eris, t1, t2, kind, connected, fsp=None, vvvv_op=None):
    import jax.numpy as jnp

    nocc, nvir = t1.shape
    sigma, _ = eom_ipea.make_sigma_ipea(eris, jnp.asarray(t1),
                                        jnp.asarray(t2), kind,
                                        fsp=fsp, connected=connected,
                                        vvvv_op=vvvv_op)
    if kind == "ip":
        dim = nocc + nocc * (nocc - 1) // 2 * nvir
    else:
        dim = nvir + nocc * nvir * (nvir - 1) // 2
    cols = []
    for col in range(dim):
        r1, r2 = _unit_r(nocc, nvir, kind, col)
        s1, s2 = sigma(jnp.asarray(r1), jnp.asarray(r2))
        cols.append(_pack_sigma(s1, s2, nocc, nvir, kind))
    return np.stack(cols, axis=1)


def _detspace_matrix(f, v, nocc, kind, t1, t2):
    nmo = f.shape[0]
    nelec = nocc - 1 if kind == "ip" else nocc + 1
    space, hbar, e_ref = hbar_in_sector(f, v, nocc, nelec, t1, t2)
    basis = _ipea_basis(space, nocc, nmo, kind)
    dim = len(basis)
    M = np.zeros((dim, dim))
    for mu, (dmu, smu) in enumerate(basis):
        for nu, (dnu, snu) in enumerate(basis):
            M[mu, nu] = smu * snu * hbar[dmu, dnu]
    return M - e_ref * np.eye(dim)


# ---------------------------------------------------------------------------
# 1. determinant-space identity at random amplitudes
# ---------------------------------------------------------------------------

def test_ea_packed_vvvv_route_matches_dense():
    """On pack-on-build ERIs (placeholder vvvv) the EA sigma's two <ab||cd>
    terms ride one PackedVVVV GEMM — must equal the dense route exactly."""
    import jax.numpy as jnp
    from ecw_cc_tpu.ops.ladder import pack_vvvv

    nmo, nocc = 6, 2
    f, v = _rand_fv(nmo, nocc, seed=3)
    nvir = nmo - nocc
    t1, t2 = _rand_amps(nocc, nvir, seed=4)
    eris = _geris_from_fv(f, v, nocc)
    A_dense = _sigma_matrix(eris, t1, t2, "ea", connected=True)
    packed = pack_vvvv(eris.vvvv)
    eris_p = eris._replace(vvvv=jnp.zeros((nvir, 0, 0, 0)))
    A_packed = _sigma_matrix(eris_p, t1, t2, "ea", connected=True,
                             vvvv_op=packed)
    assert np.max(np.abs(A_dense - A_packed)) < 1e-12
    with pytest.raises(NotImplementedError):
        eom_ipea.make_sigma_ipea(eris_p, jnp.asarray(t1), jnp.asarray(t2),
                                 "ea")


def test_ipea_f32_sorted_packed_matches_f64_dense(h2o_sto3g):
    """Production path: f32 spin-sorted pack-on-build ERIs (SectoredVVVV —
    the EA ladder terms ride the sectored route) reproduce the f64
    dense-layout IP/EA energies."""
    from ecw_cc_tpu import config as cfg
    from ecw_cc_tpu.models.eris import build_eris_device
    from ecw_cc_tpu.models.scf import GHF
    from ecw_cc_tpu.ops.ccsd_t import solve_ccsd

    mol, ghf, eris_host, eris = h2o_sto3g
    t1, t2, _ = solve_ccsd(eris, conv_tol=1e-12)
    w_ip64, _ = eom_ipea.eom_ip_ccsd(eris, t1, t2, nroots=2, tol=1e-8)
    w_ea64, _ = eom_ipea.eom_ea_ccsd(eris, t1, t2, nroots=2, tol=1e-8)

    old = cfg.get_config().dtype
    try:
        cfg.set_config(dtype="float32")
        eris32, vvvv_op = build_eris_device(mol, GHF(ghf._rhf),
                                            dtype="float32",
                                            pack_ladder=True,
                                            sort_spin=True)
        t1s, t2s, _ = solve_ccsd(
            eris32, conv_tol=1e-10,
            vvvv_op=vvvv_op)
        w_ip32, _ = eom_ipea.eom_ip_ccsd(eris32, t1s, t2s, nroots=2,
                                         tol=1e-5)
        w_ea32, _ = eom_ipea.eom_ea_ccsd(eris32, t1s, t2s, nroots=2,
                                         tol=1e-5, vvvv_op=vvvv_op)
    finally:
        cfg.set_config(dtype=old)
    assert np.allclose(sorted(w_ip64), sorted(w_ip32), atol=2e-5)
    assert np.allclose(sorted(w_ea64), sorted(w_ea32), atol=2e-5)


@pytest.mark.parametrize("kind,nmo,nocc", [("ip", 6, 3), ("ea", 6, 2)])
def test_sigma_matches_detspace_at_random_amps(kind, nmo, nocc):
    f, v = _rand_fv(nmo, nocc)
    nvir = nmo - nocc
    t1, t2 = _rand_amps(nocc, nvir)
    eris = _geris_from_fv(f, v, nocc)
    A = _sigma_matrix(eris, t1, t2, kind, connected=False)
    M = _detspace_matrix(f, v, nocc, kind, t1, t2)
    assert A.shape == M.shape
    assert np.max(np.abs(A - M)) < 1e-10


# ---------------------------------------------------------------------------
# 2.-4. physics + production path on H2/6-31G (2 electrons)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def h2_ccsd(h2_631g):
    from ecw_cc_tpu.ops.ccsd_t import solve_ccsd

    mol, ghf, eris_host, eris = h2_631g
    t1, t2, ecc = solve_ccsd(eris, conv_tol=1e-13)
    e_ref_elec = ghf.e_tot - mol.energy_nuc()
    return mol, ghf, eris, np.asarray(t1), np.asarray(t2), ecc, e_ref_elec


def test_ip_exact_for_two_electron_system(h2_ccsd):
    """1h+2h1p spans the whole 1-electron sector for a 2-electron system,
    and Hbar is a similarity transform, so every EOM-IP eigenvalue must be
    E_k(1 electron) - E_CCSD exactly."""
    mol, ghf, eris, t1, t2, ecc, e_ref = h2_ccsd
    A = _sigma_matrix(eris, t1, t2, "ip", connected=True)
    w = np.sort(np.linalg.eigvals(A).real)

    h_ao = ghf._rhf.get_hcore()
    nao = h_ao.shape[0]
    h_g = np.zeros((2 * nao, 2 * nao))
    h_g[:nao, :nao] = h_ao
    h_g[nao:, nao:] = h_ao
    h_mo = ghf.mo_coeff.T @ h_g @ ghf.mo_coeff
    e1 = np.sort(np.linalg.eigvalsh(h_mo))
    e_cc_total = e_ref + ecc
    assert w.shape == e1.shape  # the sector is spanned completely
    assert np.max(np.abs(w - (e1 - e_cc_total))) < 1e-8


def test_connected_equals_full_shifted_at_converged_t(h2_ccsd):
    _, _, eris, t1, t2, ecc, _ = h2_ccsd
    Ac = _sigma_matrix(eris, t1, t2, "ip", connected=True)
    Af = _sigma_matrix(eris, t1, t2, "ip", connected=False)
    assert np.max(np.abs(Af - (Ac + ecc * np.eye(len(Ac))))) < 1e-9


def test_davidson_matches_dense_eigenvalues(h2_ccsd):
    _, _, eris, t1, t2, _, _ = h2_ccsd
    for kind in ("ip", "ea"):
        A = _sigma_matrix(eris, t1, t2, kind, connected=True)
        w_dense = np.sort(np.linalg.eigvals(A).real)
        omegas, Rs = eom_ipea.eom_ipea_ccsd(eris, t1, t2, kind, nroots=2,
                                            tol=1e-9)
        assert np.allclose(sorted(omegas), w_dense[:2], atol=1e-7)
        r1, r2 = Rs[0]
        assert r1.shape == ((t1.shape[0],) if kind == "ip"
                            else (t1.shape[1],))


# ---------------------------------------------------------------------------
# Dyson orbitals
# ---------------------------------------------------------------------------

def _rect_op(space_src, space_tgt, p, create):
    """Rectangular a+_p / a_p matrix between determinant sectors."""
    M = np.zeros((space_tgt.dim, space_src.dim))
    for c, det in enumerate(space_src.dets):
        d, s = (space_src._cre(det, p) if create
                else space_src._ann(det, p))
        if d is not None:
            M[space_tgt.index[d], c] += s
    return M


def _r_vector(space, nocc, nmo, kind, x1, x2):
    """Determinant vector of R|0> (or the L bra, same coefficients)."""
    ref = (1 << nocc) - 1
    nvir = nmo - nocc
    vec = np.zeros(space.dim)
    if kind == "ip":
        for i in range(nocc):
            d, s = space._ann(ref, i)
            vec[space.index[d]] += x1[i] * s
        for i in range(nocc):
            for j in range(nocc):
                for a in range(nvir):
                    d1, s1 = space._ann(ref, i)
                    d2, s2 = space._ann(d1, j)
                    if d2 is None:
                        continue
                    d3, s3 = space._cre(d2, nocc + a)
                    vec[space.index[d3]] += 0.5 * x2[i, j, a] * s1 * s2 * s3
    else:
        for a in range(nvir):
            d, s = space._cre(ref, nocc + a)
            vec[space.index[d]] += x1[a] * s
        for i in range(nocc):
            for a in range(nvir):
                for b in range(nvir):
                    if a == b:
                        continue
                    d1, s1 = space._ann(ref, i)
                    d2, s2 = space._cre(d1, nocc + b)
                    if d2 is None:
                        continue
                    d3, s3 = space._cre(d2, nocc + a)
                    if d3 is None:
                        continue
                    vec[space.index[d3]] += 0.5 * x2[i, a, b] * s1 * s2 * s3
    return vec


def _lambda_bra(space, nocc, nmo, lam1, lam2):
    """<0|(1+Lambda) as a row vector over the N-electron determinants."""
    ref_idx = space.index[(1 << nocc) - 1]
    e0 = np.zeros(space.dim)
    e0[ref_idx] = 1.0
    L1 = np.zeros((nmo, nmo))
    L1[:nocc, nocc:] = lam1
    op1 = space.op_matrix_1e(L1)
    E4 = np.zeros((nmo,) * 4)
    E4[:nocc, :nocc, nocc:, nocc:] = lam2
    op2 = space.op_matrix_2e(E4)
    return e0 + op1.T @ e0 + op2.T @ e0


@pytest.mark.parametrize("kind", ["ip", "ea"])
def test_dyson_matches_detspace_at_random_amps(kind):
    from ecw_cc_tpu.oracle import cluster_matrices

    nmo, nocc = 6, 3 if kind == "ip" else 2
    nvir = nmo - nocc
    f, v = _rand_fv(nmo, nocc, seed=7)
    t1, t2 = _rand_amps(nocc, nvir, seed=8)
    lam1, lam2 = _rand_amps(nocc, nvir, seed=9)
    rng = np.random.default_rng(10)
    if kind == "ip":
        x1 = rng.standard_normal(nocc)
        x2 = rng.standard_normal((nocc, nocc, nvir))
        x2 = 0.5 * (x2 - x2.transpose(1, 0, 2))
    else:
        x1 = rng.standard_normal(nvir)
        x2 = rng.standard_normal((nocc, nvir, nvir))
        x2 = 0.5 * (x2 - x2.transpose(0, 2, 1))

    import jax.numpy as jnp

    [(dL, dR, s)] = eom_ipea.dyson_orbitals(
        jnp.asarray(t1), jnp.asarray(t2), [(x1, x2)], [(x1, x2)], kind,
        lam1=jnp.asarray(lam1), lam2=jnp.asarray(lam2))

    nelec = nocc - 1 if kind == "ip" else nocc + 1
    spaceN, UN, UinvN = cluster_matrices(nmo, nocc, nocc, t1, t2)
    spaceM, UM, UinvM = cluster_matrices(nmo, nocc, nelec, t1, t2)
    ref_idx = spaceN.index[(1 << nocc) - 1]
    e0 = np.zeros(spaceN.dim)
    e0[ref_idx] = 1.0
    Lbra = _r_vector(spaceM, nocc, nmo, kind, x1, x2)
    Rket = Lbra.copy()
    lbra_N = _lambda_bra(spaceN, nocc, nmo, lam1, lam2)
    dL_ref = np.zeros(nmo)
    dR_ref = np.zeros(nmo)
    for p in range(nmo):
        # left: <0|L e^-T a#_p e^T|0>  (a#: IP annihilates, EA creates)
        A = _rect_op(spaceN, spaceM, p, create=(kind == "ea"))
        dL_ref[p] = Lbra @ (UinvM @ A @ UN @ e0)
        # right: <0|(1+Lam) e^-T a#^+_p e^T R|0>
        C = _rect_op(spaceM, spaceN, p, create=(kind == "ip"))
        dR_ref[p] = lbra_N @ (UinvN @ C @ UM @ Rket)
    assert np.max(np.abs(np.asarray(dL) - dL_ref)) < 1e-11
    assert np.max(np.abs(np.asarray(dR) - dR_ref)) < 1e-11
    assert abs(s - dL_ref @ dR_ref) < 1e-10


def test_dyson_pole_strength_h2(h2_ccsd):
    """Lowest IP of H2 is Koopmans-like: pole strength close to 1."""
    import jax.numpy as jnp
    from ecw_cc_tpu.models.gamma_exp import solve_lambda

    _, _, eris, t1, t2, _, _ = h2_ccsd
    lam1, lam2 = solve_lambda(eris, jnp.asarray(t1), jnp.asarray(t2),
                              conv_tol=1e-11)
    omegas, Rs, Ls = eom_ipea.eom_ip_ccsd(eris, t1, t2, nroots=1,
                                          tol=1e-9, left=True)
    [(dL, dR, s)] = eom_ipea.dyson_orbitals(
        jnp.asarray(t1), jnp.asarray(t2), Rs, Ls, "ip",
        lam1=lam1, lam2=lam2)
    assert 0.7 < s <= 1.0001
    # the Dyson orbital is dominated by the HOMO 1h component
    assert np.argmax(np.abs(dL)) < eris.nocc


def test_left_eigenvectors_biorthogonal(h2_ccsd):
    _, _, eris, t1, t2, _, _ = h2_ccsd
    omegas, Rs, Ls = eom_ipea.eom_ip_ccsd(eris, t1, t2, nroots=1,
                                          tol=1e-9, left=True)
    nocc, nvir = t1.shape
    sigma, sigma_left = eom_ipea.make_sigma_ipea(eris, t1, t2, "ip")
    l1, l2 = Ls[0]
    # raw A^T eigvec is (l1, l2/2): returned Ls are metric-corrected
    s1, s2 = sigma_left(l1, l2 / 2.0)
    s2 = np.asarray(s2)
    s2 = 0.5 * (s2 - s2.transpose(1, 0, 2))
    assert np.max(np.abs(np.asarray(s1) - omegas[0] * l1)) < 1e-6
    assert np.max(np.abs(s2 - omegas[0] * (l2 / 2.0))) < 1e-6
    ov = np.vdot(l1, Rs[0][0]) + 0.5 * np.vdot(l2, Rs[0][1])
    assert abs(ov - 1.0) < 1e-8  # physical product (1/2 on 2h1p storage)
