"""Excited-state solver tests (coupled multi-state ECW-CCS).

Mirrors the reference driver example (Main.py:1220-1231): H2O/6-31G with a
transition-dipole target for ES1 and a kinetic-energy-difference target for
ES2 (QChem H2O values, gamma_exp.py:27-94)."""

import numpy as np
import pytest

from ecw_cc_tpu import ECW
from ecw_cc_tpu.utils import linalg as ulinalg

EV = 27.2114


@pytest.fixture(scope="module")
def ecw_es():
    ecw = ECW("h2o", "6-31g")
    dip = (0.523742 + 0.550251) / 2.0
    DEk = 7.6051 * 0.03675
    es_prop = [[["trdip", (dip, 0.0, 0.0)]], [["DEk", DEk]]]
    ecw.Build_ES_exp_input(es_prop)
    return ecw


def test_koopman_guess(ecw_es):
    """Koopman guesses: single excitation, sensible energies."""
    ecw = ecw_es
    assert len(ecw.r_ini) == 2
    for r in ecw.r_ini:
        assert np.sum(np.abs(r) > 0) == 1
    r1, de = ulinalg.koopman_init_guess(np.diag(ecw.fock), ecw.mo_occ, [2, 0])
    assert de[0] <= de[1]
    assert 0.1 < de[0] < 1.5  # valence gap in au


def test_es_solve_converges(ecw_es):
    ecw = ecw_es
    out = ecw.CCS_ES(0.15, method="scf", diis="all", conv="rl",
                     conv_thres=1e-5, maxiter=60, print_ite=False)
    Conv_text, dic_amp, Delta, Ep, rdm1_GS = out
    assert "Convergence reached" in Conv_text
    # excitation energies in a physically sensible window (QChem EOM-CCSD
    # references: 7.61 eV and 9.96 eV)
    e1, e2 = Ep[1, 0] * EV, Ep[2, 0] * EV
    assert 6.0 < e1 < 10.0
    assert 8.0 < e2 < 13.0
    assert e2 > e1
    # right and left energies agree at convergence
    assert abs(Ep[1, 0] - Ep[1, 1]) < 1e-3
    # GS rdm1 trace = nelec
    assert abs(np.trace(rdm1_GS) - ecw.nocc) < 1e-8
    # state norms ~ 1
    C = ulinalg.check_ortho(dic_amp["rn"], dic_amp["ln"],
                            dic_amp["r0n"], dic_amp["l0n"])
    assert abs(C[0, 0] - 1) < 0.05
    assert abs(C[1, 1] - 1) < 0.05


def test_es_L0_pure_eom_limit():
    """At L=0 the coupled ES solve decouples into plain EOM-CCS: the
    converged energy must be an eigenvalue of the similarity-transformed
    singles matrix restricted to the force_alpha subspace (rows 1::2, the
    rows rsupdate leaves free, CCS.py:940-941)."""
    import jax.numpy as jnp
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES
    from ecw_cc_tpu.ops.ccs import Gccs
    from ecw_cc_tpu.ops import ccs as ccs_ops

    ecw = ECW("h2o", "sto-3g")
    es_prop = [[["trdip", (0.5, 0.0, 0.0)]]]
    ecw.Build_ES_exp_input(es_prop)
    Vexp = Exp(0.0, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    solver = Solver_ES(Gccs(ecw.eris), Vexp, rn_ini=ecw.r_ini, conv_var="rl",
                       conv_thres=1e-7, maxiter=100, diis="all")
    out = solver.SCF(0.0, print_ite=False)
    assert "Convergence reached" in out[0]
    E_scf = out[3][1, 0]
    # build the full singles matrix at the converged t (= 0 at L=0)
    nocc, nvir = ecw.nocc, ecw.nvir
    ts = jnp.asarray(out[1]["ts"])
    Fab, Fji, W, F, Tia, Pia = ccs_ops.R1inter(ecw.eris, ts, None, None)
    A = (np.einsum("ab,ij->iajb", Fab, np.eye(nocc))
         - np.einsum("ji,ab->iajb", Fji, np.eye(nvir))
         + np.asarray(W).transpose(2, 0, 1, 3))  # akic -> i a k c
    A = A.reshape(nocc * nvir, nocc * nvir) + float(F) * np.eye(nocc * nvir)
    # restrict to the rows/cols rsupdate leaves free (odd occupied rows)
    mask = np.zeros((nocc, nvir), dtype=bool)
    mask[1::2, :] = True
    idx = np.where(mask.ravel())[0]
    w = np.linalg.eigvals(A[np.ix_(idx, idx)])
    assert np.min(np.abs(w.real - E_scf)) < 1e-6


def test_mom_es_targets():
    """MOM delta-SCF ES target generation (reference gamma_exp.ESexp)."""
    ecw = ECW("h2", "6-31g")
    ecw.Build_ES_exp_MOM(nbr_of_es=(1, 0))
    assert len(ecw.exp_data) == 2
    assert ecw.exp_data[1][0][0] == "trmat"
    de = ecw.Eexp_ES[0][0]
    assert 0.3 < de < 1.5  # H2 HOMO->LUMO delta-SCF in au
    tdm = ecw.exp_data[1][0][1][0]
    assert tdm.shape == (2 * ecw.mol.nao,) * 2


def test_scf_diag_davidson_matches_exact():
    """SCF_diag with the matrix-free Davidson equals exact diagonalization."""
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES
    from ecw_cc_tpu.ops.ccs import Gccs

    ecw = ECW("h2o", "sto-3g")
    es_prop = [[["trdip", (0.5, 0.0, 0.0)]]]
    ecw.Build_ES_exp_input(es_prop)
    Vexp = Exp(0.0, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    solver = Solver_ES(Gccs(ecw.eris), Vexp, rn_ini=ecw.r_ini, conv_var="rl",
                       conv_thres=1e-7, maxiter=60)
    out_e = solver.SCF_diag(0.0)
    out_d = solver.SCF_diag(0.0, davidson=True)
    # root selection within degenerate spin pairs is arbitrary; the Davidson
    # eigenvalue must coincide with AN eigenvalue of the exact singles matrix
    import jax.numpy as jnp
    from ecw_cc_tpu.ops import ccs as ccs_ops

    ts = jnp.asarray(out_d[1]["ts"])
    nocc, nvir = ts.shape
    Fab, Fji, W, F, Tia, Pia = ccs_ops.R1inter(ecw.eris, ts, None, None)
    A = (np.einsum("ab,ij->iajb", Fab, np.eye(nocc))
         - np.einsum("ji,ab->iajb", Fji, np.eye(nvir))
         + np.asarray(W).transpose(2, 0, 1, 3))
    nov = nocc * nvir
    A = A.reshape(nov, nov) + float(F) * np.eye(nov)
    w = np.linalg.eigvals(A).real
    assert np.min(np.abs(w - out_d[3][1, 0])) < 1e-6
    assert np.min(np.abs(w - out_e[3][1, 0])) < 1e-6


def test_device_es_solver_matches_host(ecw_es):
    """The fully-jitted while_loop ES solver reproduces the host-loop solver
    (same Vexp math, same update order) on the reference example."""
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES, SolverES_Device
    from ecw_cc_tpu.ops.ccs import Gccs

    ecw = ecw_es
    Vh = Exp(0.15, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    host = Solver_ES(Gccs(ecw.eris), Vh, rn_ini=ecw.r_ini, conv_var="rl",
                     conv_thres=1e-6, maxiter=60, diis="all")
    out_h = host.SCF(0.15, print_ite=False)

    Vd = Exp(0.15, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    dev_s = Solver_ES(Gccs(ecw.eris), Vd, rn_ini=ecw.r_ini, conv_var="rl",
                      conv_thres=1e-6, maxiter=60, diis="all")
    dev = SolverES_Device(dev_s)
    out_d = dev.SCF(0.15)

    assert "Convergence reached" in out_h[0]
    assert "Convergence reached" in out_d[0]
    # same converged energies (independent implementations of one math)
    assert np.max(np.abs(out_h[3] - out_d[3])) < 1e-5
    assert np.max(np.abs(out_h[1]["ts"] - out_d[1]["ts"])) < 1e-5
    assert abs(np.trace(out_d[4]) - ecw.nocc) < 1e-8


def test_scf_diag_left_vectors_differ_from_right():
    """The similarity-transformed singles map is non-symmetric once ts != 0:
    SCF_diag must deliver DISTINCT left eigenvectors (the reference runs a
    separate non-symmetric Davidson for L, Solver_ES.py:746-761; r1 VERDICT
    missing #2) with the same eigenvalue as the right solve."""
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES
    from ecw_cc_tpu.ops.ccs import Gccs

    ecw = ECW("h2o", "sto-3g")
    # GS 'mat' target makes ts converge away from zero -> the singles map
    # becomes genuinely non-symmetric (with ts=0 it is symmetric and l=r is
    # correct); the trdip target threads transition Vexp into the maps
    ecw.Build_GS_exp("mat", "HF", field=[0.05, 0.01, 0.0])
    es_prop = [[["trdip", (0.5, 0.0, 0.0)]]]
    ecw.Build_ES_exp_input(es_prop)
    Vexp = Exp(0.05, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    solver = Solver_ES(Gccs(ecw.eris), Vexp, rn_ini=ecw.r_ini, conv_var="rl",
                       conv_thres=1e-7, maxiter=80)
    text, dic, Delta, Ep, rdm1 = solver.SCF_diag(0.05)
    assert "Convergence reached" in text
    rn = np.ravel(dic["rn"][0])
    ln = np.ravel(dic["ln"][0])
    # unit-normalized; compare up to sign
    ov = abs(float(rn @ ln))
    # the non-symmetry is O(ts^2) — small for this field, but an aliased
    # (ln = rn) implementation returns |<l|r>| = 1.0 exactly
    assert ov < 1.0 - 1e-8, f"left vector aliases the right one (|<l|r>|={ov})"
    assert ov > 0.5  # same physical root
    # the transition Vexp must have been built (threaded into the maps)
    assert Vexp.Vexp[1, 0] is not None and np.any(np.asarray(Vexp.Vexp[1, 0]))
    assert Vexp.Vexp[0, 1] is not None


def test_driver_es_method_device_and_diag(ecw_es):
    """Driver-level wiring (r2 VERDICT missing #2): ECW.CCS_ES must reach
    the fully-jitted device solver (method='device') and the rebuilt
    SCF_diag (method='diag', reference branch Main.py:892-894)."""
    ecw = ecw_es
    out_scf = ecw.CCS_ES(0.15, method="scf", diis="all", conv="rl",
                         conv_thres=1e-5, maxiter=60, print_ite=False)
    out_dev = ecw.CCS_ES(0.15, method="device", diis="all", conv="rl",
                         conv_thres=1e-5, maxiter=60, print_ite=False)
    assert "Convergence reached" in out_dev[0]
    # same converged energy matrix as the host-orchestrated solve
    assert np.max(np.abs(np.asarray(out_scf[3]) - np.asarray(out_dev[3]))) < 1e-4

    out_diag = ecw.CCS_ES(0.15, method="diag", conv="tl",
                          conv_thres=1e-5, maxiter=80, print_ite=False)
    assert "Convergence reached" in out_diag[0]
    # diag and scf solve different update schemes but the same equations:
    # excitation energies agree to the coupling-scheme tolerance
    e_scf = np.asarray(out_scf[3])[1:, 0]
    e_diag = np.asarray(out_diag[3])[1:, 0]
    assert np.max(np.abs(e_scf - e_diag)) < 5e-2


def test_driver_es_method_bad():
    ecw = ECW("h2o", "sto-3g")
    ecw.Build_ES_exp_input([[["trdip", (0.5, 0.0, 0.0)]]])
    with pytest.raises(SyntaxError):
        ecw.CCS_ES(0.1, method="nope", print_ite=False)


def test_driver_es_solve_on_eom_targets():
    """End-to-end: EOM-generated trmat targets drive the coupled ES solver
    to convergence (regression: the ov-extraction assumed unit Koopman
    guesses and crashed on EOM-generated r_ini)."""
    ecw = ECW("h2o", "sto-3g")
    ecw.Build_ES_exp_EOM(1, prop="trmat")
    out = ecw.CCS_ES(0.1, diis="all", conv="rl", conv_thres=1e-5,
                     maxiter=60, print_ite=False)
    assert "Convergence reached" in out[0]


def test_device_es_vexp_F_parity(ecw_es):
    """Device ES Vexp supports structure-factor ('F') state targets: the
    fused jitted update matches the host Exp.Vexp_update 'F' branch
    (reference exp_pot.py:324-341, its R/G shape bug fixed on both paths)
    on random MO rdm1s, potential and Delta alike."""
    import jax.numpy as jnp

    from ecw_cc_tpu.ops.vexp import Exp, make_es_vexp_device

    ecw = ecw_es
    nmo = len(np.asarray(ecw.mo_occ))
    rng = np.random.default_rng(3)
    rdm1_gs = rng.standard_normal((nmo, nmo)) * 0.05 + np.diag(ecw.mo_occ)
    rdm1_es = rng.standard_normal((nmo, nmo)) * 0.05 + np.diag(ecw.mo_occ)
    h = [[1, 0, 0], [0, 1, 0], [1, 1, 0]]
    rec = np.asarray([8.0, 8.0, 8.0])
    Fvals = list(rng.standard_normal(3) + 1j * rng.standard_normal(3))
    exp_data = [[["mat", np.diag(ecw.mo_occ)]], [["F", Fvals, h, rec]]]
    L = 0.2

    host = Exp(L, exp_data, ecw.mol, ecw.mo_coeff)
    d_h, _ = host.Vexp_update(rdm1_es, rdm1_es, (1, 1))
    V11_h = host.Vexp[1, 1]

    dev = Exp(L, exp_data, ecw.mol, ecw.mo_coeff)
    upd = make_es_vexp_device(dev)
    z = jnp.zeros((1, nmo, nmo))
    V00, Vnn, V0n, Vn0, Delta = upd(jnp.asarray(rdm1_gs),
                                    jnp.asarray(rdm1_es)[None], z, z,
                                    jnp.asarray([L, L]))
    assert np.max(np.abs(np.asarray(Vnn[0]) - V11_h)) < 1e-10
    assert abs(float(Delta[1, 1]) - d_h) < 1e-10
    # the device ES solver gate accepts 'F' now
    from ecw_cc_tpu.solvers.es import _ES_DEVICE_PROPS
    assert "F" in _ES_DEVICE_PROPS


def test_device_es_solve_with_F_target(ecw_es):
    """End-to-end device ES solve (lax.while_loop) with a structure-factor
    state target mixed with a trdip transition target (ADVICE r3 #3): the
    SolverES_Device run must converge and match the host Solver_ES path."""
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES, SolverES_Device
    from ecw_cc_tpu.ops.ccs import Gccs

    ecw = ecw_es
    # synthesize a consistent F target from the MOM ES1 rdm1 proxy: use the
    # HF ground-state density's structure factors, nudged, so the solve has
    # a reachable fixed point
    h = [[1, 0, 0], [0, 1, 0], [1, 1, 0]]
    rec = np.asarray([8.0, 8.0, 8.0])
    gs_rdm1 = np.diag(ecw.mo_occ)
    probe = Exp(0.1, [[["mat", gs_rdm1]], [["F", [0j, 0j, 0j], h, rec]]],
                ecw.mol, ecw.mo_coeff)
    # structure factors of the HF density, via the same re/im trace
    # operators the device path uses (they ARE the property definition)
    import jax.numpy as jnp
    from ecw_cc_tpu.ops.vexp import _f_trace_mats
    from ecw_cc_tpu.utils import convert

    C = np.asarray(ecw.mo_coeff)
    tmg = lambda A: jnp.asarray(
        C.T @ (convert.convert_r_to_g_rdm1(A) * 2.0) @ C)
    Fre, Fim = _f_trace_mats(probe, tmg)
    Fvals = [complex(float(np.einsum("ij,ji->", np.asarray(Fre[k]),
                                     gs_rdm1)),
                     float(np.einsum("ij,ji->", np.asarray(Fim[k]),
                                     gs_rdm1)))
             for k in range(3)]

    dip = (0.523742 + 0.550251) / 2.0
    es_prop = [[["trdip", (dip, 0.0, 0.0)]], [["F", Fvals, h, rec]]]
    ecw2 = ECW("h2o", "6-31g")
    ecw2.Build_ES_exp_input(es_prop)

    Vh = Exp(0.05, ecw2.exp_data, ecw2.mol, ecw2.mo_coeff)
    host = Solver_ES(Gccs(ecw2.eris), Vh, rn_ini=ecw2.r_ini, conv_var="rl",
                     conv_thres=1e-6, maxiter=80, diis="all")
    out_h = host.SCF(0.05, print_ite=False)

    Vd = Exp(0.05, ecw2.exp_data, ecw2.mol, ecw2.mo_coeff)
    dev_s = Solver_ES(Gccs(ecw2.eris), Vd, rn_ini=ecw2.r_ini, conv_var="rl",
                      conv_thres=1e-6, maxiter=80, diis="all")
    out_d = SolverES_Device(dev_s).SCF(0.05)

    assert "Convergence reached" in out_h[0]
    assert "Convergence reached" in out_d[0]
    assert np.max(np.abs(out_h[3] - out_d[3])) < 1e-5
    assert np.max(np.abs(out_h[1]["ts"] - out_d[1]["ts"])) < 1e-5


def test_device_es_solver_production_basis():
    """f64 host-path parity at the PRODUCTION ES bench config (r3 VERDICT
    next #3): H2O/6-31++g** with the reference's two QChem trdip targets
    (/root/reference/test/Test_ECW_ES.py:1-50) — SolverES_Device must
    converge and match the host Solver_ES energy matrix."""
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES, SolverES_Device
    from ecw_cc_tpu.ops.ccs import Gccs

    ecw = ECW("h2o", "6-31++g**")
    dip1 = (0.523742 + 0.550251) / 2.0
    dip2 = (0.622534 + 0.649058) / 2.0
    ecw.Build_ES_exp_input([[["trdip", (dip1, 0.0, 0.0)]],
                            [["trdip", (0.0, 0.0, dip2)]]])
    L = 0.1
    Vh = Exp(L, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    host = Solver_ES(Gccs(ecw.eris), Vh, rn_ini=ecw.r_ini, conv_var="rl",
                     conv_thres=1e-5, maxiter=80, diis="all")
    out_h = host.SCF(L, print_ite=False)
    Vd = Exp(L, ecw.exp_data, ecw.mol, ecw.mo_coeff)
    dev_s = Solver_ES(Gccs(ecw.eris), Vd, rn_ini=ecw.r_ini, conv_var="rl",
                      conv_thres=1e-5, maxiter=80, diis="all")
    out_d = SolverES_Device(dev_s).SCF(L)
    assert "Convergence reached" in out_h[0]
    assert "Convergence reached" in out_d[0]
    assert np.max(np.abs(out_h[3] - out_d[3])) < 1e-8
    # the tracked ES1 stays in the QChem state's neighborhood (7.6051 eV)
    e1 = out_d[3][1, 0] * EV
    assert 6.5 < e1 < 8.5


def test_f32_es_holds_f64_state_production_basis():
    """r5 regression for the r4 'f32 ES instability' — which was a LAYOUT
    artifact, not a precision one: the r4 measurement fed
    alternating-convention amplitudes into the spin-SORTED f32 production
    eris (ecw.eris) and saw E_es1 drift 7.13 -> 9.11 eV.  With the correct
    alternating handle (ECW._eris_alt(), what CCS_ES itself uses) a COLD
    f32 solve at the production config converges to the f64 fixed point
    (7.1335 / 10.0701 eV, tools/es_f32_drift_r5.py) — so the ES pillar
    runs at production precision with no f64 subprocess.

    Also pins the guard: constructing an ES solver on the sorted handle
    warns (models/eris.warn_if_sorted_layout)."""
    from ecw_cc_tpu import config as cfg
    from ecw_cc_tpu.ops.ccs import Gccs
    from ecw_cc_tpu.ops.vexp import Exp
    from ecw_cc_tpu.solvers.es import Solver_ES, SolverES_Device

    old_dtype = cfg.get_config().dtype
    try:
        cfg.set_config(dtype="float32")
        ecw = ECW("h2o", "6-31++g**")
        dip1 = (0.523742 + 0.550251) / 2.0
        dip2 = (0.622534 + 0.649058) / 2.0
        ecw.Build_ES_exp_input([[["trdip", (dip1, 0.0, 0.0)]],
                                [["trdip", (0.0, 0.0, dip2)]]])
        L = 0.1
        eris = ecw._eris_alt()
        assert np.asarray(eris.fock).dtype == np.float32
        V = Exp(L, ecw.exp_data, ecw.mol, ecw.mo_coeff)
        s = Solver_ES(Gccs(eris), V, rn_ini=ecw.r_ini, conv_var="rl",
                      conv_thres=1e-5, maxiter=80, diis="all")
        out = SolverES_Device(s).SCF(L)
        assert "Convergence reached" in out[0]
        Ep = np.asarray(out[3])
        # f64 anchors (CPU, conv 1e-7): 7.1335 / 10.0701 eV at L=0.1
        assert abs(float(Ep[1, 0]) * EV - 7.1335) < 2e-3
        assert abs(float(Ep[2, 0]) * EV - 10.0701) < 2e-3

        # the r4 footgun now warns: ecw.eris is spin-sorted at this size
        # (nvir=48 >= the packed-route gate)
        with pytest.warns(RuntimeWarning, match="spin-SORTED"):
            Solver_ES(Gccs(ecw.eris), Exp(L, ecw.exp_data, ecw.mol,
                                          ecw.mo_coeff),
                      rn_ini=ecw.r_ini, conv_var="rl", conv_thres=1e-5,
                      maxiter=80, diis="all")
    finally:
        cfg.set_config(dtype=old_dtype)
