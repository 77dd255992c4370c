"""Direct NumPy transliteration of the reference continuum flow
(contnm.f90 + modm.f90:200-247) used as the test oracle.

Implements the same ABSRB accumulation with XINT/pre_xint arithmetic for the
sub-continua exercised by the tests.  Loops, 1-based indices, Fortran
truncation — deliberately unoptimised.
"""

import numpy as np

from monortm_tpu.data import loader

ONEPL, ONEMI = 1.001, 1.999 - 1.0  # ONEMI = 0.999


def radfn(v, xkt):
    if xkt > 0:
        x = v / xkt
        if x <= 0.01:
            return 0.5 * x * v
        if x <= 10.0:
            e = np.exp(-x)
            return v * (1 - e) / (1 + e)
    return v


def xint(v1a, dva, a, afact, vft, dvr3, r3, n1r3, n2r3):
    """lblrtm_sub.f90:1-34 (a is 1-based padded: a[0] unused)."""
    recdva = 1.0 / dva
    v2a = v1a + dva * (len(a) - 2)
    ilo = int(np.trunc((v1a + dva - vft) / dvr3 + 1.0 + 0.999))
    ilo = max(ilo, n1r3)
    ihi = int(np.trunc((v2a - dva - vft) / dvr3 + 0.999))
    ihi = min(ihi, n2r3)
    for i in range(ilo, ihi + 1):
        vi = vft + dvr3 * (i - 1)
        j = int(np.trunc((vi - v1a) * recdva + ONEPL))
        vj = v1a + dva * (j - 1)
        p = recdva * (vi - vj)
        c = (3.0 - 2.0 * p) * p * p
        b = 0.5 * p * (1.0 - p)
        b1 = b * (1.0 - p)
        b2 = b * p
        conti = (-a[j - 1] * b1 + a[j] * (1.0 - c + b2)
                 + a[j + 1] * (c + b1) - a[j + 2] * b2)
        r3[i - 1] += conti * afact


def pre_xint(v1ss, v2ss, v1abs, dvabs, nptabs):
    ist = max(1, int(np.trunc(2 + (v1ss - v1abs) / dvabs + 1e-5)))
    last = min(nptabs, int(np.trunc(1 + (v2ss - v1abs) / dvabs + 1e-5)))
    return ist, last


def window(v1abs, v2abs, v1s, v2s, dvs, npts, tab, eps=0.01):
    """Shared windowing (e.g. SL296).  Returns padded 1-based C and v1c."""
    v1c = v1abs - dvs
    v2c = v2abs + dvs
    i1 = -1 if v1c < v1s else int(np.trunc((v1c - v1s) / dvs + eps))
    v1c = v1s + dvs * (i1 - 1)
    i2 = int(np.trunc((v2c - v1s) / dvs + eps))
    nptc = i2 - i1 + 3
    if nptc > npts:
        nptc = npts + 4
    c = np.zeros(nptc + 3)  # 1-based with 2 extra on top
    for j in range(1, nptc + 1):
        i = i1 + (j - 1)
        if 1 <= i <= npts:
            c[j] = tab[i - 1]
    return c, v1c, dvs, nptc


def continuum_ref(wn, dvset, pave, tave, wk, wbroad, nmol,
                  xself=1., xfrgn=1., xco2c=1., xo3cn=1., xo2cn=1.,
                  xn2cn=1., xrayl=1.):
    """Returns dict species -> od[nwn] following modm.f90:200-247."""
    t = loader.mt_ckd()
    wn = np.asarray(wn, np.float64)
    nwn = len(wn)
    v1, v2 = wn[0], wn[-1]
    dvabs = 1.0
    v1abs = float(int(v1) - 3.0)
    v2abs = float(int(v2 + 3.5))
    nptabs = int((v2abs - v1abs) / dvabs + 1.5)
    xkt = tave / 1.4387752

    wk = np.array(wk, np.float64)
    if nmol < 22:
        wk[21] = wbroad
    wtot = wbroad + wk[:nmol].sum()
    x_h2o = wk[0] / wtot
    x_o2 = wk[6] / wtot
    x_n2 = 1.0 - x_h2o - x_o2
    wn2 = x_n2 * wtot
    rhoave = (pave / 1013.0) * (296.0 / tave)
    amagat = (pave / 1013.0) * (273.0 / tave)

    def to_user(absrb, rayl=False):
        oc = np.zeros(nwn)
        if dvset != 0:
            xint(v1abs, dvabs, np.concatenate([[0], absrb, [0, 0]]), 1.0,
                 v1, dvset, oc, 1, nwn)
        else:
            for iw in range(nwn):
                tmp = np.zeros(1)
                xint(v1abs, dvabs, np.concatenate([[0], absrb, [0, 0]]), 1.0,
                     wn[iw], 1.0, tmp, 1, 1)
                oc[iw] = tmp[0]
        if rayl:
            return oc * wn / 1.0e4
        return oc * np.array([radfn(w, xkt) for w in wn])

    out = {}

    # --- H2O ---
    absrb = np.zeros(nptabs)
    if v2 > -20 and v1 < 20000 and xself > 0:
        s296, v1c, dvc, nptc = window(v1abs, v2abs, t["h2o_self_296_v1"],
                                      t["h2o_self_296_v2"], t["h2o_self_296_dv"],
                                      int(t["h2o_self_296_npt"]), t["h2o_self_296"])
        s260, *_ = window(v1abs, v2abs, t["h2o_self_260_v1"], t["h2o_self_260_v2"],
                          t["h2o_self_260_dv"], int(t["h2o_self_260_npt"]),
                          t["h2o_self_260"])
        tfac = (tave - 296.0) / (260.0 - 296.0)
        rself = x_h2o * rhoave * 1e-20 * xself
        cself = np.zeros_like(s296)
        for j in range(1, nptc + 1):
            sh2o = s296[j] * (s260[j] / s296[j]) ** tfac if s296[j] > 0 else 0.0
            cself[j] = wk[0] * sh2o * rself
        ist, last = pre_xint(t["h2o_self_296_v1"], t["h2o_self_296_v2"],
                             v1abs, dvabs, nptabs)
        xint(v1c, dvc, cself, 1.0, v1abs, dvabs, absrb, ist, last)
    if v2 > -20 and v1 < 20000 and xfrgn > 0:
        fh, v1c, dvc, nptc = window(v1abs, v2abs, t["h2o_frgn_296_v1"],
                                    t["h2o_frgn_296_v2"], t["h2o_frgn_296_dv"],
                                    int(t["h2o_frgn_296_npt"]), t["h2o_frgn_296"])
        rfrgn = (1.0 - x_h2o) * rhoave * 1e-20 * xfrgn
        xfac_rhu = t["xfac_rhu"]
        c = np.zeros_like(fh)
        for j in range(1, nptc + 1):
            vj = v1c + dvc * (j - 1)
            if vj <= 600.0:
                jfac = int(np.trunc((vj + 10.0) / 10.0 + 1e-5))
                fscal = xfac_rhu[jfac + 1]
            else:
                f0, v0f1, hwsq1, beta1 = 0.06, 255.67, 240.0**2, 57.83
                c_1, n_1, c_2, beta2, n_2 = -0.42, 8, 0.3, 630.0, 8
                vf1 = ((vj - v0f1) / beta1) ** n_1
                vmf1 = ((vj + v0f1) / beta1) ** n_1
                vf2 = (vj / beta2) ** n_2
                fscal = 1.0 + (f0 + c_1 * (hwsq1 / ((vj - v0f1)**2 + hwsq1 + vf1)
                                           + hwsq1 / ((vj + v0f1)**2 + hwsq1 + vmf1))) \
                    / (1.0 + c_2 * vf2)
            c[j] = wk[0] * fh[j] * fscal * rfrgn
        ist, last = pre_xint(t["h2o_frgn_296_v1"], t["h2o_frgn_296_v2"],
                             v1abs, dvabs, nptabs)
        xint(v1c, dvc, c, 1.0, v1abs, dvabs, absrb, ist, last)
    out["h2o"] = to_user(absrb)

    # --- CO2 ---
    absrb = np.zeros(nptabs)
    if v2 > -20 and v1 < 10000 and xco2c > 0:
        wco2 = wk[1] * rhoave * 1e-20 * xco2c
        trat = tave / float(t["co2_t_eff"])
        tdep = t["co2_tdep_bandhead"]
        fco2_tab = t["co2_frgn"]
        v1s = t["co2_frgn_v1"]
        v2s = t["co2_frgn_v2"]
        dvs = t["co2_frgn_dv"]
        npts = int(t["co2_frgn_npt"])
        v1c = v1abs - dvs
        v2c = v2abs + dvs
        i1 = -1 if v1c < v1s else int(np.trunc((v1c - v1s) / dvs + 0.01))
        v1c = v1s + dvs * (i1 - 1)
        i2 = int(np.trunc((v2c - v1s) / dvs + 0.01))
        nptc = i2 - i1 + 3
        if nptc > npts:
            nptc = npts + 4
        c = np.zeros(nptc + 3)
        for j in range(1, nptc + 1):
            i = i1 + (j - 1)
            if 1 <= i <= npts:
                tcor = trat ** tdep[i - 1196] if 1196 <= i <= 1220 else 1.0
                c[j] = tcor * fco2_tab[i - 1]
        xfacco2 = t["xfac_co2"]
        for j in range(1, nptc + 1):
            vj = v1c + dvs * (j - 1)
            cfac = 1.0
            if 2000.0 <= vj <= 2998.0:
                jfac = int(np.trunc((vj - 1998.0) / 2.0 + 1e-5))
                cfac = xfacco2[jfac - 1]
            c[j] = cfac * c[j] * wco2
        ist, last = pre_xint(v1s, v2s, v1abs, dvabs, nptabs)
        xint(v1c, dvs, c, 1.0, v1abs, dvabs, absrb, ist, last)
    out["co2"] = to_user(absrb)

    # --- O2 (fundamental only — enough for the IR test window) ---
    absrb = np.zeros(nptabs)
    if v2 > 1340.0 and v1 < 1850.0 and xo2cn > 0:
        xo2, v1c, dvc, nptc = window(v1abs, v2abs, t["o2_fund_v1"],
                                     t["o2_fund_v2"], t["o2_fund_dv"],
                                     int(t["o2_fund_npt"]), t["o2_fund_0"])
        xo2t, *_ = window(v1abs, v2abs, t["o2_fund_v1"], t["o2_fund_v2"],
                          t["o2_fund_dv"], int(t["o2_fund_npt"]), t["o2_fund_1"])
        tau_fac = xo2cn * wk[6] * 1e-20 * amagat
        xktfac = (1.0 / 296.0) - (1.0 / tave)
        factor = 1e20 / 2.68675e19
        c = np.zeros_like(xo2)
        for j in range(1, nptc + 1):
            vj = v1c + dvc * (j - 1)
            if xo2[j] != 0.0 or True:
                c[j] = tau_fac * factor * xo2[j] * np.exp(xo2t[j] * xktfac) / vj
        ist, last = pre_xint(t["o2_fund_v1"], t["o2_fund_v2"], v1abs, dvabs,
                             nptabs)
        xint(v1c, dvc, c, 1.0, v1abs, dvabs, absrb, ist, last)
    out["o2"] = to_user(absrb)

    # --- N2 (rototranslational band) ---
    absrb = np.zeros(nptabs)
    if v2 > -10.0 and v1 < 350.0 and xn2cn > 0:
        c296, v1c, dvc, nptc = window(v1abs, v2abs, t["n2_rt_296_v1"],
                                      t["n2_rt_296_v2"], t["n2_rt_296_dv"],
                                      int(t["n2_rt_296_npt"]), t["n2_rt_296_0"])
        sf296, *_ = window(v1abs, v2abs, t["n2_rt_296_v1"], t["n2_rt_296_v2"],
                           t["n2_rt_296_dv"], int(t["n2_rt_296_npt"]),
                           t["n2_rt_296_1"])
        c220, *_ = window(v1abs, v2abs, t["n2_rt_220_v1"], t["n2_rt_220_v2"],
                          t["n2_rt_220_dv"], int(t["n2_rt_220_npt"]),
                          t["n2_rt_220_0"])
        sf220, *_ = window(v1abs, v2abs, t["n2_rt_220_v1"], t["n2_rt_220_v2"],
                           t["n2_rt_220_dv"], int(t["n2_rt_220_npt"]),
                           t["n2_rt_220_1"])
        tfac = (tave - 296.0) / (220.0 - 296.0)
        tau_fac = xn2cn * (wn2 / 2.68675e19) * amagat
        c = np.zeros_like(c296)
        for j in range(1, nptc + 1):
            if c296[j] == 0.0:
                continue
            cj = c296[j] * (c220[j] / c296[j]) ** tfac
            sf_t = sf296[j] * (sf220[j] / sf296[j]) ** tfac
            fo2 = (sf_t - 1.0) * (0.79 / 0.21)
            c[j] = tau_fac * cj * (x_n2 + fo2 * x_o2 + 1.0 * x_h2o)
        ist, last = pre_xint(t["n2_rt_296_v1"], t["n2_rt_296_v2"], v1abs,
                             dvabs, nptabs)
        xint(v1c, dvc, c, 1.0, v1abs, dvabs, absrb, ist, last)
    out["n2"] = to_user(absrb)

    # --- Rayleigh ---
    absrb = np.zeros(nptabs)
    if v2 >= 820.0 and xrayl > 0:
        conv = xrayl * 1e-20 / (2.68675e-1 * 1e5)
        for i in range(nptabs):
            v = v1abs + i * dvabs
            xv = v / 1e4
            ray = (xv**3 / (9.38076e2 - 10.8426 * xv**2)) * wtot * conv
            absrb[i] = ray * xv / radfn(v, xkt)
    out["rayleigh"] = to_user(absrb, rayl=True)
    return out
