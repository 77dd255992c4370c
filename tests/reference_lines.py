"""Direct NumPy transliteration of LINES + LSF_LORTZ/LSF_SDVOIGT
(modm.f90:277-831) used as the line-engine test oracle.

Operates on the *grouped* (unresolved) per-molecule arrays so it exercises
the same J/JJ walk as the Fortran, independently of lines.resolve().
"""

import numpy as np

from monortm_tpu import constants as cst
from monortm_tpu.data import loader
from tests.test_voigt import sdvoigt_ref

TEMPLC = [200.0, 250.0, 296.0, 340.0]
DELTNUC = 25.0


def xlorentz(z):
    return 1.0 / (np.pi * (1.0 + z * z))


def lsf_sdvoigt(xf, rp, rp2, aip, bip, hwhm, wn, xnu, ad, mol, sdep):
    diff = (wn + xnu) - DELTNUC
    sls = 0.0
    chi = 1.0
    K = lambda d: sdvoigt_ref(d, hwhm, ad, sdep)
    if mol not in (2, 7):
        if xf in (-1, -3, -5):
            xl1 = K(wn - xnu)
            xl3 = K(DELTNUC)
            y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
            y1p = 1.0 + aip / hwhm * rp * DELTNUC + bip * rp2
            if diff <= 0.0:
                xl2 = K(wn + xnu)
                y2 = 1.0 - aip / hwhm * rp * (wn + xnu) + bip * rp2
                y2p = 1.0 - aip / hwhm * rp * DELTNUC + bip * rp2
                sls = y1 * xl1 - y1p * xl3 + y2 * xl2 - y2p * xl3
            else:
                sls = y1 * xl1 - y1p * xl3
        else:
            xl1 = K(wn - xnu)
            xl3 = K(DELTNUC)
            if diff <= 0.0:
                xl2 = K(wn + xnu)
                sls = xl1 + xl2 - 2.0 * xl3
            else:
                sls = xl1 - xl3
    else:
        if abs(wn - xnu) <= DELTNUC and xf not in (-1, -3, -5):
            xl1 = K(wn - xnu)
            if mol == 7:
                if diff <= 0.0:
                    sls = xl1 + K(wn + xnu)
                else:
                    sls = xl1
            else:
                xl3 = K(DELTNUC) * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                sls = chi * (xl1 - xl3)
        else:
            if mol == 7:
                if xf in (-1, -3, -5):
                    xl1 = K(wn - xnu)
                    xl2 = K(wn + xnu)
                    if xf == -1:
                        y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
                        y2 = 1.0 - aip / hwhm * rp * (wn + xnu) + bip * rp2
                        sls = xl1 * y1 + xl2 * y2
                    else:
                        sls = xl1 + xl2
            else:
                # CO2: condition (XF==-1 or XF==-3 or XF /= -5) is always
                # true (modm.f90:659)
                xl1 = K(wn - xnu)
                xl3 = K(DELTNUC)
                if xf in (-1, -5):
                    y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
                    xp4 = xl3 * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                    yp1 = (y1 - 1.0) * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                    sls = chi * (xl1 * y1 - xp4 - xl3 * yp1)
                else:
                    xp4 = xl3 * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                    sls = chi * (xl1 - xp4)
    return sls


def lsf_lortz(xf, rp, rp2, aip, bip, hwhm, wn, xnu, mol):
    diff = (wn + xnu) - DELTNUC
    sls = 0.0
    chi = 1.0
    XL = lambda d: xlorentz(d / hwhm)
    if mol not in (2, 7):
        if xf in (-1, -3, -5):
            xl1 = XL(wn - xnu)
            xl3 = XL(DELTNUC)
            y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
            y1p = 1.0 + aip / hwhm * rp * DELTNUC + bip * rp2
            if diff <= 0.0:
                xl2 = XL(wn + xnu)
                y2 = 1.0 - aip / hwhm * rp * (wn + xnu) + bip * rp2
                y2p = 1.0 - aip / hwhm * rp * DELTNUC + bip * rp2
                sls = (y1 * xl1 - y1p * xl3 + y2 * xl2 - y2p * xl3) / hwhm
            else:
                sls = (y1 * xl1 - y1p * xl3) / hwhm
        else:
            xl1 = XL(wn - xnu)
            xl3 = XL(DELTNUC)
            if diff <= 0.0:
                sls = (xl1 + XL(wn + xnu) - 2.0 * xl3) / hwhm
            else:
                sls = (xl1 - xl3) / hwhm
    else:
        if abs(wn - xnu) <= DELTNUC and xf not in (-1, -3, -5):
            xl1 = XL(wn - xnu)
            if mol == 7:
                if diff <= 0.0:
                    sls = (xl1 + XL(wn + xnu)) / hwhm
                else:
                    sls = xl1 / hwhm
            else:
                xl3 = XL(DELTNUC) * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                sls = chi * (xl1 - xl3) / hwhm
        else:
            if mol == 7:
                if xf in (-1, -3, -5):
                    xl1 = XL(wn - xnu)
                    xl2 = XL(wn + xnu)
                    if xf == -1:
                        y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
                        y2 = 1.0 - aip / hwhm * rp * (wn + xnu) + bip * rp2
                        sls = (xl1 * y1 + xl2 * y2) / hwhm
                    else:
                        sls = (xl1 + xl2) / hwhm
            else:
                if xf in (-1, -3, -5):
                    xl1 = XL(wn - xnu)
                    xl3 = XL(DELTNUC)
                    if xf in (-1, -5):
                        y1 = 1.0 + aip / hwhm * rp * (wn - xnu) + bip * rp2
                        xp4 = xl3 * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                        yp1 = (y1 - 1.0) * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                        sls = chi * (xl1 * y1 - xp4 - xl3 * yp1) / hwhm
                    else:
                        xp4 = xl3 * (2.0 - (wn - xnu) ** 2 / DELTNUC**2)
                        sls = chi * (xl1 - xp4) / hwhm
    return sls


def lines_ref(g, wn, t, p, wk, wbrod, scor, sclcpl=1.0, sclhw=1.0,
              y0res=0.0, ibrd=0):
    """One wavenumber, one layer -> o_by_mol[39] (modm.f90:277-440)."""
    smass = loader.isotopes()["smass"]
    nmol = 39
    wtot = np.sum(wk[:nmol]) + wbrod
    rp = p / 1013.25
    rp2 = rp * rp
    ilc = 3
    for il in range(1, 4):
        if t < TEMPLC[il]:
            ilc = il
            break
    rectlc = 1.0 / (TEMPLC[ilc] - TEMPLC[ilc - 1])
    tmpdif = t - TEMPLC[ilc - 1]
    rt = t / cst.T0
    xn0 = (1013.25 / (cst.BOLTZ * cst.T0)) * 1e3
    xn = (p / (cst.BOLTZ * t)) * 1e3
    rhorat = xn / xn0
    rho_molec = rhorat * wk[:7] / wtot

    o_by_mol = np.zeros(nmol)
    for i in range(1, nmol + 1):
        w_species = wk[i - 1]
        if w_species == 0.0:
            continue
        nb = int(g.nblm[i - 1])
        if nb == 0:
            continue
        xnu0 = g.xnu0[i]
        s0 = g.s0[i]
        alpf = g.alpf[i]
        alps = g.alps[i]
        e = g.e[i]
        x = g.x[i]
        deltnu = g.deltnu[i]
        xg = g.xg[i]
        iso = g.iso[i]
        rmol = g.rmol[i]
        sdep = g.sdep[i]

        sf = 0.0
        aip = bip = 0.0
        j = 0
        while j < nb:
            jj = j
            if xg[j] in (-1.0, -3.0, -5.0):
                jj = j + 1
                A = np.array([xnu0[jj], alpf[jj], rmol[jj], x[jj]]) \
                    if jj < nb else np.zeros(4)
                B = np.array([s0[jj], e[jj], alps[jj], deltnu[jj]]) \
                    if jj < nb else np.zeros(4)
                if xg[j] == -5.0 and j >= 1 and xg[j - 1] == -5.0:
                    jj += 1
                    if jj < nb:
                        rho_for = (rhorat - rho_molec[i - 1]) / rhorat
                        rho_sel = rho_molec[i - 1] / rhorat
                        A = rho_for * A + rho_sel * np.array(
                            [xnu0[jj], alpf[jj], rmol[jj], x[jj]])
                        B = rho_for * B + rho_sel * np.array(
                            [s0[jj], e[jj], alps[jj], deltnu[jj]])
                aip = A[ilc - 1] + (A[ilc] - A[ilc - 1]) * rectlc * tmpdif
                bip = B[ilc - 1] + (B[ilc] - B[ilc - 1]) * rectlc * tmpdif
                if xg[j] == -1.0:
                    aip = aip * sclcpl + y0res
                    bip = bip * sclcpl + y0res
                if xg[j] == -3.0:
                    aip *= sclhw
                    bip *= sclhw

            s0_adj = s0[j] * (xnu0[j] * (1.0 - np.exp(-cst.RADCT * xnu0[j]
                                                      / cst.T0)))
            xnu = xnu0[j] + deltnu[j] * (xn / xn0)
            if i <= 7 and ibrd != 0:
                # SBS shift adjustment (modm.f90:377-380)
                xnu = xnu + np.sum(rho_molec * g.brd_flg[i][j]
                                   * (g.brd_shft[i][j] - deltnu[j]))

            if abs(wn - xnu) > DELTNUC and i != 7:
                j = jj + 1
                continue

            xipsf = scor[i - 1, int(np.clip(iso[j], 1, 9)) - 1]
            s = s0_adj * (np.exp(-cst.RADCT * e[j] / t)
                          / np.exp(-cst.RADCT * e[j] / cst.T0)) * xipsf
            stild = s * (1.0 + np.exp(-cst.RADCT * xnu / t)) / (
                xnu * (1.0 - np.exp(-cst.RADCT * xnu / cst.T0)))
            xtild = x[j]
            # HALFWHM_C (modm.f90:845).  The Fortran indexes rho_molec(mol)
            # which is only defined for mol<=7 (UB beyond); both this oracle
            # and the device engine use rho = rhorat*wk(mol)/wtot for all
            # molecules, which coincides with the reference for mol<=7.
            rho_m = rhorat * wk[i - 1] / wtot
            alfa0i = alpf[j] * rt**xtild
            hwhmsi = alps[j] * rt**xtild
            hwhm_c = alfa0i * (rhorat - rho_m) + hwhmsi * rho_m
            if i <= 7 and ibrd != 0 and np.sum(g.brd_flg[i][j]) > 0:
                # HALFWHM_C SBS branch (modm.f90:848-856)
                flg = g.brd_flg[i][j]
                tmpcor = rt ** g.brd_tmp[i][j]
                alfa_tmp = g.brd_hw[i][j] * tmpcor
                alfsum = np.sum(rho_molec * flg * alfa_tmp)
                hwhm_c = (rhorat - np.sum(rho_molec * flg)) * alfa0i \
                    + alfsum
                if flg[i - 1] == 0:
                    hwhm_c = hwhm_c + rho_m * (hwhmsi - alfa0i)

            m = smass[i - 1, int(np.clip(iso[j], 1, 9)) - 1]
            if m <= 0:
                m = smass[i - 1, 0]
            hwhm_d = (xnu / cst.CLIGHT) * np.sqrt(
                2.0 * np.log(2.0) * cst.BOLTZ * t * cst.AVOGAD / m)

            if xg[j] == -3.0:
                hwhm_c = hwhm_c * (1.0 - aip * rp - bip * rp2)
            zeta = hwhm_c / (hwhm_c + hwhm_d)
            ilshp = 1
            if abs(wn - xnu) > 100.0 * hwhm_d or zeta > 0.99:
                ilshp = 0
            if ilshp == 0:
                sls = lsf_lortz(xg[j], rp, rp2, aip, bip, hwhm_c, wn, xnu, i)
            else:
                sls = lsf_sdvoigt(xg[j], rp, rp2, aip, bip, hwhm_c, wn, xnu,
                                  hwhm_d, i, sdep[j])
            sf += stild * sls
            j = jj + 1

        rft = wn * np.tanh(cst.RADCT * wn / (2.0 * t))
        o_by_mol[i - 1] = rft * w_species * sf
    return o_by_mol
