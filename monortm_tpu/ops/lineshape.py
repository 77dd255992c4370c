"""Line-by-line optical-depth engine (dense, branchless, batched).

Replicates the physics of LINES + LSF_LORTZ/LSF_SDVOIGT (modm.f90:277-831)
as data-parallel tensor ops over [layer, wavenumber, line] blocks:

  * line-coupling Y/G temperature interpolation over TEMPLC={200,250,296,340}
    with self/foreign density mixing for XG=-5 (modm.f90:294-353)
  * pressure-shifted line centres (modm.f90:375)
  * the +/- oscillation mirror (VVW term for wn+nu <= 25 cm^-1), the
    25 cm^-1 pedestal subtraction, CO2 pedestal/chi handling, O2
    line-coupling exemptions — assembled as masked selects
  * Lorentz switch when |wn-nu| > 100*aD or zeta > 0.99 (modm.f90:427)
  * per-molecule attribution via a one-hot line->molecule matmul (MXU)

Precision: in f32 mode, wavenumber - line-centre deltas use two-float
(hi/lo) splits prepared on the host so the near-centre cancellation keeps
~f64 accuracy; everything else is plain f32.  In f64 mode (CPU validation)
the computation follows the reference arithmetic directly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from monortm_tpu import constants as cst
from monortm_tpu.lines import PackedCatalog
from monortm_tpu.ops.voigt import sdvoigt, voigt, xlorentz

DELTNU_CUT = 25.0
TEMPLC = (200.0, 250.0, 296.0, 340.0)
MOL_CO2 = 2
MOL_O2 = 7


@dataclass(frozen=True)
class LineConfig:
    """Driver knobs hardcoded in monortm.f90:285-289.

    chi_fn: optional CO2 sub-Lorentzian form-factor hook — the TPU-native
    counterpart of chi_fn (modm.f90:1253-1290, currently identity in the
    reference: the commented-out polynomial/exponential form is dead code
    behind `chi = 1.`).  When set, it receives the signed distance from
    the (pressure-shifted) line centre, deltXNU = wn - nu [..., W, N],
    and returns a multiplicative factor applied to every CO2 SLS branch
    (the reference multiplies CHI into each CO2 pedestal expression,
    modm.f90:507,549,558).  Must be a traceable jnp function; None keeps
    the reference's identity behaviour with zero cost."""
    sclcpl: float = 1.0
    sclhw: float = 1.0
    y0res: float = 0.0
    ibrd: int = 0
    chi_fn: object = None


def catalog_to_host(cat: PackedCatalog, dtype=jnp.float32) -> dict:
    """Packed catalog columns as host numpy arrays with the device dtype
    layout.  Kept on host so tile/plan building never round-trips through
    the device (device->host reads are expensive on tunneled backends)."""
    npdt = np.dtype(jnp.dtype(dtype).name)
    f = lambda a: np.asarray(a, npdt)
    d = {
        "mol": np.asarray(cat.mol, np.int32),
        "iso_flat": np.asarray(cat.iso_flat, np.int32),
        "s0adj": f(cat.s0adj),
        "e": f(cat.e),
        "alpf": f(cat.alpf),
        "alps": f(cat.alps),
        "tdep": f(cat.tdep),
        "pshift": f(cat.pshift),
        "sdep": f(cat.sdep),
        "mass": f(cat.mass),
        "xg": np.asarray(cat.xg, np.int32),
        "a1": f(cat.a1), "b1": f(cat.b1), "a2": f(cat.a2), "b2": f(cat.b2),
        "self_mix": np.asarray(cat.self_mix),
        "valid": np.asarray(cat.valid),
        "brd_flg": np.asarray(cat.brd_flg, np.int32),
        "brd_hw": f(cat.brd_hw),
        "brd_tmp": f(cat.brd_tmp),
        "brd_shft": f(cat.brd_shft),
    }
    if dtype == jnp.float64:
        d["nu0"] = np.asarray(cat.nu0, np.float64)
    else:
        d["nu0_hi"] = np.asarray(cat.nu0_hi, npdt)
        d["nu0_lo"] = np.asarray(cat.nu0_lo, npdt)
    return d


def catalog_to_device(cat: PackedCatalog, dtype=jnp.float32) -> dict:
    """Upload packed catalog columns with the right device dtypes."""
    return {k: jnp.asarray(v) for k, v in catalog_to_host(cat, dtype).items()}


def _coupling_coeffs(cat, t, rhorat, rho_mol, cfg: LineConfig):
    """AIP/BIP per (layer, line): TEMPLC interval interpolation + -5 mixing
    + SCLCPL/SCLHW scaling (modm.f90:305-368).

    t: [...], rhorat: [...], rho_mol: [..., N].  Returns (aip, bip) [..., N].
    """
    t = t[..., None]
    templc = jnp.asarray(TEMPLC, t.dtype)
    # ILC: first interval with T < TEMPLC(ilc+1), clamped to 3 (1-based)
    ilc = jnp.clip(jnp.searchsorted(templc[1:], t[..., 0], side="right"),
                   0, 2)[..., None]                    # 0-based interval
    rectlc = 1.0 / (templc[ilc + 1] - templc[ilc])
    tmpdif = t - templc[ilc]

    rho_for = (rhorat[..., None] - rho_mol) / rhorat[..., None]
    rho_sel = rho_mol / rhorat[..., None]
    mix = cat["self_mix"]

    def interp(coef):
        # coef: [N, 4] static; ilc has 3 possible values, so the interval
        # gather is two where-chains over the 4 static columns — peak
        # memory stays [..., N] (a take_along_axis over a broadcast
        # [..., N, 4] was the largest allocation of the 80k-wn x
        # 200-layer envelope: 4x this op's footprint)
        c0, c1, c2, c3 = (coef[..., k] for k in range(4))
        lo = jnp.where(ilc == 0, c0, jnp.where(ilc == 1, c1, c2))
        hi = jnp.where(ilc == 0, c1, jnp.where(ilc == 1, c2, c3))
        return lo + (hi - lo) * rectlc[..., 0:1] * tmpdif[..., 0:1]

    # interp is linear in the coefficients, so the -5 self/foreign
    # density mixing commutes with the temperature interpolation
    a1i, b1i = interp(cat["a1"]), interp(cat["b1"])
    aip = jnp.where(mix, rho_for * a1i + rho_sel * interp(cat["a2"]), a1i)
    bip = jnp.where(mix, rho_for * b1i + rho_sel * interp(cat["b2"]), b1i)

    xg = cat["xg"]
    aip = jnp.where(xg == -1, aip * cfg.sclcpl + cfg.y0res, aip)
    bip = jnp.where(xg == -1, bip * cfg.sclcpl + cfg.y0res, bip)
    aip = jnp.where(xg == -3, aip * cfg.sclhw, aip)
    bip = jnp.where(xg == -3, bip * cfg.sclhw, bip)
    return aip, bip


def line_params(cat: dict, p, t, wk, wbrod, scor_flat, cfg: LineConfig,
                dtype=jnp.float32) -> dict:
    """All O(layer x line) quantities of the LINES prologue.

    INITI + LINES preamble + INTENS + HALFWHM_C/_D (modm.f90:301-314,
    375-380, 833-865, 442-454) including line coupling (AIP/BIP) and the
    IBRD=1 species-specific-broadening adjustments — shared by the XLA
    engine (`line_od_block`) and the Pallas fast path's `precompute`, so
    the two paths cannot drift.

    p,t: [...] layer pressure (hPa) / temperature (K); wk: [..., 39];
    wbrod: [...]; scor_flat: [..., 351].  Returns a dict of [..., N]
    arrays plus the per-layer scalars (rhorat, rp, rp2, wtot).
    """
    t_ = jnp.asarray(t, dtype)
    p_ = jnp.asarray(p, dtype)
    wk = jnp.asarray(wk, dtype)
    wbrod_ = jnp.asarray(wbrod, dtype)

    # INITI (modm.f90:868-883) + LINES preamble (modm.f90:301-314)
    xn0 = (1013.25 / (cst.BOLTZ * cst.T0)) * 1.0e3
    xn = (p_ / (cst.BOLTZ * t_)) * 1.0e3
    rhorat = xn / xn0
    wtot = jnp.sum(wk, axis=-1) + wbrod_
    rp = p_ / 1013.25
    rp2 = rp * rp
    rt = t_ / cst.T0

    mol = cat["mol"]
    w_line = wk[..., mol - 1]                                 # [..., N]
    rho_mol = rhorat[..., None] * w_line / wtot[..., None]

    aip, bip = _coupling_coeffs(cat, t_, rhorat, rho_mol, cfg)

    # pressure-shifted centre (modm.f90:375) with the optional
    # species-specific-broadening shift adjustment (modm.f90:377-380)
    shift = cat["pshift"] * rhorat[..., None]                 # [..., N]
    if cfg.ibrd != 0:
        rho7 = rhorat[..., None] * wk[..., :7] / wtot[..., None]  # [..., 7]
        brd_on = (cat["mol"] <= 7)[..., None].astype(shift.dtype)
        dshift = jnp.einsum("...j,nj->...n", rho7,
                            jnp.asarray(cat["brd_flg"], shift.dtype)
                            * (cat["brd_shft"] - cat["pshift"][:, None]))
        shift = shift + brd_on[..., 0] * dshift
    if dtype == jnp.float64:
        xnu = cat["nu0"] + shift
    else:
        xnu = cat["nu0_hi"].astype(dtype) + (cat["nu0_lo"].astype(dtype) + shift)

    # intensity (INTENS, modm.f90:860-865)
    scor_line = scor_flat[..., cat["iso_flat"]]               # [..., N]
    s = cat["s0adj"] * jnp.exp(-cst.RADCT * cat["e"]
                               * (1.0 / t_[..., None] - 1.0 / cst.T0)) * scor_line
    stild = s * (1.0 + jnp.exp(-cst.RADCT * xnu / t_[..., None])) / (
        xnu * (-jnp.expm1(-cst.RADCT * xnu / cst.T0)))

    # Lorentz halfwidth (HALFWHM_C, modm.f90:833-857; ibrd=0 path)
    rtx = rt[..., None] ** cat["tdep"]
    alfa0 = cat["alpf"] * rtx
    hwhms = cat["alps"] * rtx
    hwhm_c = alfa0 * (rhorat[..., None] - rho_mol) + hwhms * rho_mol
    if cfg.ibrd != 0:
        rho7 = rhorat[..., None] * wk[..., :7] / wtot[..., None]
        flg = jnp.asarray(cat["brd_flg"], hwhm_c.dtype)        # [N, 7]
        has_brd = (jnp.sum(flg, axis=-1) > 0) & (cat["mol"] <= 7)
        tmpcor = rt[..., None, None] ** cat["brd_tmp"]         # [..., N, 7]
        alfa_tmp = cat["brd_hw"] * tmpcor
        alfsum = jnp.einsum("...j,...nj->...n", rho7, flg * alfa_tmp) \
            if alfa_tmp.ndim > 2 else jnp.einsum("j,nj->n", rho7, flg * alfa_tmp)
        rho_flg = jnp.einsum("...j,nj->...n", rho7, flg)
        hw_brd = (rhorat[..., None] - rho_flg) * alfa0 + alfsum
        own_flg = jnp.take_along_axis(
            jnp.asarray(cat["brd_flg"]),
            jnp.clip(cat["mol"] - 1, 0, 6)[:, None], axis=1)[:, 0]
        hw_brd = jnp.where(own_flg == 0,
                           hw_brd + rho_mol * (hwhms - alfa0), hw_brd)
        hwhm_c = jnp.where(has_brd, hw_brd, hwhm_c)
    hwhm_c = jnp.where(cat["xg"] == -3,
                       hwhm_c * (1.0 - aip * rp[..., None] - bip * rp2[..., None]),
                       hwhm_c)

    # Doppler halfwidth (HALFWHM_D, modm.f90:442-454)
    hwhm_d = (xnu / cst.CLIGHT) * jnp.sqrt(
        2.0 * cst.LN2 * cst.BOLTZ * t_[..., None] * cst.AVOGAD / cat["mass"])

    return {"shift": shift, "xnu": xnu, "stild": stild, "hwhm_c": hwhm_c,
            "hwhm_d": hwhm_d, "aip": aip, "bip": bip,
            "rhorat": rhorat, "rp": rp, "rp2": rp2, "wtot": wtot}


def line_od_block(cat: dict, wn, wn_split, p, t, wk, wbrod, scor_flat,
                  cfg: LineConfig, n_mol: int, dtype=jnp.float32):
    """Per-molecule line optical depth for one block.

    cat:   device catalog (N lines)
    wn:    [W] wavenumbers (dtype)
    wn_split: (wn_hi, wn_lo) two-float split, or None in f64 mode
    p,t:   [...] layer pressure (hPa) / temperature (K)
    wk:    [..., 39] molecular columns; wbrod: [...]
    scor_flat: [..., 351] TIPS ratios flattened (39*9)
    returns od_by_mol [..., W, n_mol]  (includes the RFT radiation term and
    column amounts; modm.f90:436-438)
    """
    t_ = jnp.asarray(t, dtype)
    wk = jnp.asarray(wk, dtype)

    lp = line_params(cat, p, t, wk, wbrod, scor_flat, cfg, dtype)
    shift, xnu, stild = lp["shift"], lp["xnu"], lp["stild"]
    hwhm_c, hwhm_d = lp["hwhm_c"], lp["hwhm_d"]
    aip, bip = lp["aip"], lp["bip"]
    rp, rp2 = lp["rp"], lp["rp2"]
    mol = cat["mol"]

    if dtype == jnp.float64:
        d1 = wn[..., :, None] - xnu[..., None, :]             # [..., W, N]
    else:
        wn_hi, wn_lo = wn_split
        d0 = ((wn_hi[..., :, None] - cat["nu0_hi"][..., None, :])
              + (wn_lo[..., :, None] - cat["nu0_lo"][..., None, :]))
        d1 = d0 - shift[..., None, :]
    dsum = wn[..., :, None] + xnu[..., None, :]               # wn + nu

    # line-shape selection (modm.f90:419-431)
    zeta = hwhm_c / (hwhm_c + hwhm_d)
    use_lorentz = (jnp.abs(d1) > 100.0 * hwhm_d[..., None, :]) | \
        (zeta[..., None, :] > 0.99)

    hw = hwhm_c[..., None, :]
    ad = hwhm_d[..., None, :]
    sdep = cat["sdep"][None, :]

    def K(dd):
        dv = sdvoigt(dd, hw, ad, jnp.broadcast_to(sdep, dd.shape))
        dl = xlorentz(dd / hw) / hw
        return jnp.where(use_lorentz, dl, dv)

    k1 = K(d1)
    k2 = K(dsum)
    # K3 (pedestal at 25 cm^-1) is wavenumber-independent per line —
    # evaluate both kernels once per (layer, line) and select per wn
    d25 = jnp.asarray(DELTNU_CUT, dtype)
    k3_v = sdvoigt(jnp.broadcast_to(d25, hwhm_c.shape), hwhm_c, hwhm_d,
                   jnp.broadcast_to(cat["sdep"], hwhm_c.shape))
    k3_l = xlorentz(d25 / hwhm_c) / hwhm_c
    k3 = jnp.where(use_lorentz, k3_l[..., None, :], k3_v[..., None, :])

    # line-coupling Y factors (per wn where needed)
    inv_hw = 1.0 / hw
    aip_w = aip[..., None, :]
    bip_w = bip[..., None, :]
    rp_w = rp[..., None, None]
    rp2_w = rp2[..., None, None]
    y1 = 1.0 + aip_w * inv_hw * rp_w * d1 + bip_w * rp2_w
    y2 = 1.0 - aip_w * inv_hw * rp_w * dsum + bip_w * rp2_w
    y1p = 1.0 + aip_w * inv_hw * rp_w * DELTNU_CUT + bip_w * rp2_w
    y2p = 1.0 - aip_w * inv_hw * rp_w * DELTNU_CUT + bip_w * rp2_w

    mirror = (dsum - DELTNU_CUT) <= 0.0
    within = jnp.abs(d1) <= DELTNU_CUT
    ped = 2.0 - (d1 * d1) / (DELTNU_CUT * DELTNU_CUT)

    xg = cat["xg"][None, :]
    has_cpl = (xg == -1) | (xg == -3) | (xg == -5)
    is_o2 = (mol == MOL_O2)[None, :]
    is_co2 = (mol == MOL_CO2)[None, :]
    is_other = ~(is_o2 | is_co2)

    # --- LSF branch trees (identical for SD-Voigt and Lorentz after
    #     normalising K; modm.f90:567-831) ---
    sls_other = jnp.where(
        has_cpl,
        y1 * k1 - y1p * k3 + jnp.where(mirror, y2 * k2 - y2p * k3, 0.0),
        k1 - k3 + jnp.where(mirror, k2 - k3, 0.0))

    sls_o2 = jnp.where(
        has_cpl,
        jnp.where(xg == -1, k1 * y1 + k2 * y2, k1 + k2),
        jnp.where(within, k1 + jnp.where(mirror, k2, 0.0), 0.0))

    xp4 = k3 * ped
    yp1 = (y1 - 1.0) * ped
    sls_co2 = jnp.where(
        has_cpl,
        jnp.where((xg == -1) | (xg == -5),
                  k1 * y1 - xp4 - k3 * yp1,
                  k1 - xp4),
        k1 - xp4)
    if cfg.chi_fn is not None:   # CO2 chi hook (modm.f90:507,549,558)
        sls_co2 = sls_co2 * cfg.chi_fn(d1)

    sls = jnp.where(is_o2, sls_o2, jnp.where(is_co2, sls_co2, sls_other))

    # 25 cm^-1 window cut, applied in LINES before the LSF call for
    # non-O2 molecules (modm.f90:384)
    keep = (within | is_o2) & cat["valid"][None, :]
    contrib = jnp.where(keep, sls, 0.0) * stild[..., None, :]

    # per-molecule attribution: one-hot matmul onto the MXU
    onehot = jax.nn.one_hot(mol - 1, n_mol, dtype=dtype)      # [N, M]
    sf = jnp.einsum("...wn,nm->...wm", contrib, onehot,
                    preferred_element_type=dtype)

    # OD = RFT * W_species * SF (modm.f90:436-438)
    rft = wn * jnp.tanh(cst.RADCT * wn / (2.0 * t_[..., None]))
    wk_m = wk[..., :n_mol]
    return rft[..., :, None] * wk_m[..., None, :] * sf
