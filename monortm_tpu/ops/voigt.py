"""Voigt / speed-dependent Voigt line-shape kernels (branchless, VPU-friendly).

Humlicek (1982) W4 four-region rational approximation of the complex
probability function w(z), replicated with the reference's exact region
boundaries and coefficients:
  W4          -> modm.f90:1100-1130  (regions split at s=15 / s=5.5)
  SD_Humlicek -> modm.f90:1150-1251  (regions split at s=15 / s=6, per
                 Boone et al. 2011; per-point region-4/3 fallback)
  VOIGT       -> modm.f90:900-962
  SDVOIGT     -> modm.f90:965-1087   (Boone et al. 2011 two-point form)
  XLORENTZ    -> modm.f90:888-895

Complex arithmetic is expanded into explicit (re, im) pairs: TPU backends
do not carry native complex types, and the same real-pair formulation drops
straight into the Pallas line-sum kernel.  All control flow is data-parallel
`jnp.where` selection over guarded inputs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from monortm_tpu import constants as c

_SQRT_LN2 = c.SQRT_LN2
_RSQRT_PI_LN2 = (c.LN2 / c.PI) ** 0.5   # sqrt(ln2/pi)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _w_region1(tr, ti):
    # t*0.5641896/(0.5+t*t)
    ur, ui = _cmul(tr, ti, tr, ti)
    return _cdiv(0.5641896 * tr, 0.5641896 * ti, 0.5 + ur, ui)


def _w_region2(tr, ti):
    # t*(1.410474+u*0.5641896)/(0.75+u*(3.+u))
    ur, ui = _cmul(tr, ti, tr, ti)
    nr, ni = _cmul(tr, ti, 1.410474 + 0.5641896 * ur, 0.5641896 * ui)
    dr, di = _cmul(ur, ui, 3.0 + ur, ui)
    return _cdiv(nr, ni, 0.75 + dr, di)


def _horner(tr, ti, coeffs):
    """p(t) with p = c0 + t(c1 + t(...)); coeffs given highest-order first."""
    pr = jnp.zeros_like(tr) + coeffs[0]
    pi = jnp.zeros_like(tr)
    for a in coeffs[1:]:
        pr, pi = _cmul(pr, pi, tr, ti)
        pr = pr + a
    return pr, pi


def _w_region3(tr, ti):
    nr, ni = _horner(tr, ti, (0.5642236, 3.778987, 11.96482, 20.20933, 16.4955))
    dr, di = _horner(tr, ti, (1.0, 6.699398, 21.69274, 39.27121, 38.82363, 16.4955))
    return _cdiv(nr, ni, dr, di)


def _w_region4(tr, ti):
    ur, ui = _cmul(tr, ti, tr, ti)
    # polynomials in u with alternating signs as written in the reference:
    # num = 36183.31 - u*(3321.9905 - u*(1540.787 - ... - u*0.56419))
    def alt(coeffs):
        pr = jnp.zeros_like(ur) + coeffs[0]
        pi = jnp.zeros_like(ur)
        for a in coeffs[1:]:
            qr, qi = _cmul(ur, ui, pr, pi)
            pr, pi = a - qr, -qi
        return pr, pi

    nr, ni = alt((0.56419, 1.320522, 35.76683, 219.0313, 1540.787,
                  3321.9905, 36183.31))
    dr, di = alt((1.0, 1.841439, 61.57037, 364.2191, 2186.181,
                  9022.228, 24322.84, 32066.6))
    fr, fi = _cdiv(nr, ni, dr, di)
    pr, pi = _cmul(tr, ti, fr, fi)
    # cexp(u) - t*num/den
    eu = jnp.exp(ur)
    return eu * jnp.cos(ui) - pr, eu * jnp.sin(ui) - pi


def _region_real(mask, fn, tr, ti, guard_r, guard_i, gate):
    """Re[fn(t)] where `mask`, guarded elsewhere.

    gate=True wraps the evaluation in an any(mask)-predicated lax.cond so a
    whole VPU block skips the region's polynomials (and, for region 4, its
    exp/cos/sin) when no point lands in it — the far-wing common case.  The
    branch computes over all lanes exactly as the ungated form does, so
    results are bit-identical whenever the region is populated.
    """
    def comp():
        return fn(jnp.where(mask, tr, guard_r), jnp.where(mask, ti, guard_i))[0]

    if gate:
        shape = jnp.broadcast_shapes(jnp.shape(mask), jnp.shape(tr),
                                     jnp.shape(ti))
        dtype = jnp.result_type(tr, ti)
        return jax.lax.cond(jnp.any(mask),
                            lambda: jnp.broadcast_to(comp(), shape),
                            lambda: jnp.zeros(shape, dtype))
    return comp()


def w4_real(x, y, gate: bool = False):
    """Re[w(z)] for z = x + i y via Humlicek W4 (modm.f90:1100-1130).

    t = y - i x; regions split at s = |x|+y = 15 / 5.5 with the region-4
    wedge y < 0.195|x| - 0.176.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    tr, ti = y, -x
    s = jnp.abs(x) + y

    in1 = s >= 15.0
    in2 = (~in1) & (s >= 5.5)
    in34 = ~(in1 | in2)
    in4 = in34 & (y < 0.195 * jnp.abs(x) - 0.176)
    in3 = in34 & ~in4

    one = jnp.ones_like(tr)
    zero = jnp.zeros_like(tr)
    w = jnp.where(in1, _w_region1(jnp.where(in1, tr, one), jnp.where(in1, ti, zero))[0], 0.0)
    w = jnp.where(in2, _region_real(in2, _w_region2, tr, ti, one, zero, gate), w)
    w = jnp.where(in3, _region_real(in3, _w_region3, tr, ti, one, zero, gate), w)
    w = jnp.where(in4, _region_real(in4, _w_region4, tr, ti, zero, zero, gate), w)
    return w


def voigt(deltnu, alphal, alphad, gate: bool = False):
    """Voigt profile value (modm.f90:900-962).

    K(deltnu) = Re[w(sqrt(ln2) dnu/aD + i sqrt(ln2) aL/aD)] * sqrt(ln2/pi)/aD
    with a pure-Lorentz fallback at aD == 0 (zeta == 1).
    """
    alphal = jnp.asarray(alphal)
    alphad = jnp.asarray(alphad)
    deltnu = jnp.asarray(deltnu)

    ad_safe = jnp.where(alphad > 0.0, alphad, 1.0)
    x = _SQRT_LN2 * deltnu / ad_safe
    y = _SQRT_LN2 * alphal / ad_safe
    v = w4_real(x, y, gate=gate) * _RSQRT_PI_LN2 / ad_safe

    lor = alphal / (c.PI * (alphal * alphal + deltnu * deltnu))
    return jnp.where(alphad > 0.0, v, lor)


def xlorentz(z):
    """Normalised Lorentz in units of halfwidths (modm.f90:888-895)."""
    return 1.0 / (c.PI * (1.0 + z * z))


def _sd_region_id(s, x_h, y_h):
    """Region per SD_Humlicek (boundaries 15/6; modm.f90:1160-1179)."""
    # explicit int32 region ids: under jax_enable_x64 weak Python ints
    # would become i64, which the Mosaic TPU kernel compiler rejects
    i32 = jnp.int32
    r = jnp.where(s >= 15.0, i32(1), jnp.where(s >= 6.0, i32(2), i32(3)))
    r = jnp.where((r == 3) & (y_h < 0.195 * jnp.abs(x_h) - 0.176),
                  i32(4), r)
    return r


def _w_by_region_real(tr, ti, r, own_region4, gate: bool = False):
    """Re[w] for combined region r; per-point region-4/3 fallback inside r=4
    (modm.f90:1217-1247)."""
    one = jnp.ones_like(tr)
    zero = jnp.zeros_like(tr)
    use4 = (r == 4) & own_region4
    use3 = (r == 3) | ((r == 4) & ~own_region4)
    m1, m2 = r == 1, r == 2
    w = jnp.where(m1, _w_region1(jnp.where(m1, tr, one), jnp.where(m1, ti, zero))[0], 0.0)
    w = jnp.where(m2, _region_real(m2, _w_region2, tr, ti, one, zero, gate), w)
    w = jnp.where(use3, _region_real(use3, _w_region3, tr, ti, one, zero, gate), w)
    w = jnp.where(use4, _region_real(use4, _w_region4, tr, ti, zero, zero, gate), w)
    return w


def sdvoigt(deltnu, alphal, alphad, sdep, sdep_tiny: float = 1.0e-4,
            gate: bool = False):
    """Speed-dependent Voigt (Boone et al. 2011 two-point difference).

    Falls back to the plain Voigt where |sdep| <= 1e-4 (modm.f90:1017-1081).
    """
    deltnu = jnp.asarray(deltnu)
    alphal = jnp.asarray(alphal)
    alphad = jnp.asarray(alphad)
    sdep = jnp.asarray(sdep)

    use_sd = jnp.abs(sdep) > sdep_tiny
    sdep_safe = jnp.where(use_sd, sdep, 1.0)
    ad_safe = jnp.where(alphad > 0.0, alphad, 1.0)

    # operation order mirrors modm.f90:1029-1053 exactly — the x1 subtraction
    # cancels near line centre, so ulp-level divergence would be amplified
    gamma2 = alphal * sdep_safe
    g2_safe = jnp.where(gamma2 != 0.0, gamma2, 1.0)
    alfa = alphal / g2_safe - 1.5
    beta = deltnu / g2_safe
    delta = (1.0 / 4.0 / c.LN2) * (alphad * alphad / g2_safe / g2_safe)
    # f32 robustness: the two-point construction works at coordinates
    # ~sqrt(delta) whose differences cancel catastrophically as
    # gamma2 -> 0 (the NaN surfaced at a 0.05 hPa layer of the 80k-wn
    # envelope, where sdep just above the 1e-4 cutoff gave
    # delta ~ 1e8).  When the speed-dependent width is below ~0.06% of
    # the Doppler width (delta > 1e6) the correction is physically
    # negligible — fall back to the plain Voigt.  f64 (the validation
    # mode, and the precision the reference runs) evaluates the
    # construction fine, so the sdep cutoff alone applies there
    # (modm.f90:1017-1081).
    if jnp.result_type(deltnu, alphal, alphad) != jnp.float64:
        use_sd = use_sd & (delta < 1.0e6)
    alfadelta = alfa + delta

    # the _safe_sqrt guards keep forward values bit-identical
    # (sqrt(where(u>0, u, 1)) selected only where u > 0) while making the
    # VJP finite: a plain sqrt(0) has an infinite derivative, and the
    # cotangent 0 * inf from an unselected lane would poison the whole
    # backward sweep of the Pallas kernel's custom_vjp with NaNs
    def _safe_sqrt(u):
        return jnp.where(u > 0.0, jnp.sqrt(jnp.where(u > 0.0, u, 1.0)),
                         0.0)

    tmp = _safe_sqrt(alfadelta * alfadelta + beta * beta)
    sqrt_delta = _safe_sqrt(delta)
    # 1/sqrt(2) as a weak-typed Python float: jnp.sqrt(2.0) would be a
    # strong f64 constant under x64 and poison f32 Pallas kernels
    x1 = (1.0 / math.sqrt(2.0)) * _safe_sqrt(tmp + alfadelta) - sqrt_delta
    x2 = x1 + 2.0 * sqrt_delta
    # (tmp - delta - alfa) is >= 0 in exact arithmetic (tmp = |alfa+delta|
    # at beta=0); emulated-f64 rounding can leave a tiny negative residue at
    # line centre, and sign(0)*sqrt(-eps) would poison the result with NaN
    # (hazard latent in the reference too, modm.f90:1051) — clamp at 0
    y1 = jnp.sign(beta) * _safe_sqrt(
        jnp.maximum((tmp - delta - alfa) / 2.0, 0.0))
    y2 = y1

    # Humlicek-plane: the reference calls SD_Humlicek(y1,x1,...) so that
    # t = x - i*y and s = |y| + x  (modm.f90:1058,1155-1158)
    s1 = jnp.abs(y1) + x1
    s2 = jnp.abs(y2) + x2
    r1 = _sd_region_id(s1, y1, x1)
    r2 = _sd_region_id(s2, y2, x2)
    r = jnp.maximum(r1, r2)

    w1 = _w_by_region_real(x1, -y1, r, r1 == 4, gate=gate)
    w2 = _w_by_region_real(x2, -y2, r, r2 == 4, gate=gate)
    v_sd = (w1 - w2) * _RSQRT_PI_LN2 / ad_safe

    if gate:
        # skip the plain-Voigt fallback when every line in the block is
        # speed-dependent; computed values are identical when any is not
        shape = jnp.broadcast_shapes(jnp.shape(deltnu), jnp.shape(alphal),
                                     jnp.shape(alphad))
        v_plain = jax.lax.cond(
            jnp.any(~use_sd),
            lambda: jnp.broadcast_to(voigt(deltnu, alphal, alphad, gate=True),
                                     shape),
            lambda: jnp.zeros(shape, v_sd.dtype))
    else:
        v_plain = voigt(deltnu, alphal, alphad)
    return jnp.where(use_sd, v_sd, v_plain)


def w4(x, y):
    """Humlicek W4 as a (re, im) pair (complex dtypes are not TPU-supported)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    tr, ti = y, -x
    s = jnp.abs(x) + y
    in1 = s >= 15.0
    in2 = (~in1) & (s >= 5.5)
    in34 = ~(in1 | in2)
    in4 = in34 & (y < 0.195 * jnp.abs(x) - 0.176)
    in3 = in34 & ~in4
    one = jnp.ones_like(tr)
    zero = jnp.zeros_like(tr)

    def sel(mask, fn, guard_r, guard_i, wr, wi):
        rr, ri = fn(jnp.where(mask, tr, guard_r), jnp.where(mask, ti, guard_i))
        return jnp.where(mask, rr, wr), jnp.where(mask, ri, wi)

    wr = jnp.zeros_like(tr)
    wi = jnp.zeros_like(tr)
    wr, wi = sel(in1, _w_region1, one, zero, wr, wi)
    wr, wi = sel(in2, _w_region2, one, zero, wr, wi)
    wr, wi = sel(in3, _w_region3, one, zero, wr, wi)
    wr, wi = sel(in4, _w_region4, zero, zero, wr, wi)
    return wr, wi
