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

All control flow is data-parallel `jnp.where` selection — every branch is
evaluated with guarded inputs, then masked.  This maps 1:1 onto the TPU VPU
(and is reused verbatim inside the Pallas line-sum kernel).
"""

from __future__ import annotations

import jax.numpy as jnp

from monortm_tpu import constants as c

_SQRT_LN2 = c.SQRT_LN2
_RSQRT_PI_LN2 = (c.LN2 / c.PI) ** 0.5   # sqrt(ln2/pi)


def _w_region1(t):
    return t * 0.5641896 / (0.5 + t * t)


def _w_region2(t):
    u = t * t
    return t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u))


def _w_region3(t):
    return ((16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236))))
            / (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t))))))


def _w_region4(t):
    u = t * t
    num = (36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u *
           (35.76683 - u * (1.320522 - u * 0.56419))))))
    den = (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u *
           (364.2191 - u * (61.57037 - u * (1.841439 - u)))))))
    return jnp.exp(u) - t * num / den


def w4(x, y):
    """Humlicek W4: w(z) for z = x + i y, y >= 0 (modm.f90:1100-1130)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    t = y - 1j * x
    s = jnp.abs(x) + y

    in1 = s >= 15.0
    in2 = (~in1) & (s >= 5.5)
    in34 = ~(in1 | in2)
    in4 = in34 & (y < 0.195 * jnp.abs(x) - 0.176)
    in3 = in34 & ~in4

    # guard region-4 exp(t^2) against overflow where not selected
    t4 = jnp.where(in4, t, 0.0)
    w = jnp.where(in1, _w_region1(jnp.where(in1, t, 1.0)), 0.0)
    w = jnp.where(in2, _w_region2(jnp.where(in2, t, 1.0)), w)
    w = jnp.where(in3, _w_region3(jnp.where(in3, t, 1.0)), w)
    w = jnp.where(in4, _w_region4(t4), w)
    return w


def voigt(deltnu, alphal, alphad):
    """Voigt profile value with unit normalisation (modm.f90:900-962).

    K(deltnu) = Re[w(sqrt(ln2) dnu/aD + i sqrt(ln2) aL/aD)] * sqrt(ln2/pi)/aD
    with a pure-Lorentz fallback at zeta == 1 (aD == 0).
    """
    alphal = jnp.asarray(alphal)
    alphad = jnp.asarray(alphad)
    deltnu = jnp.asarray(deltnu)

    ad_safe = jnp.where(alphad > 0.0, alphad, 1.0)
    x = _SQRT_LN2 * deltnu / ad_safe
    y = _SQRT_LN2 * alphal / ad_safe
    v = jnp.real(w4(x, y)) * _RSQRT_PI_LN2 / ad_safe

    lor = alphal / (c.PI * (alphal * alphal + deltnu * deltnu))
    return jnp.where(alphad > 0.0, v, lor)


def xlorentz(z):
    """Normalised Lorentz in units of halfwidths (modm.f90:888-895)."""
    return 1.0 / (c.PI * (1.0 + z * z))


def _sd_region_id(s, x_h, y_h):
    """Region per SD_Humlicek (boundaries 15/6; modm.f90:1160-1179).

    x_h, y_h are the *Humlicek-plane* coordinates of the evaluation point
    (the reference swaps its x/y arguments at the call site).
    """
    r = jnp.where(s >= 15.0, 1, jnp.where(s >= 6.0, 2, 3))
    r = jnp.where((r == 3) & (y_h < 0.195 * jnp.abs(x_h) - 0.176), 4, r)
    return r


def _w_by_region(t, r, own_region4):
    """Evaluate Humlicek formula for combined region r at point t.

    For r == 4: use the region-4 formula only when the point itself is in
    region 4, else region 3 (modm.f90:1217-1247, MJA 08062013 fix).
    """
    use4 = (r == 4) & own_region4
    w = jnp.where(r == 1, _w_region1(jnp.where(r == 1, t, 1.0)), 0.0)
    w = jnp.where(r == 2, _w_region2(jnp.where(r == 2, t, 1.0)), w)
    w3_sel = (r == 3) | ((r == 4) & ~own_region4)
    w = jnp.where(w3_sel, _w_region3(jnp.where(w3_sel, t, 1.0)), w)
    w = jnp.where(use4, _w_region4(jnp.where(use4, t, 0.0)), w)
    return w


def sdvoigt(deltnu, alphal, alphad, sdep, sdep_tiny: float = 1.0e-4):
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

    gamma2 = alphal * sdep_safe
    g2_safe = jnp.where(gamma2 != 0.0, gamma2, 1.0)
    alfa = 1.0 / sdep_safe - 1.5                      # alphal/gamma2 - 1.5
    beta = deltnu / g2_safe
    delta = (0.25 / c.LN2) * (alphad * alphad) / (g2_safe * g2_safe)
    alfadelta = alfa + delta

    tmp = jnp.sqrt(alfadelta * alfadelta + beta * beta)
    sqrt_delta = jnp.sqrt(delta)
    x1 = jnp.sqrt(jnp.maximum(tmp + alfadelta, 0.0) * 0.5) - sqrt_delta
    x2 = x1 + 2.0 * sqrt_delta
    y1 = jnp.sign(beta) * jnp.sqrt(jnp.maximum((tmp - delta - alfa) * 0.5, 0.0))
    y2 = y1

    # Humlicek-plane coordinates: the reference calls SD_Humlicek(y1,x1,...),
    # i.e. t = x - i*y, s = |y| + x  (modm.f90:1058,1155-1158)
    t1 = x1 - 1j * y1
    t2 = x2 - 1j * y2
    s1 = jnp.abs(y1) + x1
    s2 = jnp.abs(y2) + x2
    r1 = _sd_region_id(s1, y1, x1)
    r2 = _sd_region_id(s2, y2, x2)
    r = jnp.maximum(r1, r2)

    w1 = _w_by_region(t1, r, r1 == 4)
    w2 = _w_by_region(t2, r, r2 == 4)
    v_sd = jnp.real(w1 - w2) * _RSQRT_PI_LN2 / ad_safe

    v_plain = voigt(deltnu, alphal, alphad)
    return jnp.where(use_sd, v_sd, v_plain)
