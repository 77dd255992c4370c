"""Monochromatic radiative-transfer solver (TPU-native design).

The reference computes the up/down layer recurrences with sequential running
optical-depth sums per wavenumber (RTMmono.f90:157-221).  Those recurrences
are mathematically prefix sums, so here they become cumulative sums along the
layer axis — fully parallel on the VPU, no `lax.scan` needed, batched over
arbitrary leading axes (wavenumber x profile) and shardable with pjit.

Conventions (identical to the reference):
  * layers are ordered surface -> top (IDU=1, the only supported layout,
    RTMmono.f90:173)
  * od:   [..., nlay]    layer optical depths (nepers)
  * t:    [..., nlay]    layer-average temperatures
  * tz:   [..., nlay+1]  level temperatures, tz[...,0] = surface level
  * wn:   broadcastable to od[..., 0]  (wavenumbers, cm^-1)

Linear-in-tau "Pade" effective Planck (Clough et al. 1992):
  pade = 0.193*tau + 0.013*tau^2 ;  Beff = (B_avg + pade*B_bound)/(1+pade)
ref RTMmono.f90:202-216.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from monortm_tpu import constants as c
from monortm_tpu.ops.planck import planck, brightness_temperature


class RTResult(NamedTuple):
    rad: jnp.ndarray      # radiance  [... , nwn]
    tb: jnp.ndarray       # brightness temperature [..., nwn]
    rup: jnp.ndarray      # upwelling path radiance
    rdn: jnp.ndarray      # downwelling path radiance
    trtot: jnp.ndarray    # total transmittance
    tmr: jnp.ndarray      # mean radiating temperature


def _pade(tau):
    return 0.193 * tau + 0.013 * tau * tau


def rad_up_dn(od, t, tz, wn):
    """Up/downwelling path radiances + total transmittance.

    All arrays broadcast; od/t have a trailing layer axis, tz has nlay+1.
    Returns (rup, rdn, trtot, sumexp_dn) where sumexp_dn is the downwelling
    Beff-weighted sum reused by the mean-radiating-temperature diagnostic.
    """
    od = jnp.asarray(od)
    wn = jnp.asarray(wn)[..., None]                      # align with layer axis

    bb = planck(wn, t)                                   # layer-average Planck
    bba = planck(wn, tz)                                 # level Planck, nlay+1

    tri = jnp.exp(-od)                                   # per-layer transmittance
    emit = -jnp.expm1(-od)                               # (1 - exp(-od)), accurate
    pade = _pade(od)

    odtot = jnp.sum(od, axis=-1)

    # transmittance from the top of layer l to TOA: exp(-sum_{k>l} od_k)
    od_above = jnp.cumsum(od[..., ::-1], axis=-1)[..., ::-1] - od
    # transmittance from the bottom of layer l to the surface: exp(-sum_{k<l})
    od_below = jnp.cumsum(od, axis=-1) - od

    tr_above = jnp.exp(-od_above)
    tr_below = jnp.exp(-od_below)

    # upwelling: boundary Planck at the layer's *upper* level (tz[l])
    beff_up = (bb + pade * bba[..., 1:]) / (1.0 + pade)
    rup = jnp.sum(tr_above * emit * beff_up, axis=-1)

    # downwelling: boundary Planck at the layer's *lower* level (tz[l-1])
    beff_dn = (bb + pade * bba[..., :-1]) / (1.0 + pade)
    sumexp_dn = tr_below * emit * beff_dn
    rdn = jnp.sum(sumexp_dn, axis=-1)

    trtot = jnp.exp(-odtot)
    return rup, rdn, trtot, sumexp_dn, odtot


def rtm(od, t, tz, wn, tsfc, emis, refl, irt: int, tsky: float = c.TSKY):
    """Full radiative transfer: combine path radiances with boundaries.

    irt: 1 = upwelling (space-based), 2 = limb, 3 = downwelling (ground).
    For irt in (2, 3) the surface temperature is replaced by the cosmic
    background (RTMmono.f90:113-124).
    ref: RTMmono.f90:13-155.
    """
    rup, rdn, trtot, sumexp_dn, odtot = rad_up_dn(od, t, tz, wn)

    if irt in (2, 3):
        tsfc = tsky
    surfrad = planck(wn, tsfc)
    cosmos = planck(wn, tsky)

    if irt == 1:
        rad = rup + trtot * (emis * surfrad + refl * (rdn + trtot * cosmos))
    elif irt == 2:
        rad = rup + trtot * (rdn + trtot * cosmos)
    elif irt == 3:
        rad = rdn + trtot * cosmos
    else:
        raise ValueError(f"irt must be 1, 2 or 3; got {irt}")

    tb = brightness_temperature(wn, rad)

    # mean radiating temperature (downwelling-only diagnostic,
    # Han & Westwater 2000 eq 14; RTMmono.f90:239-325)
    radtmr = jnp.sum(sumexp_dn, axis=-1) / (-jnp.expm1(-odtot))
    tmr = brightness_temperature(wn, radtmr)

    return RTResult(rad=rad, tb=tb, rup=rup, rdn=rdn, trtot=trtot, tmr=tmr)


def calctmr(od, t, tz, wn):
    """Standalone mean radiating temperature (ref RTMmono.f90:239-325)."""
    _, _, _, sumexp_dn, odtot = rad_up_dn(od, t, tz, wn)
    radtmr = jnp.sum(sumexp_dn, axis=-1) / (-jnp.expm1(-odtot))
    return brightness_temperature(wn, radtmr)


class RTParts(NamedTuple):
    """Device outputs of the O(W x L) path-radiance recurrences; the O(W)
    boundary combine happens on host (see combine_boundary_np)."""
    rup: jnp.ndarray      # upwelling path radiance   [..., nwn]
    rdn: jnp.ndarray      # downwelling path radiance [..., nwn]
    trtot: jnp.ndarray    # total transmittance       [..., nwn]
    radtmr: jnp.ndarray   # mean-radiating-temperature radiance [..., nwn]


def rt_parts(od, t, tz, wn) -> RTParts:
    """The layer-recurrence half of rtm: everything that needs the
    [..., W, L] optical depths.  Used by the pipeline so only O(W)
    arrays ever leave the device."""
    rup, rdn, trtot, sumexp_dn, odtot = rad_up_dn(od, t, tz, wn)
    radtmr = jnp.sum(sumexp_dn, axis=-1) / (-jnp.expm1(-odtot))
    return RTParts(rup=rup, rdn=rdn, trtot=trtot, radtmr=radtmr)


def combine_boundary_np(wn, rup, rdn, trtot, radtmr, tsfc, emis, refl,
                        irt: int, dtype=None, tsky: float = c.TSKY):
    """Boundary combine + Planck inversions in host NumPy.

    Mirrors rtm()'s tail (RTMmono.f90:113-155) on the O(W) arrays the
    pipeline pulls to host anyway.  Being a single NumPy program it is
    trivially independent of the device mesh — the final ulp of RAD/Tb
    cannot wobble with sharding-dependent FMA/fusion choices, which is
    what keeps mesh and single-device MONORTM.OUT byte-identical.

    Returns (rad, tb, tmr) as numpy arrays in `dtype` (default: the
    dtype of rup).
    """
    import numpy as np

    dt = np.dtype(dtype or np.asarray(rup).dtype)
    wn = np.asarray(wn, dt)
    rup = np.asarray(rup, dt)
    rdn = np.asarray(rdn, dt)
    trtot = np.asarray(trtot, dt)
    radtmr = np.asarray(radtmr, dt)

    def planck_np(t):
        t = np.asarray(t, dt)
        return (dt.type(c.RADCN1) * wn ** 3
                / np.expm1(wn * (dt.type(c.RADCN2) / t)))

    def tb_np(rad):
        x = dt.type(c.RADCN1) * wn ** 3 / rad
        return dt.type(c.RADCN2) * wn / np.log1p(x)

    if irt in (2, 3):
        tsfc = tsky
    with np.errstate(divide="ignore", over="ignore", invalid="ignore"):
        # T=0 boundaries legitimately drive expm1 -> inf -> planck 0,
        # matching the jnp semantics of rtm()
        surfrad = planck_np(tsfc)
        cosmos = planck_np(tsky)
        emis = np.asarray(emis, dt)
        refl = np.asarray(refl, dt)

        if irt == 1:
            rad = rup + trtot * (emis * surfrad
                                 + refl * (rdn + trtot * cosmos))
        elif irt == 2:
            rad = rup + trtot * (rdn + trtot * cosmos)
        elif irt == 3:
            rad = rdn + trtot * cosmos
        else:
            raise ValueError(f"irt must be 1, 2 or 3; got {irt}")
        return rad, tb_np(rad), tb_np(radtmr)
