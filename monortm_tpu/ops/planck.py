"""Planck / radiation-field primitives (pure jnp, fused by XLA).

Parity notes (reference file:line):
  bb_fn        -> RTMmono.f90:223-237   B(v,T) = RADCN1 v^3 / (exp(v RADCN2/T)-1)
  Tb inversion -> RTMmono.f90:149-152   T = RADCN2 v / log(RADCN1 v^3 / R + 1)
  RADFN        -> lblrtm_sub.f90:36-97  piecewise v*tanh(v/2kT) radiation term
  RFT          -> modm.f90:257          wn * tanh(RADCT*wn / 2T)
"""

from __future__ import annotations

import jax.numpy as jnp

from monortm_tpu import constants as c


def planck(wn, temp):
    """Planck radiance B(wn, T) in W/(cm^2 sr cm^-1).

    wn in cm^-1, temp in K.  Broadcasts over both arguments.
    """
    wn = jnp.asarray(wn)
    beta = c.RADCN2 / jnp.asarray(temp)
    return c.RADCN1 * wn**3 / jnp.expm1(wn * beta)


def brightness_temperature(wn, rad):
    """Exact Planck inversion: radiance -> brightness temperature [K]."""
    wn = jnp.asarray(wn)
    x = c.RADCN1 * wn**3 / jnp.asarray(rad)
    return c.RADCN2 * wn / jnp.log1p(x)


def radfn(wn, xkt):
    """Radiation term v*tanh(v/(2 kT)) with the reference's piecewise form.

    xkt = T / RADCN2 (temperature in wavenumber units).  The piecewise
    branches (lblrtm_sub.f90:76-93) agree with tanh to float accuracy but we
    reproduce them exactly so continuum optical depths match bit-for-bit in
    f64 validation mode.
    """
    wn = jnp.asarray(wn)
    xkt = jnp.asarray(xkt)
    xviokt = jnp.where(xkt > 0.0, wn / jnp.where(xkt > 0.0, xkt, 1.0), 0.0)
    expvkt = jnp.exp(-jnp.clip(xviokt, 0.0, 80.0))
    small = 0.5 * xviokt * wn
    mid = wn * (1.0 - expvkt) / (1.0 + expvkt)
    out = jnp.where(xviokt <= 0.01, small, jnp.where(xviokt <= 10.0, mid, wn))
    return jnp.where(xkt > 0.0, out, wn)


def rad_field_term(wn, temp):
    """RFT = wn * tanh(RADCT*wn/(2T))   (modm.f90:257)."""
    wn = jnp.asarray(wn)
    return wn * jnp.tanh(c.RADCT * wn / (2.0 * jnp.asarray(temp)))
