"""Voigt kernel validation: exact match vs a NumPy transliteration of the
reference W4/SDVOIGT (modm.f90:900-1251) and sanity vs scipy.wofz."""

import numpy as np
import jax.numpy as jnp
import pytest

from monortm_tpu import constants as c
from monortm_tpu.ops.voigt import voigt, sdvoigt, w4, xlorentz

SQL2 = np.sqrt(np.log(2.0))


def w4_ref(x, y):
    t = complex(y, -x)
    s = abs(x) + y
    if s >= 15.0:
        return t * 0.5641896 / (0.5 + t * t)
    if s >= 5.5:
        u = t * t
        return t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u))
    if y >= 0.195 * abs(x) - 0.176:
        return ((16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236))))
                / (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t))))))
    u = t * t
    return np.exp(u) - t * (36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u *
        (35.76683 - u * (1.320522 - u * 0.56419)))))) / \
        (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u *
        (364.2191 - u * (61.57037 - u * (1.841439 - u)))))))


def voigt_ref(dnu, al, ad):
    zeta = al / (al + ad)
    if zeta == 1.0:
        return al / (np.pi * (al**2 + dnu**2))
    x = SQL2 * dnu / ad
    y = SQL2 * al / ad
    return w4_ref(x, y).real * np.sqrt(np.log(2.0) / np.pi) / ad


def sd_region(s, x, y):
    # function-arg convention of SD_Humlicek: s=|x|+y with swapped roles
    if s >= 15.0:
        return 1
    if s >= 6.0:
        return 2
    if y < 0.195 * abs(x) - 0.176:
        return 4
    return 3


def _w_formula(t, region):
    if region == 1:
        return t * 0.5641896 / (0.5 + t * t)
    if region == 2:
        u = t * t
        return t * (1.410474 + u * 0.5641896) / (0.75 + u * (3.0 + u))
    if region == 3:
        return ((16.4955 + t * (20.20933 + t * (11.96482 + t * (3.778987 + t * 0.5642236))))
                / (16.4955 + t * (38.82363 + t * (39.27121 + t * (21.69274 + t * (6.699398 + t))))))
    u = t * t
    return np.exp(u) - t * (36183.31 - u * (3321.9905 - u * (1540.787 - u * (219.0313 - u *
        (35.76683 - u * (1.320522 - u * 0.56419)))))) / \
        (32066.6 - u * (24322.84 - u * (9022.228 - u * (2186.181 - u *
        (364.2191 - u * (61.57037 - u * (1.841439 - u)))))))


def sdvoigt_ref(dnu, al, ad, sdep):
    if abs(sdep) <= 1e-4:
        return voigt_ref(dnu, al, ad)
    gamma2 = al * sdep
    alfa = al / gamma2 - 1.5
    beta = dnu / gamma2
    delta = (1.0 / 4.0 / np.log(2.0)) * ad * ad / gamma2 / gamma2
    ad_ = alfa + delta
    tmp = np.sqrt(ad_ * ad_ + beta * beta)
    x1 = (1.0 / np.sqrt(2.0)) * np.sqrt(tmp + ad_) - np.sqrt(delta)
    x2 = x1 + 2.0 * np.sqrt(delta)
    sign = np.sign(beta)
    # clamp mirrors ops.voigt.sdvoigt: (tmp-delta-alfa) >= 0 in exact
    # arithmetic; rounding can leave -eps whose sqrt would NaN
    y1 = sign * np.sqrt(max((tmp - delta - alfa) / 2.0, 0.0))
    y2 = y1
    # call SD_Humlicek(y1, x1, y2, x2): inside, T1=CMPLX(x1,-y1), S1=|y1|+x1
    t1 = complex(x1, -y1)
    t2 = complex(x2, -y2)
    s1 = abs(y1) + x1
    s2 = abs(y2) + x2
    r1 = sd_region(s1, y1, x1)
    r2 = sd_region(s2, y2, x2)
    r = max(r1, r2)
    if r < 4:
        w1 = _w_formula(t1, r)
        w2 = _w_formula(t2, r)
    else:
        w1 = _w_formula(t1, 4 if r1 == 4 else 3)
        w2 = _w_formula(t2, 4 if r2 == 4 else 3)
    return (w1 - w2).real * np.sqrt(np.log(2.0) / np.pi) / ad


def _grid():
    dnu = np.concatenate([np.linspace(-30, 30, 41), [-0.001, 0.0005, 0.0]])
    al = np.asarray([1e-4, 0.01, 0.08, 0.5, 3.0])
    ad = np.asarray([5e-4, 0.005, 0.05, 0.3])
    g = np.stack(np.meshgrid(dnu, al, ad, indexing="ij"), -1).reshape(-1, 3)
    return g[:, 0], g[:, 1], g[:, 2]


def test_w4_matches_reference_all_regions():
    x = np.concatenate([np.linspace(-20, 20, 81), [0.0, 30.0, -30.0]])
    y = np.asarray([1e-4, 0.05, 0.3, 2.0, 8.0, 20.0])
    X, Y = np.meshgrid(x, y, indexing="ij")
    wr, wi = w4(jnp.asarray(X), jnp.asarray(Y))
    want = np.vectorize(w4_ref)(X, Y)
    np.testing.assert_allclose(np.asarray(wr), want.real, rtol=1e-12, atol=1e-300)
    np.testing.assert_allclose(np.asarray(wi), want.imag, rtol=1e-12, atol=1e-300)


def test_w4_against_scipy_wofz():
    scipy = pytest.importorskip("scipy.special")
    x = np.linspace(-12, 12, 97)
    y = np.asarray([0.01, 0.1, 1.0, 5.0, 16.0])
    X, Y = np.meshgrid(x, y, indexing="ij")
    wr, _ = w4(jnp.asarray(X), jnp.asarray(Y))
    want = scipy.wofz(X + 1j * Y)
    # Humlicek's stated max relative error is < 1e-4
    np.testing.assert_allclose(np.asarray(wr), want.real, rtol=2e-4, atol=1e-8)


def test_voigt_matches_reference():
    dnu, al, ad = _grid()
    got = np.asarray(voigt(jnp.asarray(dnu), jnp.asarray(al), jnp.asarray(ad)))
    want = np.asarray([voigt_ref(*args) for args in zip(dnu, al, ad)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sdvoigt_matches_reference():
    dnu, al, ad = _grid()
    for sdep in (0.0, 5e-5, 0.05, 0.13):
        got = np.asarray(sdvoigt(jnp.asarray(dnu), jnp.asarray(al),
                                 jnp.asarray(ad), jnp.asarray(np.full_like(dnu, sdep))))
        want = np.asarray([sdvoigt_ref(d, a, b, sdep) for d, a, b in zip(dnu, al, ad)])
        # rtol 1e-5 / atol 1e-13: the SD value is the near-cancelling
        # difference w(z1)-w(z2); axon-TPU f64 emulation ulps (~1e-13 on
        # the w values) amplify to ~1e-6 relative in the far wings.
        # Exact 1e-10 parity holds on CPU backends.
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-13,
                                   err_msg=f"sdep={sdep}")


def test_sdvoigt_converges_to_voigt_for_small_sdep():
    # Boone form should approach the plain Voigt as sdep -> 0+
    dnu = np.linspace(-2, 2, 21)
    al, ad = 0.07, 0.03
    v = np.asarray(voigt(jnp.asarray(dnu), al, ad))
    sd = np.asarray(sdvoigt(jnp.asarray(dnu), al, ad,
                            jnp.full_like(jnp.asarray(dnu), 1e-3)))
    np.testing.assert_allclose(sd, v, rtol=2e-2)


def test_xlorentz():
    z = jnp.asarray([0.0, 1.0, -2.0])
    np.testing.assert_allclose(np.asarray(xlorentz(z)),
                               1.0 / (np.pi * (1 + np.asarray(z) ** 2)), rtol=1e-12)


def test_sdvoigt_negligible_sd_falls_back_to_voigt_f32():
    """sdep just above the 1e-4 cutoff with a near-zero speed-dependent
    width (gamma2 << alphad) drives the two-point SD construction into
    catastrophic f32 cancellation (observed NaN at a 0.05 hPa layer of
    the 80k-wn envelope run).  The delta > 1e6 guard must route such
    lines to the plain Voigt instead (the correction is < 0.06% of the
    Doppler width there)."""
    import jax.numpy as jnp
    from monortm_tpu.ops.voigt import sdvoigt, voigt

    d = jnp.float32(-4.6253204e-05)
    hw = jnp.float32(4.830477e-06)
    ad = jnp.float32(9.574036e-06)
    sd = jnp.float32(1.1304602e-04)
    v = float(sdvoigt(d, hw, ad, sd))
    assert np.isfinite(v)
    np.testing.assert_allclose(v, float(voigt(d, hw, ad)), rtol=1e-6)
    # gated form (the Pallas kernel path) agrees to f32 roundoff
    vg = float(sdvoigt(d, hw, ad, sd, gate=True))
    np.testing.assert_allclose(vg, v, rtol=1e-6)
