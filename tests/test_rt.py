"""RT solver validation against a direct NumPy transliteration of the
reference recurrences (RTMmono.f90:157-221, 13-155, 239-325)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monortm_tpu import constants as c
from monortm_tpu.models.rt import rad_up_dn, rtm, calctmr
from monortm_tpu.ops.planck import planck, brightness_temperature, radfn


def bb(v, t):
    return c.RADCN1 * v**3 / (np.exp(v * c.RADCN2 / t) - 1.0)


def reference_rad_up_dn(od, t, tz, wn):
    """Loop transliteration of RAD_UP_DN for one wavenumber set (f64)."""
    nwn, nlay = od.shape
    rup = np.zeros(nwn)
    rdn = np.zeros(nwn)
    trtot = np.ones(nwn)
    for i in range(nwn):
        v = wn[i]
        bbvec = bb(v, t)            # [nlay]
        bbavec = bb(v, tz)          # [nlay+1]
        odtot = od[i].sum()
        # up
        odt = odtot
        for l in range(nlay):
            odvi = od[i, l]
            tri = np.exp(-odvi)
            odt -= odvi
            tr = np.exp(-odt)
            pade = 0.193 * odvi + 0.013 * odvi**2
            rup[i] += tr * (1 - tri) * (bbvec[l] + pade * bbavec[l + 1]) / (1 + pade)
        # down
        odt = odtot
        for l in range(nlay - 1, -1, -1):
            odvi = od[i, l]
            odt -= odvi
            tri = np.exp(-odvi)
            tr = np.exp(-odt)
            pade = 0.193 * odvi + 0.013 * odvi**2
            rdn[i] += tr * (1 - tri) * (bbvec[l] + pade * bbavec[l]) / (1 + pade)
        trtot[i] = np.exp(-odtot)
    return rup, rdn, trtot


@pytest.fixture
def case():
    rng = np.random.default_rng(42)
    nwn, nlay = 13, 25
    wn = np.linspace(0.5, 40.0, nwn)
    od = 10.0 ** rng.uniform(-5, 0.5, (nwn, nlay))
    t = np.linspace(285.0, 215.0, nlay) + rng.uniform(-2, 2, nlay)
    tz = np.concatenate([[288.0], t - 1.5])
    return wn, od, t, tz


def test_rad_up_dn_matches_reference_loops(case):
    wn, od, t, tz = case
    rup_ref, rdn_ref, trtot_ref = reference_rad_up_dn(od, t, tz, wn)
    rup, rdn, trtot, _, _ = rad_up_dn(jnp.asarray(od), jnp.asarray(t),
                                      jnp.asarray(tz), jnp.asarray(wn))
    np.testing.assert_allclose(np.asarray(rup), rup_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rdn), rdn_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(trtot), trtot_ref, rtol=1e-12)


def test_rtm_downwelling_combination(case):
    wn, od, t, tz = case
    emis = np.full_like(wn, 0.97)
    refl = 1.0 - emis
    res = rtm(jnp.asarray(od), jnp.asarray(t), jnp.asarray(tz),
              jnp.asarray(wn), 290.0, emis, refl, irt=3)
    _, rdn_ref, trtot_ref = reference_rad_up_dn(od, t, tz, wn)
    rad_ref = rdn_ref + trtot_ref * bb(wn, c.TSKY)
    np.testing.assert_allclose(np.asarray(res.rad), rad_ref, rtol=1e-12)
    # brightness temperature inverts the Planck function exactly
    x = c.RADCN1 * wn**3 / rad_ref + 1.0
    tb_ref = c.RADCN2 * wn / np.log(x)
    np.testing.assert_allclose(np.asarray(res.tb), tb_ref, rtol=1e-12)
    assert np.all(np.asarray(res.tb) > 2.0) and np.all(np.asarray(res.tb) < 320.0)


def test_rtm_upwelling_combination(case):
    wn, od, t, tz = case
    emis = np.full_like(wn, 0.95)
    refl = 1.0 - emis
    tsfc = 291.3
    res = rtm(jnp.asarray(od), jnp.asarray(t), jnp.asarray(tz),
              jnp.asarray(wn), tsfc, emis, refl, irt=1)
    rup_ref, rdn_ref, trtot_ref = reference_rad_up_dn(od, t, tz, wn)
    rad_ref = rup_ref + trtot_ref * (
        emis * bb(wn, tsfc) + refl * (rdn_ref + trtot_ref * bb(wn, c.TSKY)))
    np.testing.assert_allclose(np.asarray(res.rad), rad_ref, rtol=1e-12)


def test_calctmr_matches_reference(case):
    wn, od, t, tz = case
    tmr = np.asarray(calctmr(jnp.asarray(od), jnp.asarray(t),
                             jnp.asarray(tz), jnp.asarray(wn)))
    # transliteration (RTMmono.f90:286-320)
    for i in range(len(wn)):
        v = wn[i]
        odtot = od[i].sum()
        odt = odtot
        sumexp = 0.0
        for l in range(od.shape[1] - 1, -1, -1):
            odvi = od[i, l]
            odt -= odvi
            tri = np.exp(-odvi)
            tr = np.exp(-odt)
            pade = 0.193 * odvi + 0.013 * odvi**2
            beff = (bb(v, t[l]) + pade * bb(v, tz[l])) / (1 + pade)
            sumexp += beff * tr * (1 - tri)
        radtmr = sumexp / (1 - np.exp(-odtot))
        tmr_ref = c.RADCN2 * v / np.log(c.RADCN1 * v**3 / radtmr + 1.0)
        np.testing.assert_allclose(tmr[i], tmr_ref, rtol=1e-12)


def test_planck_roundtrip():
    wn = jnp.asarray([0.7, 5.0, 100.0, 1000.0])
    t = 250.0
    rad = planck(wn, t)
    np.testing.assert_allclose(np.asarray(brightness_temperature(wn, rad)),
                               t, rtol=1e-12)


def test_radfn_matches_tanh():
    # piecewise branches agree with v*tanh(v/2kT) to float accuracy
    xkt = 250.0 / c.RADCN2
    v = np.asarray([0.01, 0.5, 10.0, 500.0, 3000.0, 10000.0])
    got = np.asarray(radfn(jnp.asarray(v), xkt))
    want = v * np.tanh(v / (2 * xkt))
    np.testing.assert_allclose(got, want, rtol=3e-5)


def test_rt_batched_over_profiles(case):
    wn, od, t, tz = case
    odb = np.stack([od, od * 2.0])
    tb_ = np.stack([t, t + 1.0])
    tzb = np.stack([tz, tz + 1.0])
    rup, rdn, trtot, _, _ = rad_up_dn(
        jnp.asarray(odb), jnp.asarray(tb_)[:, None, :],
        jnp.asarray(tzb)[:, None, :], jnp.asarray(wn)[None, :])
    assert rup.shape == (2, len(wn))
    r0, d0, t0 = reference_rad_up_dn(od * 2.0, t + 1.0, tz + 1.0, wn)
    np.testing.assert_allclose(np.asarray(rup)[1], r0, rtol=1e-12)
