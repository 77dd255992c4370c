"""Atmosphere/layering engine tests: physical closure checks (no Fortran
oracle is available — the reference binary can't be built in this image),
plus end-to-end layering of the reference example inputs."""

import numpy as np
import pytest

from monortm_tpu.atmos import layering as lay
from monortm_tpu.atmos.tape5_atm import atmpth

AIRMS1 = 2.153e25   # one vertical airmass, ground to space (lblatm.f90:515)


@pytest.fixture(scope="module")
def usstd():
    return lay.load_model_atmosphere(6, 7)


def test_model_atmosphere_surface_values(usstd):
    assert usstd.pm[0] == 1013.0
    assert usstd.tm[0] == 288.2
    # H2O number density at surface: 7745 ppmv * dry-air density — the
    # reference's MDLATM K=1..7 loop overwrites H2O with ppmv*DRYAIR
    # (lblatm.f90:2988-2992); see tests/test_layering_oracle.py
    np.testing.assert_allclose(
        usstd.denm[0, 0], 7745e-6 * 2.548e19 * (1.0 - 7745e-6), rtol=1e-6)
    assert usstd.zmdl[-1] == 100.0  # truncated at HSPACE


def test_refractivity_magnitude(usstd):
    n1 = lay.refractivity(usstd, 1.0)
    # surface refractivity ~ 2.7e-4 in the microwave
    assert 2.0e-4 < n1[0] < 4.0e-4
    assert np.all(np.diff(n1) < 0)


def test_cmpalt_closure(usstd):
    # hydrostatic altitudes from the model P/T/H2O reproduce the model's
    # own altitude grid (lowest 25 levels; 0-25 km)
    z = lay.cmpalt(usstd.pm[:26], usstd.tm[:26], usstd.denw[:26], 0.0, 45.0)
    np.testing.assert_allclose(z, usstd.zmdl[:26], atol=0.15)


def test_vertical_path_airmass(usstd):
    eng = lay.PathEngine(usstd, 1.0, 6371.23, 7)
    geo = eng.fscgeo(0.0, 0.0, 0.0, 0.0, 0.0, 3, 0)  # case 3A
    assert geo["hmin"] == 0.0 and geo["len"] == 0
    zbnd = np.asarray([0.0, 100.0])
    trace = eng.rfpath(geo["h1"], geo["h2"], geo["angle"], geo["phi"],
                       geo["len"], geo["hmin"], 1, zbnd)
    res = eng.fpack(trace, geo["h1"], geo["h2"], geo["len"], n_zero=1)
    total_air = res.rhosum.sum()
    np.testing.assert_allclose(total_air, AIRMS1, rtol=0.01)
    # PWV of US standard atmosphere ~1.42 cm
    pwv = res.amount[0].sum() * 2.99150e-23
    assert 1.1 < pwv < 1.8
    # O2 column approximately 0.2095 of dry air column
    o2_frac = res.amount[6].sum() / total_air
    np.testing.assert_allclose(o2_frac, 0.2095, rtol=0.02)


def test_slant_path_secant(usstd):
    # 60 degrees from vertical → air mass ≈ sec(60°) = 2 (weak sphericity)
    eng = lay.PathEngine(usstd, 1.0, 6371.23, 7)
    geo = eng.fscgeo(0.0, 0.0, 60.0, 0.0, 0.0, 3, 0)  # case 3A
    zbnd = np.asarray([0.0, 100.0])
    trace = eng.rfpath(geo["h1"], geo["h2"], geo["angle"], geo["phi"],
                       geo["len"], geo["hmin"], 1, zbnd)
    res = eng.fpack(trace, geo["h1"], geo["h2"], geo["len"], n_zero=1)
    np.testing.assert_allclose(res.rhosum.sum() / AIRMS1, 2.0, rtol=0.02)


def test_autlay_boundaries(usstd):
    eng = lay.PathEngine(usstd, 1.0, 6371.23, 7)
    zbnd, pbnd, tbnd = eng.autlay(0.0, 30.0, 1.0, 1.5, 5.0, 8.0, 0.0, 100.0)
    assert zbnd[0] == 0.0 and zbnd[-1] == 30.0
    assert np.all(np.diff(zbnd) > 0)
    assert 10 < len(zbnd) < 60


CASE1_REST = [
    "    6    2    0    1    1   22    1",
    "     0.000    30.000       0.000",
    "     0.000     3.000     3.000     0.000     0.000",
    "-1",
]


def test_case1_layering():
    prof = atmpth(CASE1_REST, 0.2, 1.2)
    st, meta = prof.state, prof.meta
    nlay = len(st.p)
    assert meta.nmol == 22
    assert 10 < nlay < 80
    assert meta.angle == 0.0 and meta.irt == 3
    assert np.all(np.diff(st.p) < 0)          # pressure decreasing upward
    assert st.tz[0] == pytest.approx(288.2, abs=0.5)
    assert st.wkl.shape == (nlay, 39)
    assert np.all(st.wkl[:, :22] >= 0.0)
    # N2 column fraction of total air ~ 0.78 of dry air
    air = st.wbrodl.sum() + st.wkl[:, :22].sum()
    np.testing.assert_allclose(st.wkl[:, 21].sum() / air, 0.78, rtol=0.03)
    np.testing.assert_allclose(air, AIRMS1 * 0.997, rtol=0.02)  # 0-30 km


def test_case2_upwelling_layering():
    rest = [
        "    6    2    0    1    1   22    1",
        "    30.000     0.000   180.000",
        "     0.000     3.000     3.000     0.000     0.000",
    ]
    prof = atmpth(rest, 0.2, 1.2)
    assert prof.meta.irt == 1
    assert prof.meta.angle == 180.0
    # same layers as the downwelling case (path direction only differs)
    d = atmpth(CASE1_REST, 0.2, 1.2)
    np.testing.assert_allclose(prof.state.p, d.state.p, rtol=1e-10)
    np.testing.assert_allclose(prof.state.wkl[:, 0], d.state.wkl[:, 0],
                               rtol=1e-10)


def test_user_profile_rh_units():
    # MODEL=0 with pressure-driven grid: JCHARP='A' (mb), H2O in RH%
    rest = [
        "    0    2    4    1    0    7    1",
        "     0.008     3.000     0.000",
        "     0.008     1.000     2.000     3.000",
        "    4 TEST",
        "     0.008  1011.900   245.450     AA   H666666",
        "7.4000e+01     0.000  0.000000  0.000000  0.000000  0.000000      0.00",
        "     1.000   897.000   240.000     AA   H666666",
        "6.0000e+01     0.000  0.000000  0.000000  0.000000  0.000000      0.00",
        "     2.000   795.000   236.000     AA   H666666",
        "5.0000e+01     0.000  0.000000  0.000000  0.000000  0.000000      0.00",
        "     3.000   701.200   230.000     AA   H666666",
        "4.0000e+01     0.000  0.000000  0.000000  0.000000  0.000000      0.00",
    ]
    prof = atmpth(rest, 0.5, 1.0)
    st = prof.state
    assert len(st.p) == 3
    assert np.all(st.wkl[:, 0] > 0)           # H2O from RH
    assert np.all(st.wkl[:, 1] > 0)           # CO2 defaulted from US std
    assert np.all(st.wkl[:, 6] > 0)           # O2 defaulted
    assert st.tz[0] == pytest.approx(245.45)


def test_tape7_roundtrip(tmp_path):
    # layering output written as TAPE7 re-reads as an IATM=0 profile
    # (README.md:52 workflow; formats lblatm.f90:1272-1424)
    from monortm_tpu.io.tape7 import write_tape7
    from monortm_tpu.io.profin import read_profiles
    prof = atmpth(CASE1_REST[:3], 0.2, 1.2)
    p = tmp_path / "TAPE7"
    write_tape7(p, [prof])
    back = read_profiles(p)[0]
    np.testing.assert_allclose(back.state.p, prof.state.p, rtol=2e-6)
    np.testing.assert_allclose(back.state.t, prof.state.t, atol=0.01)
    np.testing.assert_allclose(back.state.wkl[:, :7],
                               prof.state.wkl[:, :7], rtol=1e-6)
    np.testing.assert_allclose(back.state.tz, prof.state.tz, atol=0.01)
    assert back.meta.nmol == prof.meta.nmol


def test_xamnts_standard_profile(tmp_path):
    """IATM=1 cross-sections: standard AMOLX profile -> layer amounts."""
    # synthetic FSCDXS with CCL4 covering the test band
    fscdxs = "\n".join([
        " hdr", " hdr2",
        f"{'CCL4':<10s}{780.0:10.4f}{820.0:10.4f}{0.1:10.8f}{2:5d}"
        + " " * 5 + f"{91:5d}N" + " " * 4 + f"{'CCL4_T1':<10s}{'CCL4_T2':<10s}",
        "%"])
    (tmp_path / "FSCDXS").write_text(fscdxs + "\n")
    rest = [
        "    6    2    0    1    1    7    1",
        "     0.000    30.000       0.000",
        "     0.000     3.000     3.000     0.000     0.000",
        "    1    1    0",           # record 3.7: IXMOLS=1, IPRFL=1 (std)
        "CCL4      ",
    ]
    prof = atmpth(rest, 790.0, 810.0, ixsect=1, fscdxs_dir=tmp_path)
    assert prof.xsname == ["CCL4"]
    assert prof.xamnt is not None
    nlay = len(prof.state.p)
    assert prof.xamnt.shape == (1, nlay)
    assert np.all(prof.xamnt >= 0)
    # CCL4 ~0.1 ppbv near the surface -> column ~1e15-ish over 0-30 km
    total = prof.xamnt.sum()
    assert 1e13 < total < 1e17


def test_fixtyp_ityl_codes(tmp_path, monkeypatch):
    """IFXTYP=1: ITYL DV-ratio codes computed (FIXTYP, lblatm.f90:6062-6156)
    and written to the TAPE7 CTYPE column; IFXTYP=2 writes IFIXTYPE and
    IFXTYP=-2 reads it back (lblatm.f90:1292-1339)."""
    from monortm_tpu.io.tape7 import write_tape7
    monkeypatch.chdir(tmp_path)
    # record 3.1 with IFXTYP at cols 36-37
    r31 = "    6    2    0    1    1   22    1 1"
    rest = [r31] + CASE1_REST[1:3]
    prof = atmpth(rest, 0.5, 1.0)
    assert prof.ityl is not None
    assert prof.ityl[0] == 99                 # layer-1 sentinel
    assert np.all(np.abs(prof.ityl[1:]) < 99)
    t7 = tmp_path / "TAPE7"
    write_tape7(t7, [prof])
    assert " 99" in t7.read_text().splitlines()[2]

    # IFXTYP=2 -> writes IFIXTYPE; -2 -> reads it
    r31w = "    6    2    0    1    1   22    1 2"
    profw = atmpth([r31w] + CASE1_REST[1:3], 0.5, 1.0)
    assert (tmp_path / "IFIXTYPE").exists()
    r31r = "    6    2    0    1    1   22    1-2"
    profr = atmpth([r31r] + CASE1_REST[1:3], 0.5, 1.0)
    np.testing.assert_array_equal(profr.ityl, profw.ityl)
