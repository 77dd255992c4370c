"""Layering engine vs reference-computed ground truth.

`/root/reference/run/in/MONORTM_PROF.IN_sav` is the one piece of
reference-*generated* output shipped in this image: a TAPE7-dialect
layer file written by the Fortran LBLATM (lblatm.f90:1264-1340) for the
U.S. STANDARD atmosphere, H1=0 -> H2=20 km, ANGLE=0, NMOL=22 — its
header records the exact geometry.  Re-running the repo's layering
engine (MODEL=6, ITYPE=2, explicit ZBND taken from the file's own
boundary altitudes) must reproduce the reference's PBAR/TBAR, boundary
PZ/TZ, and all 22 molecular AMOUNTs + WBRODL.  This converts the
layering engine's closure tests into a true oracle comparison.
"""

from pathlib import Path

import numpy as np
import pytest

from monortm_tpu.io.profin import read_profiles

SAV = Path("/root/reference/run/in/MONORTM_PROF.IN_sav")

pytestmark = pytest.mark.skipif(not SAV.exists(),
                                reason="reference _sav file not present")


@pytest.fixture(scope="module")
def ref_prof():
    return read_profiles(SAV)[0]


@pytest.fixture(scope="module")
def our_prof(ref_prof):
    from monortm_tpu.atmos.tape5_atm import atmpth
    altz = ref_prof.meta.altz
    rec31 = (f"{6:5d}{2:5d}{len(altz):5d}{0:5d}{0:5d}{22:5d}{1:5d}")
    rec32 = f"{0.0:10.4f}{20.0:10.4f}{0.0:10.4f}"
    zlines = []
    for i in range(0, len(altz), 8):
        zlines.append("".join(f"{z:10.3f}" for z in altz[i:i + 8]))
    return atmpth([rec31, rec32] + zlines, v1=0.2, v2=1.2)


def test_layer_count_and_boundaries(ref_prof, our_prof):
    st, rst = our_prof.state, ref_prof.state
    assert st.t.shape == rst.t.shape == (19,)
    np.testing.assert_allclose(our_prof.meta.altz, ref_prof.meta.altz,
                               atol=5e-4)
    # hydrostatic boundary pressures from the built-in US-std profile
    # (CMPALT-free path: model levels carry z already); reference prints
    # 6 significant digits
    np.testing.assert_allclose(our_prof.meta.pz, ref_prof.meta.pz,
                               rtol=2e-4)
    np.testing.assert_allclose(st.tz, rst.tz, atol=0.01)


def test_pbar_tbar(ref_prof, our_prof):
    np.testing.assert_allclose(our_prof.state.p, ref_prof.state.p,
                               rtol=2e-4)
    np.testing.assert_allclose(our_prof.state.t, ref_prof.state.t,
                               atol=0.01)


def test_amounts_all_molecules(ref_prof, our_prof):
    """All 22 molecule columns + the broadening column, every layer.

    The file carries 8 significant digits; the Curtis-Godson sums are
    path integrals of interpolated profiles, so rtol 1e-3 proves the
    same raytrace/quadrature, not just the same inputs."""
    wkl = np.asarray(our_prof.state.wkl)[:, :22]
    ref = np.asarray(ref_prof.state.wkl)[:, :22]
    np.testing.assert_allclose(wkl, ref, rtol=1e-3)
    # WBRODL is the ~1% residual of two ~1.7e24 quantities
    # (WN2L = RHOSUM - sum(AMOUNT), lblatm.f90:5991-5995), so the
    # +-4e-4 amount scatter from the file's 3-decimal ZBND rounding is
    # amplified ~100x; 2.5e-3 is the rounding-limited bound
    np.testing.assert_allclose(our_prof.state.wbrodl,
                               ref_prof.state.wbrodl, rtol=2.5e-3)


def test_airmass_consistency(ref_prof, our_prof):
    """Total column (all molecules + broadening) matches the reference
    within 0.1%% — the airmass-level closure on reference numbers."""
    tot = (np.asarray(our_prof.state.wkl)[:, :22].sum()
           + np.asarray(our_prof.state.wbrodl).sum())
    rtot = (np.asarray(ref_prof.state.wkl)[:, :22].sum()
            + np.asarray(ref_prof.state.wbrodl).sum())
    assert abs(tot / rtot - 1.0) < 1e-3
