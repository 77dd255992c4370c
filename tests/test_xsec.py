"""Cross-section subsystem tests with synthetic FSCDXS + xs data files
(the reference's cross-sections submodule is not present in this snapshot).
"""

import math

import numpy as np
import pytest

from monortm_tpu import constants as cst
from monortm_tpu.io.fscdxs import (XsSpectrum, alias_index, read_fscdxs,
                                   read_xs_file)
from monortm_tpu.ops.xsec import convolve, xsec_od, _radfn


def _write_xs(path, name, v1, v2, npts, temp, pres, data, torr=False):
    unit = "      TORR" if torr else "        MB"
    hdr = (f"{name:<10s}{v1:10.4f}{v2:10.4f}{npts:10d}{temp:10.3g}"
           f"{pres:10.3g}{1.0:10.3g}" + " " * 10 + " " * 10 + unit)
    rows = [hdr]
    for i in range(0, npts, 5):
        rows.append(" ".join(f"{x:12.5e}" for x in data[i:i + 5]))
    path.write_text("\n".join(rows) + "\n")


@pytest.fixture
def xs_setup(tmp_path):
    # synthetic CCL4 cross-section: smooth Gaussian bump over 780-820 cm^-1
    v1, v2, npts = 780.0, 820.0, 401
    vv = np.linspace(v1, v2, npts)
    for temp, pres, fn in ((216.0, 170.0, "CCL4_T216"),
                           (296.0, 760.0, "CCL4_T296")):
        # stored values are plain cross-sections (cm^2/molec); the
        # radfn divide/re-apply in xsec_od is a temperature correction
        amp = 1.0e-18 * (1.0 + (296.0 - temp) / 296.0)
        data = amp * np.exp(-((vv - 800.0) / 8.0) ** 2)
        xsd = tmp_path / "xs"
        xsd.mkdir(exist_ok=True)
        _write_xs(xsd / fn, "CCL4", v1, v2, npts, temp, pres, data,
                  torr=True)
    fscdxs = "\n".join([
        " header", " header2",
        f"{'CCL4':<10s}{780.0:10.4f}{820.0:10.4f}{0.1:10.8f}{2:5d}"
        + " " * 5 + f"{91:5d}N" + " " * 4 + f"{'CCL4_T216':<10s}{'CCL4_T296':<10s}",
        "%",
    ])
    (tmp_path / "FSCDXS").write_text(fscdxs + "\n")
    return tmp_path


def test_alias_index():
    assert alias_index("CCL4") == 4
    assert alias_index("F11") == 5
    assert alias_index("CFC12") == 6
    with pytest.raises(KeyError):
        alias_index("XYZ")


def test_read_fscdxs(xs_setup):
    idx = read_fscdxs(xs_setup / "FSCDXS", ["CCL4"], 790.0, 810.0)
    assert idx.indices == [4]
    regs = idx.regions[0]
    assert len(regs) == 1
    assert regs[0].v1x == 780.0 and len(regs[0].files) == 2
    assert regs[0].xdoplr > 0


def test_read_xs_file_torr_conversion(xs_setup):
    s = read_xs_file(xs_setup / "xs" / "CCL4_T296")
    assert s.npts == 401
    np.testing.assert_allclose(s.pres, 760.0 * 1013.0 / 760.0)


def test_xsec_od_physics(xs_setup):
    idx = read_fscdxs(xs_setup / "FSCDXS", ["CCL4"], 780.0, 820.0)
    spectra = {f: read_xs_file(xs_setup / "xs" / f)
               for f in idx.regions[0][0].files}
    wn = np.asarray([790.0, 800.0, 810.0, 830.0])
    p = np.asarray([900.0, 300.0])
    t = np.asarray([280.0, 230.0])
    xamnt = np.asarray([[1.0e15, 5.0e14]])
    od = xsec_od(idx, spectra, wn, p, t, xamnt)
    assert od.shape == (2, 4)
    # outside the band: zero
    np.testing.assert_allclose(od[:, 3], 0.0)
    # peak at 800, symmetric-ish falloff
    assert od[0, 1] > od[0, 0] > 0
    assert od[0, 1] > od[0, 2] > 0
    # magnitude: sigma ~1e-18 cm^2 * 1e15 cm^-2 ~ 1e-3
    assert 1e-4 < od[0, 1] < 1e-2
    # second layer has half the amount
    assert od[1, 1] < od[0, 1]


def test_convolve_preserves_smooth_spectrum():
    # broad smooth spectrum: pressure convolution ~ identity
    v1, v2, dv = 100.0, 140.0, 0.1
    npts = int((v2 - v1) / dv) + 1
    vv = v1 + dv * np.arange(npts)
    spec = np.exp(-((vv - 120.0) / 10.0) ** 2)
    wn = np.asarray([115.0, 120.0, 125.0])
    out = convolve(spec, v1, v2, dv, 200.0, 1e-4, 280.0, 1000.0, wn)
    want = np.exp(-((wn - 120.0) / 10.0) ** 2)
    np.testing.assert_allclose(out, want, rtol=0.05)
