"""NetCDF writer (USENETCDF path, monortm_sub.F90:698-778) roundtrip."""

from types import SimpleNamespace

import numpy as np

from monortm_tpu.io.output import write_netcdf


def _fake_result(nwn=5, nlay=3):
    rng = np.random.default_rng(0)
    od_by_mol = np.zeros((nwn, 39, nlay))
    od_by_mol[:, 0] = rng.uniform(0.1, 1.0, (nwn, nlay))   # H2O
    od_by_mol[:, 6] = rng.uniform(0.01, 0.1, (nwn, nlay))  # O2
    oc = {k: rng.uniform(0, 0.01, (nlay, nwn))
          for k in ("h2o", "co2", "o3", "o2", "n2", "rayleigh")}
    od_total = od_by_mol.sum(axis=1) + sum(
        v.T for v in oc.values())
    od = SimpleNamespace(od_by_mol=od_by_mol, od_total=od_total, oc=oc,
                         od_xsec=None)
    rt = SimpleNamespace(tb=rng.uniform(100, 300, nwn),
                         tmr=rng.uniform(200, 280, nwn),
                         rad=rng.uniform(1e-8, 1e-6, nwn),
                         trtot=rng.uniform(0, 1, nwn))
    res = SimpleNamespace(od=od, rt=rt,
                          emis=np.full(nwn, 0.95), refl=np.full(nwn, 0.05))
    wkl = np.zeros((nlay, 39)); wkl[:, 0] = 1e22; wkl[:, 6] = 4e23
    state = SimpleNamespace(wkl=wkl, wbrodl=np.full(nlay, 2e22))
    meta = SimpleNamespace(nmol=22, angle=0.0)
    return res, state, meta


def test_netcdf_roundtrip(tmp_path):
    from scipy.io import netcdf_file
    res, state, meta = _fake_result()
    p = tmp_path / "MONORTM.00001.nc"
    wn = np.linspace(0.5, 2.5, 5)
    write_netcdf(p, 1, wn, res, state, meta, pwv=1.23, clw_col=0.0,
                 tsfc=288.0, angle=0.0)
    with netcdf_file(str(p), "r") as nc:
        assert nc.dimensions["FREQUENCY"] == 5
        assert nc.dimensions["LAYERS"] == 3
        kount = nc.dimensions["MOLECULE"]
        assert kount == 2          # H2O and O2 have nonzero columns
        np.testing.assert_allclose(nc.variables["FREQUENCY"][:], wn)
        np.testing.assert_allclose(nc.variables["BT"][:], res.rt.tb)
        tot = nc.variables["TOTAL_OD"][:]
        np.testing.assert_allclose(tot, res.od.od_total.sum(-1))
        lodm = nc.variables["LAYER_OPTICAL_DEPTH_BY_MOLECULE"][:]
        assert lodm.shape == (5, kount, 3)
        # H2O slot = line OD + its continuum
        want = res.od.od_by_mol[:, 0] + res.od.oc["h2o"].T
        np.testing.assert_allclose(lodm[:, 0], want, rtol=1e-6)
        names = [bytes(nc.variables["MOLECULE"][k]).decode().strip()
                 for k in range(kount)]
        assert names[0] == "H2O" and "O2" in names
