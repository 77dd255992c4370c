"""Native C++ host kernels vs their Python fallback oracles.

The layering docstrings designate the Python walks as "the oracle" for
the C++ fast paths (monortm_tpu/native); these tests actually run both
on the same inputs — including tolerance-edge boundaries that exercise
the snap cascade — and require bitwise equality (ADVICE r2 item 1).
"""

import numpy as np
import pytest

from monortm_tpu import native
from monortm_tpu.atmos import layering as lay


@pytest.fixture(scope="module")
def engine():
    prof = lay.load_model_atmosphere(6, 7)
    return lay.PathEngine(prof, 0.7, 6371.23, 7)


def _amerge_both(engine, monkeypatch, h1, h2, hmin, zbnd):
    """(native result, fallback result) for one amerge call."""
    res_nat = engine.amerge(h1, h2, hmin, 0, np.asarray(zbnd))
    with monkeypatch.context() as m:
        m.setattr(native, "amerge_walk", lambda *a, **k: None)
        res_py = engine.amerge(h1, h2, hmin, 0, np.asarray(zbnd))
    return res_nat, res_py


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("zbnd", [
    # plain boundaries between model levels
    [0.0, 0.7, 1.4, 2.1, 5.0, 12.0, 20.0],
    # tol-coincident boundaries: within 5e-4 km of model levels (1, 2,
    # 25 km) so the snap branch and its cascade into later comparisons
    # fire; plus an hmid-adjacent point
    [0.0, 0.99995, 2.00004, 3.0003, 24.99961, 25.0, 30.0],
    # boundary list denser than model levels near the surface
    [0.0, 0.1, 0.2, 0.3, 0.5, 1.0, 1.00049, 2.0, 10.0],
])
def test_amerge_native_vs_fallback_bitwise(engine, monkeypatch, zbnd):
    h1, h2 = zbnd[0], zbnd[-1]
    nat, py = _amerge_both(engine, monkeypatch, h1, h2, min(h1, h2), zbnd)
    # (zpth, pp, tp, rf, denp, zout, iphmid, h1, h2, hmid)
    names = ("zpth", "pp", "tp", "rf", "denp", "zout", "iphmid",
             "h1", "h2", "hmid")
    assert len(nat) == len(py)
    for name, a, b in zip(names, nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {name}")


@pytest.mark.skipif(not native.available(), reason="native lib not built")
@pytest.mark.parametrize("with_minus5", [False, True])
def test_group_resolve_native_vs_python(with_minus5):
    """The native C++ GET_LNFL/LINES-walk catalog resolve must agree
    field-for-field with the pure-Python group+resolve on catalogs with
    coupling rows (incl. the -5 first-of-block quirk)."""
    from monortm_tpu.lines import group, resolve
    from tests.test_lines import synthetic_raw

    raw = synthetic_raw(with_minus5=with_minus5)
    nat = native.group_resolve_lines(raw)
    assert nat is not None
    py = resolve(group(raw))
    for f in nat.__dataclass_fields__:
        a, b = getattr(nat, f), getattr(py, f)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {f}")


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_amerge_native_walk_direct_tol_edges(engine):
    """Direct kernel call on both sides of the snap threshold: a
    boundary 2*tol from a model level keeps both points; one inside tol
    absorbs the model level (the walk snaps ZMDL to ZOUT,
    lblatm.f90:5200-5210)."""
    prof = engine.prof
    tol = 5.0e-4
    b1 = 1.0 + 2.0 * tol            # outside tol: both points survive
    b2 = 2.0 + 0.999 * tol          # inside tol: model level absorbed
    zbnd = np.asarray([0.0, b1, b2, 20.0])
    res = native.amerge_walk(prof.zmdl, prof.pm, prof.tm, prof.rfndxm,
                             zbnd, 0.0, 0.0, tol)
    assert res is not None
    zpth = res[0].tolist()
    assert 1.0 in zpth and b1 in zpth
    assert b2 in zpth and 2.0 not in zpth
