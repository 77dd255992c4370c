"""Continuum plan validation against the NumPy transliteration oracle."""

import numpy as np
import jax.numpy as jnp

from monortm_tpu.ops.continuum import ContinuumPlan, ContinuumFactors
from tests.reference_continuum import continuum_ref


def _layer():
    pave, tave, wbroad = 830.0, 262.5, 1.1e24
    wk = np.zeros(39)
    wk[0] = 6.0e21   # H2O
    wk[1] = 5.0e20   # CO2
    wk[2] = 4.5e16   # O3
    wk[6] = 3.0e23   # O2
    return pave, tave, wk, wbroad


def _compare(wn, dvset, nmol=22, rtol=1e-10):
    pave, tave, wk, wbroad = _layer()
    plan = ContinuumPlan(np.asarray(wn), dvset=dvset, nmol=nmol)
    got = plan(jnp.float64(pave), jnp.float64(tave),
               jnp.asarray(wk), jnp.float64(wbroad), dtype=jnp.float64)
    want = continuum_ref(wn, dvset, pave, tave, wk, wbroad, nmol)
    for sp in ("h2o", "co2", "o2", "n2", "rayleigh"):
        # rayleigh divides by radfn on-device; the TPU f64 emulation of that
        # chain is good to ~1e-7 (production precision is f32 regardless)
        tol = 3e-7 if sp == "rayleigh" else rtol
        np.testing.assert_allclose(
            np.asarray(got[sp]), want[sp], rtol=tol, atol=1e-30,
            err_msg=f"{sp} wn[0]={wn[0]}")


def test_microwave_window_gridded():
    # case-1-like grid: 0.2..1.2 cm^-1 @ 0.01 (h2o self/frgn + n2 rt active)
    wn = 0.2 + 0.01 * np.arange(101)
    _compare(wn, dvset=0.01)


def test_microwave_explicit_wavenumbers():
    # case-4-like: explicit channel list (dvset=0 per-point XINT)
    wn = np.asarray([0.789344, 0.79828, 1.043027, 1.051763])
    _compare(wn, dvset=0.0)


def test_submm_window():
    wn = 25.0 + 0.1 * np.arange(301)   # 25..55 cm^-1
    _compare(wn, dvset=0.1)


def test_ir_window_o2_co2():
    wn = 1400.0 + 0.5 * np.arange(201)  # O2 fundamental + CO2 + H2O
    _compare(wn, dvset=0.5)


def test_rayleigh_window():
    wn = 900.0 + 1.0 * np.arange(50)
    _compare(wn, dvset=1.0)


def test_batched_layers_match_loop():
    pave, tave, wk, wbroad = _layer()
    wn = 0.2 + 0.01 * np.arange(101)
    plan = ContinuumPlan(wn, dvset=0.01, nmol=22)
    paves = jnp.asarray([pave, 1000.0])
    taves = jnp.asarray([tave, 288.0])
    wks = jnp.stack([jnp.asarray(wk), jnp.asarray(wk) * 1.7])
    wbs = jnp.asarray([wbroad, wbroad * 0.8])
    got = plan(paves, taves, wks, wbs, dtype=jnp.float64)
    want1 = continuum_ref(wn, 0.01, 1000.0, 288.0, wk * 1.7, wbroad * 0.8, 22)
    for sp in ("h2o", "n2"):
        assert got[sp].shape == (2, 101)
        np.testing.assert_allclose(np.asarray(got[sp][1]), want1[sp],
                                   rtol=1e-10, atol=1e-30)


def test_factors_scale_linearly():
    pave, tave, wk, wbroad = _layer()
    wn = 0.2 + 0.01 * np.arange(11)
    p1 = ContinuumPlan(wn, dvset=0.01, nmol=22)
    p2 = ContinuumPlan(wn, dvset=0.01, nmol=22,
                       factors=ContinuumFactors(xself=2.0))
    a = p1(pave, tave, jnp.asarray(wk), wbroad, dtype=jnp.float64)
    b = p2(pave, tave, jnp.asarray(wk), wbroad, dtype=jnp.float64)
    # self component doubles; foreign unchanged -> h2o strictly increases
    assert np.all(np.asarray(b["h2o"]) > np.asarray(a["h2o"]))
