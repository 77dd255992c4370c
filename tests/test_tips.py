"""TIPS partition-sum recall tests (tables + Lagrange interpolation)."""

import numpy as np
import jax.numpy as jnp

from monortm_tpu.data import loader
from monortm_tpu.ops.tips import tips_scor, tips_scor_numpy


def test_tables_shapes_and_values():
    t = loader.tips_tables()
    assert t["q"].shape == (39, 9, 119)
    assert t["tdat"][0] == 60.0 and t["tdat"][-1] == 3010.0
    # spot values straight from tips_2003.f90 DATA statements
    np.testing.assert_allclose(t["q"][0, 0, :3], [16.824, 27.771, 40.408])
    np.testing.assert_allclose(t["q"][1, 0, 0], 53.642)  # CO2 626 @60K
    # O2 (mol 7) has 3 isotopologues
    assert (t["q"][6, :3, 0] > 0).all() and (t["q"][6, 3:, 0] == 0).all()


def test_scor_at_reference_temperature_is_unity():
    scor = tips_scor_numpy(296.0)
    present = loader.tips_tables()["q"][..., 0] > 0
    np.testing.assert_allclose(scor[present], 1.0, rtol=1e-12)


def test_scor_device_matches_numpy():
    for temp in (200.3, 250.0, 296.0, 303.7, 77.0, 2995.0):
        got = np.asarray(tips_scor(jnp.float64(temp), dtype=jnp.float64))
        want = tips_scor_numpy(temp)
        # rtol 1e-7: axon-TPU f64 pow/Lagrange chains are emulated and
        # only bit-stable to ~1e-8 rel; exact 1e-12 parity holds on CPU.
        np.testing.assert_allclose(got, want, rtol=1e-7, err_msg=str(temp))


def test_scor_batched_over_layers():
    t = jnp.asarray([210.0, 250.0, 290.0])
    s = np.asarray(tips_scor(t, dtype=jnp.float64))
    assert s.shape == (3, 39, 9)
    np.testing.assert_allclose(s[1], tips_scor_numpy(250.0), rtol=1e-7)


def test_scor_monotone_sanity():
    # Q grows with T, so scor = Q(296)/Q(T) should be > 1 below 296 K
    s = tips_scor_numpy(230.0)
    present = loader.tips_tables()["q"][..., 0] > 0
    assert (s[present] > 1.0).all()
