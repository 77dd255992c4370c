"""Line-axis sharding (psum of partial line sums) == unsharded engine."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from monortm_tpu.ops.lineshape import (LineConfig, catalog_to_device,
                                       line_od_block)
from monortm_tpu.ops.tips import tips_scor
from monortm_tpu.parallel.linesharded import (line_od_linesharded,
                                              split_catalog_stack)
from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state


def _inputs(dtype):
    cat = synthetic_catalog_mw(n_h2o=24, n_o2=8, tile=64)
    wn64 = np.linspace(0.4, 50.0, 32)
    state = synthetic_state(nlay=3)
    t = jnp.asarray(state.t, dtype)
    scor = tips_scor(t, dtype=dtype).reshape(t.shape + (39 * 9,))
    return cat, wn64, state, scor


def test_linesharded_matches_unsharded_f64():
    dtype = jnp.float64
    cat, wn64, state, scor = _inputs(dtype)
    wn = jnp.asarray(wn64, dtype)

    dev = catalog_to_device(cat, dtype)
    want = np.asarray(line_od_block(
        dev, wn, None, jnp.asarray(state.p, dtype),
        jnp.asarray(state.t, dtype), jnp.asarray(state.wkl, dtype),
        jnp.asarray(state.wbrodl, dtype), scor, LineConfig(), 22, dtype))

    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("line",))
    stack = split_catalog_stack(cat, 4, dtype)
    got = np.asarray(line_od_linesharded(
        stack, wn, None, state, scor, LineConfig(), 22, mesh,
        dtype=dtype))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-300)


def test_linesharded_matches_unsharded_f32_split():
    dtype = jnp.float32
    cat, wn64, state, scor = _inputs(dtype)
    wn_hi = jnp.asarray(wn64.astype(np.float32))
    wn_lo = jnp.asarray((wn64 - wn64.astype(np.float32).astype(np.float64)
                         ).astype(np.float32))

    dev = catalog_to_device(cat, dtype)
    want = np.asarray(line_od_block(
        dev, wn_hi, (wn_hi, wn_lo), jnp.asarray(state.p, dtype),
        jnp.asarray(state.t, dtype), jnp.asarray(state.wkl, dtype),
        jnp.asarray(state.wbrodl, dtype),
        jnp.asarray(scor, dtype), LineConfig(), 22, dtype))

    mesh = Mesh(np.asarray(jax.devices("cpu")[:4]), ("line",))
    stack = split_catalog_stack(cat, 4, dtype)
    got = np.asarray(line_od_linesharded(
        stack, wn_hi, (wn_hi, wn_lo), state, scor, LineConfig(), 22,
        mesh, dtype=dtype))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6 * scale)
