"""Pallas line-sum kernel vs the validated jnp line engine (f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monortm_tpu.ops.lineshape import LineConfig, catalog_to_device, line_od_block
from monortm_tpu.ops.linesum_pallas import line_od_pallas
from monortm_tpu.ops.tips import tips_scor
from monortm_tpu.testing import synthetic_catalog_mw


@pytest.fixture(scope="module")
def setup():
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=16, tile=128)
    dev = catalog_to_device(cat, jnp.float32)
    wn64 = np.linspace(0.4, 50.0, 128)
    L = 4
    p = jnp.asarray(np.geomspace(1000.0, 200.0, L), jnp.float32)
    t = jnp.asarray(np.linspace(288.0, 225.0, L), jnp.float32)
    wk = np.zeros((L, 39))
    wk[:, 0] = np.geomspace(6e21, 1e19, L)
    wk[:, 6] = np.geomspace(4e23, 9e22, L)
    wk[:, 21] = np.geomspace(1.5e24, 3.4e23, L)
    wk = jnp.asarray(wk, jnp.float32)
    wb = jnp.asarray(np.geomspace(2e22, 5e21, L), jnp.float32)
    scor = tips_scor(t, dtype=jnp.float32).reshape(L, -1)
    return cat, dev, wn64, p, t, wk, wb, scor


def _reference(dev, wn64, p, t, wk, wb, scor):
    wn_hi = wn64.astype(np.float32)
    wn_lo = (wn64 - wn_hi.astype(np.float64)).astype(np.float32)
    return line_od_block(dev, jnp.asarray(wn_hi), (jnp.asarray(wn_hi),
                                                   jnp.asarray(wn_lo)),
                         p, t, wk, wb, scor, LineConfig(), 39,
                         jnp.float32)


def test_pallas_matches_jnp_engine(setup):
    cat, dev, wn64, p, t, wk, wb, scor = setup
    want = np.asarray(_reference(dev, wn64, p, t, wk, wb, scor))
    got = np.asarray(line_od_pallas(dev, wn64, p, t, wk, wb, scor,
                                    LineConfig(), 39, line_tile=128))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6 * scale)


def test_pallas_jit_and_grad(setup):
    cat, dev, wn64, p, t, wk, wb, scor = setup

    @jax.jit
    def total(t_):
        sc = tips_scor(t_, dtype=jnp.float32).reshape(t_.shape[0], -1)
        od = line_od_pallas(dev, wn64, p, t_, wk, wb, sc,
                            LineConfig(), 39, line_tile=128)
        return jnp.sum(od)

    v = total(t)
    assert np.isfinite(float(v))


def test_odmodel_pallas_integration(setup):
    """ODModel(use_pallas=True) matches the XLA engine end-to-end,
    including wn-grid padding and per-molecule attribution."""
    from monortm_tpu.models.od import ODModel
    from monortm_tpu.testing import synthetic_state

    cat, dev, wn64, p, t, wk, wb, scor = setup
    wn = np.linspace(0.4, 50.0, 96)      # not a multiple of wn_tile
    kw = dict(dvset=0.05, catalog=cat, nmol=22, dtype=jnp.float32,
              wn_tile=32, line_tile=128)
    m_ref = ODModel(wn, **kw)
    m_pl = ODModel(wn, use_pallas=True, **kw)
    state = synthetic_state(nlay=4)
    want = m_ref(state)
    got = m_pl(state)
    scale = float(jnp.abs(want.od_total).max())
    np.testing.assert_allclose(np.asarray(got.od_total),
                               np.asarray(want.od_total),
                               rtol=2e-5, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(got.od_by_mol),
                               np.asarray(want.od_by_mol),
                               rtol=2e-5, atol=2e-6 * scale)
