"""All-Lorentz XLA engine (ops/linesum_lorentz.py): exactness predicate,
equality with the dense XLA engine in the Lorentz regime, and the
fixed-shape mesh path.

The engine is the documented Pallas-floor lifter for the common
microwave regime (BENCH_NOTES.md; modm.f90:419-431): at zeta > 0.99
every lane of the full kernel takes the identical Lorentz expressions,
so the lean sweep must agree to f32 roundoff.  pipeline.run selects it
per chunk via ODModel.all_lorentz on TPU backends.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monortm_tpu.models.od import ODModel
from monortm_tpu.parallel.sharding import make_mesh
from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state
from monortm_tpu.types import LayerState


def _state(p_top, nlay=4, batch=None):
    st = synthetic_state(nlay=nlay, batch=batch)
    p = np.geomspace(1000.0, p_top, nlay)
    if batch:
        p = np.broadcast_to(p, (batch, nlay))
    st = LayerState(p=p, t=st.t, tz=st.tz, wkl=st.wkl,
                    wbrodl=st.wbrodl, clw=st.clw)
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), st)


def _models(mesh=None, engine="pallas"):
    wn = np.linspace(0.3, 55.0, 192)
    cat = synthetic_catalog_mw(n_h2o=128, n_o2=64, tile=64)
    return ODModel(wn, 0.25, cat, nmol=22, dtype=jnp.float32,
                   wn_tile=32, line_tile=64, use_pallas=True,
                   pallas_wn_tile=128, pallas_line_tile=128,
                   pallas_engine=engine, mesh=mesh)


def test_predicate_splits_regimes():
    m = _models()
    hi_p = _state(400.0)     # troposphere only: zeta > 0.99 everywhere
    lo_p = _state(50.0)      # stratospheric top: Doppler matters
    assert bool(jax.jit(m.all_lorentz)(hi_p))
    assert not bool(jax.jit(m.all_lorentz)(lo_p))


def test_lorentz_engine_matches_full_in_regime():
    """Where the predicate holds, the Lorentz sweep equals both the
    Pallas kernel (interpret mode on CPU) and the dense XLA engine."""
    state = _state(400.0)
    sc = jnp.ones((4, 351), jnp.float32)
    mP = _models(engine="pallas")
    mL = _models(engine="lorentz-xla")
    lP = np.asarray(mP.line_od_pallas(state, sc))
    lL = np.asarray(mL.line_od_pallas(state, sc))
    np.testing.assert_allclose(lL, lP, rtol=2e-5, atol=1e-11)
    lX = np.asarray(mP.line_od(state, sc))
    np.testing.assert_allclose(lL, lX, rtol=2e-5, atol=1e-11)


def test_engine_override_at_call_time():
    """ODModel.__call__(engine=...) overrides the constructed engine —
    the hook pipeline.run uses for per-chunk dispatch."""
    state = _state(400.0)
    m = _models(engine="pallas")
    odP = m(state)
    odL = m(state, engine="lorentz-xla")
    np.testing.assert_allclose(np.asarray(odL.od_total),
                               np.asarray(odP.od_total),
                               rtol=2e-5, atol=1e-11)


def test_lorentz_mesh_bitwise():
    """The (prof, wn) shard_map path returns bitwise-identical results
    to the unsharded sweep (fixed-shape per-tile bodies)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(n_prof=2, n_wn=4)
    state = _state(400.0, batch=4)
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("prof", *(None,) * (x.ndim - 1)))),
        state)
    sc = jnp.ones((4, 4, 351), jnp.float32)

    m0 = _models(engine="lorentz-xla")
    mM = _models(engine="lorentz-xla", mesh=mesh)
    l0 = np.asarray(jax.jit(m0.line_od_pallas)(state, sc))
    lM = np.asarray(jax.jit(mM.line_od_pallas)(sharded, sc))
    np.testing.assert_array_equal(l0, lM)
    out = jax.jit(mM.line_od_pallas)(sharded, sc)
    assert len({s.device for s in out.addressable_shards}) == 8


def test_hybrid_layer_split_matches_full():
    """engine="hybrid" sweeps the Lorentz-clean layers through the lean
    engine and the rest through the full kernel; results must equal the
    full-kernel sweep to f32 roundoff on a mixed-regime state."""
    state = _state(50.0, nlay=6)        # top layers fail zeta > 0.99
    sc = jnp.ones((6, 351), jnp.float32)
    m = _models(engine="pallas")
    rows = np.asarray(jax.jit(
        lambda s: m.all_lorentz(s, per_layer=True))(state))
    assert rows.any() and not rows.all()     # genuinely mixed
    lor = tuple(np.nonzero(rows)[0].tolist())
    lP = np.asarray(m.line_od_pallas(state, sc))
    lH = np.asarray(m.line_od_pallas(state, sc, engine="hybrid",
                                     lor_layers=lor))
    np.testing.assert_allclose(lH, lP, rtol=2e-5, atol=1e-11)
    # layers outside the split ran the identical kernel: bitwise equal
    voigt = [i for i in range(6) if i not in lor]
    np.testing.assert_array_equal(lH[voigt], lP[voigt])


def test_lorentz_engine_is_differentiable():
    """The lean engine is plain XLA, so retrieval-style adjoints work
    through it directly (the Pallas kernel has no VJP) — and at TPU
    speed, since it avoids both the kernel and the dense XLA engine's
    compile blowup.  Gradients must match the dense engine."""
    state = _state(400.0)
    emis = jnp.full((64,), 0.95, jnp.float32)
    refl = 1.0 - emis
    tsfc = jnp.float32(288.0)

    def make_loss(engine):
        import dataclasses as dc
        from monortm_tpu.models.monortm import MonoRTM
        wn = np.linspace(0.3, 55.0, 64)
        cat = synthetic_catalog_mw(n_h2o=48, n_o2=24, tile=64)
        m = MonoRTM(wn, 0.25, cat, nmol=22, dtype=jnp.float32,
                    wn_tile=32, line_tile=64, use_pallas=engine is not None,
                    pallas_wn_tile=128, pallas_line_tile=128,
                    pallas_engine=engine or "pallas")

        def loss(t):
            st = dc.replace(state, t=t)
            return jnp.sum(m.tb(st, tsfc, emis, refl, irt=3,
                                engine=engine))
        return loss

    loss = make_loss("lorentz-xla")
    gL = np.asarray(jax.jit(jax.grad(loss))(state.t))
    assert np.isfinite(gL).all() and np.abs(gL).max() > 0
    # spot-check against central differences (forward-only evals keep
    # this cheap; the dense engine's full adjoint is covered in
    # tests/test_sharding.py)
    f = jax.jit(loss)
    t0 = np.asarray(state.t)
    for il in (0, 2):
        # f32 loss (~1.6e4) has ~1e-3 absolute noise; a 1 K step keeps
        # the differenced signal ~2.7 well above it
        eps = 1.0
        tp, tm = t0.copy(), t0.copy()
        tp[il] += eps
        tm[il] -= eps
        fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) \
            / (2 * eps)
        np.testing.assert_allclose(gL[il], fd, rtol=3e-2, atol=1e-4)


def test_dispatch_boundary_zeta():
    """A layer whose lines straddle the zeta = 0.99 switch
    (modm.f90:427), dispatched BOTH ways: |dTb| must stay inside the
    TPU golden budget (0.05 K, tests/test_tpu_golden.py).  This converts
    the pipeline's cross-backend-predicate argument (a CPU-evaluated
    predicate choosing engines for TPU kernels) into evidence: even if a
    boundary lane flips engines, the answer moves less than the budget,
    because at the switch the SD-Voigt and Lorentz shapes agree to ~1%
    — the reference's own discontinuity."""
    from monortm_tpu.models.monortm import MonoRTM
    wn = np.linspace(0.3, 55.0, 64)
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=24, tile=64)
    m = MonoRTM(wn, 0.25, cat, nmol=22, dtype=jnp.float32, wn_tile=32,
                line_tile=64, use_pallas=True, pallas_wn_tile=128,
                pallas_line_tile=128)
    full = synthetic_state(nlay=4)
    base = LayerState(p=np.asarray(full.p)[:1], t=np.asarray(full.t)[:1],
                      tz=np.asarray(full.tz)[:2],
                      wkl=np.asarray(full.wkl)[:1],
                      wbrodl=np.asarray(full.wbrodl)[:1],
                      clw=np.asarray(full.clw)[:1])
    # boost absorber columns so the boundary-pressure layer still has
    # non-negligible OD (otherwise the assertion would be vacuous)
    wkl = np.asarray(base.wkl) * 200.0
    pred = jax.jit(lambda s: m.od_model.all_lorentz(s, per_layer=True))

    def with_p(scale):
        return LayerState(p=np.asarray(base.p) * scale, t=base.t,
                          tz=base.tz, wkl=wkl, wbrodl=base.wbrodl,
                          clw=np.zeros_like(np.asarray(base.clw)))

    lo, hi = 1e-4, 1.0
    assert not bool(np.asarray(pred(with_p(lo)))[0])
    assert bool(np.asarray(pred(with_p(hi)))[0])
    for _ in range(30):
        mid = float(np.sqrt(lo * hi))
        if bool(np.asarray(pred(with_p(mid)))[0]):
            hi = mid
        else:
            lo = mid
    # just below the flip: the honest dispatch keeps the full kernel; a
    # cross-backend ulp flip would pick the lean engine instead
    st = with_p(lo)
    emis = jnp.full((len(wn),), 0.95, jnp.float32)
    refl = 1.0 - emis
    od = m.od_model(st, engine="pallas").od_total
    assert float(jnp.abs(od).max()) > 0.1      # non-vacuous check
    tb_p = np.asarray(m.tb(st, 288.0, emis, refl, irt=3,
                           engine="pallas"))
    tb_l = np.asarray(m.tb(st, 288.0, emis, refl, irt=3,
                           engine="lorentz-xla"))
    d = np.abs(tb_p - tb_l).max()
    assert d < 0.05, f"boundary dispatch moved Tb by {d} K"


def test_line_sharded_lorentz_and_hybrid():
    """2x2x2 (prof, wn, line) mesh: the lean engine contracts its
    candidate columns over "line" with one psum (like the Pallas
    kernel), so hybrid dispatch now composes with line-sharded meshes
    (VERDICT r4 weak #3).  Both must match the unsharded sweep.  The
    psum reorders the candidate-tile addition, so equality is to f32
    roundoff, not bitwise (the bitwise guarantee is for (prof, wn)
    meshes, test_lorentz_mesh_bitwise)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(n_prof=2, n_wn=2, n_line=2)
    state = _state(50.0, nlay=6, batch=2)       # mixed zeta regime
    sharded = jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P("prof", *(None,) * (x.ndim - 1)))),
        state)
    sc = jnp.ones((2, 6, 351), jnp.float32)

    m0 = _models(engine="pallas")
    mM = _models(engine="pallas", mesh=mesh)

    # lean engine: sharded == unsharded
    l0 = np.asarray(jax.jit(lambda s, c: m0.line_od_pallas(
        s, c, engine="lorentz-xla"))(state, sc))
    lM = np.asarray(jax.jit(lambda s, c: mM.line_od_pallas(
        s, c, engine="lorentz-xla"))(sharded, sc))
    scale = max(np.abs(l0).max(), 1e-30)
    np.testing.assert_allclose(lM, l0, rtol=2e-5, atol=2e-6 * scale)

    # hybrid dispatch on the line-sharded mesh == full kernel unsharded
    rows = np.asarray(jax.jit(
        lambda s: m0.all_lorentz(s, per_layer=True))(state)).all(axis=0)
    assert rows.any() and not rows.all()
    lor = tuple(np.nonzero(rows)[0].tolist())
    lP = np.asarray(jax.jit(m0.line_od_pallas)(state, sc))
    lH = np.asarray(jax.jit(lambda s, c: mM.line_od_pallas(
        s, c, engine="hybrid", lor_layers=lor))(sharded, sc))
    np.testing.assert_allclose(lH, lP, rtol=2e-5, atol=2e-6 * scale)
