"""Pallas line-sum kernel vs the validated jnp line engine (f32).

CPU runs exercise the kernel in interpret mode; set
MONORTM_TEST_PLATFORM=tpu to additionally compile the Mosaic kernel at
benchmark shapes on a real chip (guards the BENCH_r01 VMEM-OOM failure
mode).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monortm_tpu.models.od import ODModel
from monortm_tpu.ops.lineshape import LineConfig
from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

TOL = dict(rtol=2e-5)


def _models(wn, cat, **kw):
    base = dict(dvset=float(wn[1] - wn[0]), catalog=cat, nmol=22,
                dtype=jnp.float32, wn_tile=32, line_tile=128)
    base.update(kw)
    return (ODModel(wn, use_pallas=False, **base),
            ODModel(wn, use_pallas=True, **base))


def _check(m_ref, m_pl, state):
    want = m_ref(state)
    got = m_pl(state)
    scale = max(float(jnp.abs(want.od_total).max()), 1e-30)
    np.testing.assert_allclose(np.asarray(got.od_total),
                               np.asarray(want.od_total),
                               atol=2e-6 * scale, **TOL)
    np.testing.assert_allclose(np.asarray(got.od_by_mol),
                               np.asarray(want.od_by_mol),
                               atol=2e-6 * scale, **TOL)


def test_pallas_matches_xla_engine():
    """End-to-end ODModel equivalence, incl. wn padding + attribution."""
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=16, tile=128)
    wn = np.linspace(0.4, 50.0, 96)      # not a multiple of any tile
    m_ref, m_pl = _models(wn, cat)
    _check(m_ref, m_pl, synthetic_state(nlay=4))


def test_pallas_batched_profiles():
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=16, tile=128)
    wn = np.linspace(0.4, 50.0, 64)
    m_ref, m_pl = _models(wn, cat)
    _check(m_ref, m_pl, synthetic_state(nlay=4, batch=3))


def test_pallas_ibrd():
    """IBRD=1 (species-specific broadening) rides the shared prologue."""
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=16, tile=128)
    # give some lines broadening data
    cat.brd_flg[::3, :3] = 1
    cat.brd_hw[::3, :3] = 0.07
    cat.brd_tmp[::3, :3] = 0.7
    cat.brd_shft[::3, :3] = 0.01
    wn = np.linspace(0.4, 50.0, 64)
    m_ref, m_pl = _models(wn, cat, line_cfg=LineConfig(ibrd=1))
    _check(m_ref, m_pl, synthetic_state(nlay=4))


def test_pallas_far_detuned_tiles():
    """Far line tiles (all |d1| > 25 cm^-1, no O2): the candidate pruning
    and the in-kernel keep-mask skip paths must still match the XLA
    engine (ADVICE r1)."""
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=0, seed=3, tile=128)
    # shift all lines far above the grid
    cat.nu0[:] = cat.nu0 + 500.0
    cat.nu0_hi[:] = cat.nu0.astype(np.float32)
    cat.nu0_lo[:] = (cat.nu0 - cat.nu0_hi.astype(np.float64)).astype(
        np.float32)
    wn = np.linspace(0.4, 50.0, 64)
    m_ref, m_pl = _models(wn, cat)
    state = synthetic_state(nlay=4)
    _check(m_ref, m_pl, state)
    # and the result really is zero line OD
    got = m_pl(state)
    assert float(jnp.abs(got.od_by_mol).max()) == 0.0


def test_pallas_all_lorentz_and_voigt_regimes():
    """High pressure (zeta>0.99 everywhere -> all-Lorentz block skip) and
    near-vacuum (Voigt/SD-Voigt dominant) both match (ADVICE r1)."""
    cat = synthetic_catalog_mw(n_h2o=32, n_o2=16, tile=128)
    wn = np.linspace(0.4, 50.0, 64)
    m_ref, m_pl = _models(wn, cat)
    st = synthetic_state(nlay=4)
    hi = st.__class__(p=np.full_like(np.asarray(st.p), 1013.0), t=st.t,
                      tz=st.tz, wkl=st.wkl, wbrodl=st.wbrodl, clw=st.clw)
    lo = st.__class__(p=np.full_like(np.asarray(st.p), 0.02), t=st.t,
                      tz=st.tz, wkl=st.wkl, wbrodl=st.wbrodl, clw=st.clw)
    _check(m_ref, m_pl, hi)
    _check(m_ref, m_pl, lo)


def test_pallas_jit():
    cat = synthetic_catalog_mw(n_h2o=48, n_o2=16, tile=128)
    wn = np.linspace(0.4, 50.0, 64)
    _, m_pl = _models(wn, cat)
    state = synthetic_state(nlay=4)

    @jax.jit
    def total(s):
        return jnp.sum(m_pl(s).od_total)

    assert np.isfinite(float(total(state)))


def test_pallas_candidate_pruning_is_sparse():
    """A wide catalog against a narrow grid prunes most line tiles."""
    cat = synthetic_catalog_mw(n_h2o=512, n_o2=0, seed=5, tile=128)
    spread = np.linspace(0.0, 4000.0, len(cat.nu0))
    cat.nu0[:] = cat.nu0 + spread
    cat.nu0_hi[:] = cat.nu0.astype(np.float32)
    cat.nu0_lo[:] = (cat.nu0 - cat.nu0_hi.astype(np.float64)).astype(
        np.float32)
    wn = np.linspace(0.4, 50.0, 64)
    m = ODModel(wn, dvset=0.05, catalog=cat, nmol=22, dtype=jnp.float32,
                use_pallas=True, pallas_line_tile=128)
    n_tiles_total = m.pallas_cat["mol"].shape[0] // m.pallas_nt
    n_cand = m.pallas_cand_map.shape[1]
    assert n_cand < n_tiles_total, (n_cand, n_tiles_total)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-Mosaic check needs a TPU")
def test_pallas_compiles_at_bench_shapes():
    """Guards the BENCH_r01 failure: Mosaic compile + run at bench-scale
    shapes (W>=1024, n>=3584, L>=320) must fit scoped VMEM, and the
    compiled kernel must match the XLA engine (computed on CPU — the XLA
    engine compiles pathologically slowly on remote-compile TPU
    backends, and CPU is also the deterministic oracle)."""
    cat = synthetic_catalog_mw(n_h2o=2048, n_o2=1024, tile=512)
    wn = np.linspace(0.3, 55.0, 1024)
    m = ODModel(wn, dvset=float(wn[1] - wn[0]), catalog=cat, nmol=22,
                dtype=jnp.float32, use_pallas=True)
    state = synthetic_state(nlay=40, batch=8)
    scor = jnp.ones((8, 40, 39 * 9), jnp.float32)
    od = jax.jit(lambda s: m.line_od_pallas(s, scor))(state)
    od.block_until_ready()
    got = np.asarray(od)
    assert np.all(np.isfinite(got))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        m_ref = ODModel(wn, dvset=float(wn[1] - wn[0]), catalog=cat,
                        nmol=22, dtype=jnp.float32, use_pallas=False,
                        wn_tile=256, line_tile=512)
        want = np.asarray(jax.jit(lambda s: m_ref.line_od(s, scor))(state))
    # cross-BACKEND f32 tolerance: TPU and CPU f32 exp/pow differ by
    # ~1e-4 relative in the intensity/coupling precompute (measured; the
    # kernel itself matches the XLA engine to 2e-5 on one backend, see
    # the CPU interpret-mode tests above).  1e-3 OD relative error is
    # ~0.05 K in Tb — well inside the reference's own fast-TAPE3
    # accuracy budget (release_notes.txt:139-141).
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-4 * scale)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="capacity check needs a TPU")
def test_pallas_capacity_250k_lines_8k_wn():
    """Reference design capacity (250k lines/molecule, lnfl_mod.f90:5;
    NWN<=80000, RTMmono.f90:10): a 250k-line catalog against an 8192-point
    microwave grid must fit in memory, and the block-sparse candidate
    pruning must make the sweep sub-linear in far lines."""
    rng = np.random.default_rng(11)
    n = 250_000
    from monortm_tpu.io.tape3 import RawLines
    from monortm_tpu.lines import group, pack, resolve

    nu = np.sort(rng.uniform(0.5, 3000.0, n))
    raw = RawLines(
        vnu=nu,
        sp=10 ** rng.uniform(-27, -23, n).astype(np.float32),
        alfa=rng.uniform(0.04, 0.1, n).astype(np.float32),
        epp=rng.uniform(0, 700, n).astype(np.float32),
        mol=(1 + 100 * 1) * np.ones(n, np.int32),
        hwhm=rng.uniform(0.3, 0.5, n).astype(np.float32),
        tmpalf=rng.uniform(0.6, 0.8, n).astype(np.float32),
        pshift=rng.uniform(-0.02, 0.02, n).astype(np.float32),
        iflg=np.zeros(n, np.int32),
        brd_mol_flg=np.zeros((n, 7), np.int32),
        brd_mol_hw=np.zeros((n, 7), np.float32),
        brd_mol_tmp=np.zeros((n, 7), np.float32),
        brd_mol_shft=np.zeros((n, 7), np.float32),
        speed_dep=np.zeros(n, np.float32),
    )
    cat = pack(resolve(group(raw)), tile=512)

    wn = np.linspace(0.3, 55.0, 8192)
    m = ODModel(wn, dvset=float(wn[1] - wn[0]), catalog=cat, nmol=22,
                dtype=jnp.float32, use_pallas=True)
    # sub-linearity: the MW grid reaches only ~80/3000 of the catalog
    n_tiles = m.pallas_cat["mol"].shape[0] // m.pallas_nt
    n_cand = m.pallas_cand_map.shape[1]
    assert n_cand < n_tiles / 5, (n_cand, n_tiles)

    state = synthetic_state(nlay=40)
    scor = jnp.ones((40, 39 * 9), jnp.float32)
    od = jax.jit(lambda s: m.line_od_pallas(s, scor))(state)
    od.block_until_ready()
    assert np.all(np.isfinite(np.asarray(od)))


def test_segmented_candidate_map_matches_unsegmented(monkeypatch):
    """Beyond the SMEM budget the wn-tile axis splits into per-segment
    pallas_calls with trimmed candidate columns (the 80k-wn envelope
    path); forcing a tiny budget must not change a single bit."""
    from monortm_tpu.ops import linesum_pallas as lsp

    wn = np.linspace(0.3, 55.0, 640)
    cat = synthetic_catalog_mw(n_h2o=256, n_o2=128, tile=64)
    state = synthetic_state(nlay=4)
    state = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                   state)
    sc = jnp.ones((4, 351), jnp.float32)

    def build():
        return ODModel(wn, 0.1, cat, nmol=22, dtype=jnp.float32,
                       use_pallas=True, pallas_wn_tile=128,
                       pallas_line_tile=128)

    whole = np.asarray(build().line_od_pallas(state, sc))
    monkeypatch.setattr(lsp, "_SMEM_MAP_BUDGET", 64)   # force ~1 row/seg
    seg = np.asarray(build().line_od_pallas(state, sc))
    np.testing.assert_array_equal(whole, seg)


def test_chi_fn_hook():
    """CO2 chi-factor hook (modm.f90:1253-1290, identity in the
    reference): a constant chi=0.5 must halve the CO2 line OD and leave
    every other molecule bit-identical, in all three engines."""
    from monortm_tpu.lines import group, pack, resolve

    raw = synthetic_catalog_mw(n_h2o=48, n_o2=16, raw_lines=True)
    m = raw.mol % 100
    iso = raw.mol // 100
    sel = (m == 1) & (np.arange(len(raw.mol)) % 3 == 0)
    raw.mol[sel] = (2 + 100 * iso[sel]).astype(np.int32)
    cat = pack(resolve(group(raw)), tile=128)

    wn = np.linspace(0.4, 50.0, 64)
    state = synthetic_state(nlay=3)
    chi = lambda d: jnp.full_like(d, 0.5)

    def build(cfg, use_pallas):
        return ODModel(wn, dvset=float(wn[1] - wn[0]), catalog=cat,
                       nmol=22, dtype=jnp.float32, wn_tile=32,
                       line_tile=128, use_pallas=use_pallas,
                       line_cfg=cfg)

    for use_pallas, engine in [(False, None), (True, "pallas"),
                               (True, "lorentz-xla")]:
        m0 = build(LineConfig(), use_pallas)
        m1 = build(LineConfig(chi_fn=chi), use_pallas)
        a = np.asarray(m0(state, engine=engine).od_by_mol)  # [W, M, L]
        b = np.asarray(m1(state, engine=engine).od_by_mol)
        assert np.abs(a[:, 1, :]).max() > 0
        np.testing.assert_allclose(b[:, 1, :], 0.5 * a[:, 1, :],
                                   rtol=1e-6,
                                   err_msg=f"engine={engine}")
        keep = [i for i in range(a.shape[1]) if i != 1]
        np.testing.assert_array_equal(b[:, keep, :], a[:, keep, :],
                                      err_msg=f"engine={engine}")


def test_pallas_kernel_vjp():
    """The Pallas kernel now has a custom VJP (an adjoint block-sparse
    sweep over the REVERSE candidate map; VERDICT r4 missing #2):
    jax.grad through the FULL kernel — SD-Voigt/Humlicek machinery
    included — must match the dense XLA engine's autodiff and central
    differences on a state with SD-Voigt-active layers (the case-7 /
    upper-stratosphere regime, modm.f90:965-1087), and the hybrid
    dispatch must be differentiable end-to-end."""
    import dataclasses as dc
    from monortm_tpu.models.monortm import MonoRTM
    from monortm_tpu.types import LayerState

    wn = np.linspace(0.3, 55.0, 32)
    cat = synthetic_catalog_mw(n_h2o=24, n_o2=12, tile=64)

    def build(use_pallas):
        return MonoRTM(wn, 0.25, cat, nmol=22, dtype=jnp.float32,
                       wn_tile=32, line_tile=64, use_pallas=use_pallas,
                       pallas_wn_tile=128, pallas_line_tile=128)

    mP, mX = build(True), build(False)
    st0 = synthetic_state(nlay=4)
    p = np.geomspace(1000.0, 20.0, 4)     # top layers SD-Voigt-active
    state = LayerState(p=p, t=st0.t, tz=st0.tz, wkl=st0.wkl,
                       wbrodl=st0.wbrodl, clw=st0.clw)
    state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), state)
    rows = np.asarray(mP.od_model.all_lorentz(state, per_layer=True))
    assert not rows.all()                 # SD-Voigt genuinely active

    emis = jnp.full((len(wn),), 0.95, jnp.float32)
    refl = 1.0 - emis

    def make_loss(m, engine, lor=None):
        def loss(t):
            st = dc.replace(state, t=t)
            return jnp.sum(m.tb(st, jnp.float32(288.0), emis, refl,
                                irt=3, engine=engine, lor_layers=lor))
        return loss

    gP = np.asarray(jax.jit(jax.grad(make_loss(mP, "pallas")))(state.t))
    gX = np.asarray(jax.jit(jax.grad(make_loss(mX, None)))(state.t))
    assert np.isfinite(gP).all() and np.abs(gP).max() > 0
    np.testing.assert_allclose(gP, gX, rtol=5e-3, atol=1e-4)

    # hybrid dispatch (lean engine on the Lorentz-clean layers, kernel +
    # custom VJP on the SD-Voigt layers) differentiates end-to-end
    lor = tuple(np.nonzero(rows)[0].tolist())
    if lor:
        gH = np.asarray(jax.jit(jax.grad(make_loss(mP, "hybrid", lor)))(
            state.t))
        np.testing.assert_allclose(gH, gX, rtol=5e-3, atol=1e-4)

    # central differences through the Pallas forward itself.  The f32
    # loss (~1.6e4) has ~1e-3 absolute noise; a 4 K step keeps the
    # differenced signal of even the smallest per-layer gradient
    # (~4e-3 on the SD-Voigt top layer) ~15x above it.
    f = jax.jit(make_loss(mP, "pallas"))
    t0 = np.asarray(state.t)
    for il in (int(np.argmax(np.abs(gP))), 3):
        eps = 4.0
        tp, tm = t0.copy(), t0.copy()
        tp[il] += eps
        tm[il] -= eps
        fd = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) \
            / (2 * eps)
        np.testing.assert_allclose(gP[il], fd, rtol=5e-2, atol=3e-4)


def test_pallas_vjp_under_mesh():
    """The kernel's custom VJP composes with the (prof, wn[, line])
    mesh: each shard re-sweeps its own forward blocks via a per-shard
    reverse candidate map and the seven cotangent partials psum over
    the wn/line axes.  Gradients must match the unsharded kernel's."""
    import dataclasses as dc
    from jax.sharding import NamedSharding, PartitionSpec as P
    from monortm_tpu.parallel.sharding import make_mesh

    cat = synthetic_catalog_mw(n_h2o=24, n_o2=12, tile=64)
    wn = np.linspace(0.4, 50.0, 64)
    state = synthetic_state(nlay=4, batch=2)
    state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), state)
    sc = jnp.ones((2, 4, 351), jnp.float32)
    w = jnp.cos(jnp.arange(len(wn), dtype=jnp.float32))[None, None, :,
                                                        None]

    def build(mesh):
        return ODModel(wn, dvset=float(wn[1] - wn[0]), catalog=cat,
                       nmol=22, dtype=jnp.float32, use_pallas=True,
                       pallas_wn_tile=128, pallas_line_tile=128,
                       mesh=mesh)

    m0 = build(None)
    g0 = np.asarray(jax.jit(jax.grad(
        lambda t: jnp.sum(m0.line_od_pallas(
            dc.replace(state, t=t), sc) * w)))(state.t))
    assert np.isfinite(g0).all() and np.abs(g0).max() > 0

    for mesh in (make_mesh(n_prof=2, n_wn=4),
                 make_mesh(n_prof=2, n_wn=2, n_line=2)):
        mM = build(mesh)
        sharded = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh,
                                 P("prof", *(None,) * (x.ndim - 1)))),
            state)
        gM = np.asarray(jax.jit(jax.grad(
            lambda t: jnp.sum(mM.line_od_pallas(
                dc.replace(sharded, t=t), sc) * w)))(sharded.t))
        scale = max(np.abs(g0).max(), 1e-30)
        np.testing.assert_allclose(gM, g0, rtol=2e-5, atol=1e-5 * scale,
                                   err_msg=str(dict(mesh.shape)))


def test_bwd_segmentation_matches_unsegmented(monkeypatch):
    """Forcing a tiny SMEM budget segments BOTH sweeps (the forward's
    wn-axis segments and the backward's reverse-map K-axis segments);
    values and gradients must not change."""
    import dataclasses as dc
    from monortm_tpu.ops import linesum_pallas as lsp

    cat = synthetic_catalog_mw(n_h2o=96, n_o2=32, tile=64)
    wn = np.linspace(0.3, 55.0, 256)
    state = synthetic_state(nlay=3)
    state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x), jnp.float32), state)
    sc = jnp.ones((3, 351), jnp.float32)

    def build():
        return ODModel(wn, 0.2, cat, nmol=22, dtype=jnp.float32,
                       use_pallas=True, pallas_wn_tile=128,
                       pallas_line_tile=128)

    def val_grad(m):
        def loss(t):
            return jnp.sum(m.line_od_pallas(dc.replace(state, t=t), sc))
        return jax.value_and_grad(loss)(state.t)

    v0, g0 = val_grad(build())
    monkeypatch.setattr(lsp, "_SMEM_MAP_BUDGET", 2048)
    v1, g1 = val_grad(build())
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    # the backward segments change only the cotangent CONCAT boundaries
    # (per-segment sweeps are disjoint along the line axis), so the
    # gradients are bitwise too
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_reverse_map_invariants():
    """_reverse_map is the exact transpose of the candidate map and
    _budget_segments partitions rows with valid slots packed leftmost."""
    from monortm_tpu.ops.linesum_pallas import (_budget_segments,
                                                _reverse_map)
    rng = np.random.default_rng(3)
    n_wt, n_cand, k_tiles = 11, 5, 9
    cm = rng.integers(0, k_tiles, (n_wt, n_cand)).astype(np.int32)
    cv = (rng.random((n_wt, n_cand)) < 0.6)
    # pack valid slots leftmost like the plan builder does
    order = np.argsort(~cv, axis=1, kind="stable")
    cm = np.take_along_axis(cm, order, axis=1)
    cv = np.take_along_axis(cv, order, axis=1).astype(np.int32)

    rm, rv = _reverse_map(cm, cv, k_tiles)
    # transpose property: (i, k) is a forward pair iff i appears in
    # rm[k]'s valid slots, with multiplicity
    fwd = {}
    for i in range(n_wt):
        for j in range(n_cand):
            if cv[i, j]:
                fwd[(cm[i, j], i)] = fwd.get((cm[i, j], i), 0) + 1
    rev = {}
    for k in range(k_tiles):
        for s2 in range(rm.shape[1]):
            if rv[k, s2]:
                rev[(k, rm[k, s2])] = rev.get((k, rm[k, s2]), 0) + 1
    assert fwd == rev
    # valid slots packed leftmost
    for k in range(k_tiles):
        nvalid = rv[k].sum()
        assert rv[k, :nvalid].all() and not rv[k, nvalid:].any()

    segs = _budget_segments(rv.sum(axis=1), 8)
    # contiguous cover of the row axis, each within budget
    assert segs[0][0] == 0 and segs[-1][1] == k_tiles
    for (a0, a1, nc), (b0, _, _) in zip(segs, segs[1:]):
        assert a1 == b0
    for a0, a1, nc in segs:
        assert nc >= max(1, rv[a0:a1].sum(axis=1).max(initial=0))
        assert (a1 - a0) * nc <= 8 or (a1 - a0) == 1
