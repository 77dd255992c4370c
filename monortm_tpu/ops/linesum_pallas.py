"""Pallas TPU kernel for the line-sum hot loop.

The O(layers x wavenumbers x lines) part of the line-by-line sum runs as a
Pallas kernel over a (layer-pack, wn-tile, candidate-line-tile) grid: each grid
step computes [wn_tile, line_tile] blocks of shape-function evaluations
for `lt` packed layers entirely in VMEM and contracts them against the
line->molecule one-hot on the MXU, accumulating [lt, wn_tile, n_mol]
partial sums across candidate tiles without HBM round trips.  Packing
layers makes the per-(layer, line) operand loads sublane-full
((1, lt, Nt) blocks) and amortizes the per-line/flag/one-hot loads
across lt layers.  Everything that is O(layers x lines) — intensities,
halfwidths, coupling Y/G slopes, the wavenumber-independent 25 cm^-1
pedestal — is precomputed with plain XLA (via the shared
`ops.lineshape.line_params` prologue, so IBRD=1 and every other knob
behaves identically to the XLA engine) and streamed in as [L, N] operands.

The 25 cm^-1 window cut (modm.f90:301,384) becomes *block sparsity*: line
tiles are nu-sorted on the host and each wavenumber tile gets a static
candidate list of overlapping tiles (plus every O2 tile — O2 is exempt
from the cut).  The candidate map rides in as a scalar-prefetch operand
(PrefetchScalarGridSpec) and drives the BlockSpec index maps, exactly the
block-sparse-attention pattern — so a 250k-line catalog on a microwave
grid only ever touches the tiles within 25 cm^-1 of each wn tile.

Results match ops.lineshape.line_od_block to f32 round-off
(tests/test_pallas.py).  Replaces the LINES triple loop, modm.f90:253-431.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from monortm_tpu import constants as cst
from monortm_tpu.ops.lineshape import (DELTNU_CUT, LineConfig, MOL_CO2,
                                       MOL_O2, line_params)
from monortm_tpu.ops.voigt import sdvoigt, xlorentz

# scalar-prefetch budget for the candidate map (cm+cv, bytes); the wn
# tile axis is segmented into separate pallas_calls beyond this
_SMEM_MAP_BUDGET = 512 * 1024

# streamed per-(layer, line) operands, in kernel argument order
PER_LN = ("shift", "stild", "hw", "ad", "k3v", "ya", "yb")
# streamed per-line operands ([1, N])
PER_L = ("nu_hi", "nu_lo", "sdep")
FLAGS = ("o2", "co2", "cpl", "xf1", "xf15", "valid")


def precompute(cat: dict, p, t, wk, wbrod, scor_flat, cfg: LineConfig,
               dtype=jnp.float32):
    """All O(L x N) line parameters, via the shared LINES prologue."""
    lp = line_params(cat, p, t, wk, wbrod, scor_flat, cfg, dtype)
    hw, ad = lp["hwhm_c"], lp["hwhm_d"]
    rp, rp2 = lp["rp"], lp["rp2"]

    # pedestal value at 25 cm^-1 for the SD-Voigt branch; the Lorentz
    # branch's k3 is recomputed in-kernel from hw (3 VPU ops)
    sdep_b = jnp.broadcast_to(cat["sdep"], hw.shape)
    k3v = sdvoigt(jnp.asarray(DELTNU_CUT, dtype), hw, ad, sdep_b)

    # line-coupling Y factors: y1 = 1 + ya*d1 + yb, y2 = 1 - ya*dsum + yb
    ya = lp["aip"] * rp[..., None] / hw
    yb = lp["bip"] * rp2[..., None]

    xg = cat["xg"]
    mol = cat["mol"]
    f32 = lambda m: m.astype(dtype)
    flags = {
        "o2": f32(mol == MOL_O2),
        "co2": f32(mol == MOL_CO2),
        "cpl": f32((xg == -1) | (xg == -3) | (xg == -5)),
        "xf1": f32(xg == -1),
        "xf15": f32((xg == -1) | (xg == -5)),
        "valid": f32(cat["valid"]),
    }
    return {
        "shift": lp["shift"], "stild": lp["stild"], "hw": hw, "ad": ad,
        "k3v": k3v, "ya": ya, "yb": yb,
        "sdep": cat["sdep"].astype(dtype),
        "nu_hi": cat["nu0_hi"].astype(dtype),
        "nu_lo": cat["nu0_lo"].astype(dtype),
        "flags": flags,
    }


def _kernel(cmap_ref, cvalid_ref,
            wn_hi_ref, wn_lo_ref,
            nu_hi_ref, nu_lo_ref, sdep_ref,
            shift_ref, stild_ref, hw_ref, ad_ref, k3v_ref, ya_ref, yb_ref,
            fo2_ref, fco2_ref, fcpl_ref, fxf1_ref, fxf15_ref, fval_ref,
            onehot_ref, out_ref, *, gate: bool, lt: int, wsub: int,
            chi_fn=None):
    i = pl.program_id(1)       # wavenumber tile
    j = pl.program_id(2)       # candidate slot
    # wsub > 1 packs several 128-lane wn sub-tiles into one grid step
    # (fewer steps -> less of the ~2 us/step grid/DMA floor, BENCH_NOTES)
    # while every [W, Nt] intermediate stays at the 128-lane shape that
    # avoids the big-block Mosaic penalty; the sub-tile walk below is a
    # static unroll over lane-aligned slices
    wtc = wn_hi_ref.shape[1] // wsub

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(cvalid_ref[i, j] > 0)
    def _compute():
        nu_hi = nu_hi_ref[0, :][None, :]       # [1, Nt]
        nu_lo = nu_lo_ref[0, :][None, :]
        sdep = sdep_ref[0, :][None, :]
        is_o2 = fo2_ref[0, :][None, :] > 0.5
        is_co2 = fco2_ref[0, :][None, :] > 0.5
        has_cpl = fcpl_ref[0, :][None, :] > 0.5
        xf1 = fxf1_ref[0, :][None, :] > 0.5
        xf15 = fxf15_ref[0, :][None, :] > 0.5
        valid = fval_ref[0, :][None, :] > 0.5

        # `lt` layers are packed per grid step: the per-(layer, line)
        # operands arrive as (1, lt, Nt) blocks — sublane-full loads
        # instead of the (1, 1, Nt) streams of the unpacked kernel — and
        # the per-line/wn/flag blocks plus the one-hot are loaded once
        # per lt layers.  The layer walk below is a static unroll; each
        # iteration is the exact computation of the unpacked kernel.
        for q, pw in [(q, pw) for q in range(lt) for pw in range(wsub)]:
            shift = shift_ref[0, q, :][None, :]
            stild = stild_ref[0, q, :][None, :]
            hw = hw_ref[0, q, :][None, :]
            ad = ad_ref[0, q, :][None, :]
            k3v = k3v_ref[0, q, :][None, :]
            ya = ya_ref[0, q, :][None, :]
            yb = yb_ref[0, q, :][None, :]
            wn_hi = wn_hi_ref[0, pw * wtc:(pw + 1) * wtc][:, None]
            wn_lo = wn_lo_ref[0, pw * wtc:(pw + 1) * wtc][:, None]

            xnu = nu_hi + (nu_lo + shift)
            d1 = (wn_hi - nu_hi) + (wn_lo - nu_lo) - shift      # [W, Nt]
            dsum = wn_hi + xnu

            mirror = (dsum - DELTNU_CUT) <= 0.0
            within = jnp.abs(d1) <= DELTNU_CUT
            keep = (within | is_o2) & valid

            # Lorentz switch (modm.f90:419-431): far wings or zeta > 0.99
            zlor = hw * jnp.float32(0.01) > ad * jnp.float32(0.99)
            use_lor = (jnp.abs(d1) > 100.0 * ad) | zlor
            k3l = xlorentz(DELTNU_CUT / hw) / hw
            k3 = jnp.where(use_lor, k3l, k3v)

            # xlorentz(d/hw)/hw == hw / (pi (hw^2 + d^2)): one divide per
            # evaluation instead of two — the dominant VPU cost of the
            # all-Lorentz (common MW) path
            hw_pi = hw * (1.0 / jnp.float32(np.pi))
            pi_hw2 = hw * hw

            def lor(dd):
                return hw_pi / (pi_hw2 + dd * dd)

            if gate:
                any_voigt = jnp.any(keep & ~use_lor)

                def K(dd, dl):
                    # block-level skip of the SD-Voigt/Humlicek machinery
                    # when every surviving line uses the Lorentz limit
                    # (the common MW case: zeta > 0.99 at tropospheric
                    # pressures); identical results — the gated branch
                    # evaluates all lanes exactly as the ungated form does
                    def full():
                        dv = sdvoigt(dd, hw, ad,
                                     jnp.broadcast_to(sdep, dd.shape),
                                     gate=True)
                        return jnp.where(use_lor, dl, dv)

                    return jax.lax.cond(any_voigt, full, lambda: dl)

                k1 = K(d1, lor(d1))
                # the wn+nu mirror term is only consumed where mirror
                # holds (lines within 25 cm^-1 of 0) or for coupled O2
                # lines (modm.f90:649-704); skip its shape evals otherwise
                k2 = jax.lax.cond(
                    jnp.any((mirror & keep) | (is_o2 & has_cpl & valid)),
                    lambda: K(dsum, lor(dsum)),
                    lambda: jnp.zeros_like(d1))
            else:
                def K(dd):
                    dv = sdvoigt(dd, hw, ad,
                                 jnp.broadcast_to(sdep, dd.shape))
                    return jnp.where(use_lor, lor(dd), dv)

                k1 = K(d1)
                k2 = K(dsum)

            y1 = 1.0 + ya * d1 + yb
            y2 = 1.0 - ya * dsum + yb
            y1p = 1.0 + ya * DELTNU_CUT + yb      # [1, Nt]
            y2p = 1.0 - ya * DELTNU_CUT + yb

            ped = 2.0 - (d1 * d1) / (DELTNU_CUT * DELTNU_CUT)

            # LSF branch trees (modm.f90:567-831)
            sls_other = jnp.where(
                has_cpl,
                y1 * k1 - y1p * k3
                + jnp.where(mirror, y2 * k2 - y2p * k3, 0.0),
                k1 - k3 + jnp.where(mirror, k2 - k3, 0.0))
            sls_o2 = jnp.where(
                has_cpl,
                jnp.where(xf1, k1 * y1 + k2 * y2, k1 + k2),
                jnp.where(within, k1 + jnp.where(mirror, k2, 0.0), 0.0))
            xp4 = k3 * ped
            sls_co2 = jnp.where(
                has_cpl,
                jnp.where(xf15, k1 * y1 - xp4 - k3 * ((y1 - 1.0) * ped),
                          k1 - xp4),
                k1 - xp4)
            if chi_fn is not None:   # CO2 chi hook (modm.f90:507+)
                sls_co2 = sls_co2 * chi_fn(d1)
            sls = jnp.where(is_o2, sls_o2,
                            jnp.where(is_co2, sls_co2, sls_other))

            contrib = jnp.where(keep, sls, 0.0) * stild

            out_ref[0, q, pw * wtc:(pw + 1) * wtc, :] += jnp.dot(
                contrib, onehot_ref[...],
                preferred_element_type=jnp.float32)


def line_od_pallas(tiled_cat: dict, wn_hi: np.ndarray, wn_lo: np.ndarray,
                   cand_map: np.ndarray, cand_valid: np.ndarray,
                   nt: int, wt: int,
                   p, t, wk, wbrod, scor_flat,
                   cfg: LineConfig, n_mol: int,
                   gate: bool = True,
                   interpret: bool | None = None,
                   mesh=None, lt: int = 1, wsub: int = 1):
    """Line shape-function sum on [L, W, n_mol] via the Pallas kernel.

    tiled_cat: device catalog whose line axis is the *tiled* order
      (nu-sorted windowed tiles then O2 tiles, padded), length K*nt.
    wn_hi/wn_lo: [Wp] f32 two-float split of the padded wavenumber grid
      (Wp a multiple of wt).
    cand_map/cand_valid: [n_wt, n_cand] i32 — candidate tile index per
      (wn tile, slot) and its validity (0 slots are skipped in-kernel).
    p/t/wk/wbrod/scor_flat carry a single flat layer axis L.
    interpret=None auto-selects: compiled Mosaic on TPU, interpreter
    elsewhere (CPU test meshes), so the same call sites work everywhere.

    mesh: optional jax.sharding.Mesh with ("prof", "wn") axes.  The kernel
    then runs under shard_map — the flat layer axis L split over "prof"
    and the wavenumber tiles (plus their candidate-map rows) over "wn",
    with the tiled catalog replicated: each device sweeps only its own
    (L, wn) block, no collectives at all.  Requires L % mesh["prof"] == 0
    and n_wt % mesh["wn"] == 0 (ODModel pads both).

    Returns sf [L, Wp, n_mol]; callers apply RFT * W_species
    (modm.f90:436-438) and crop the wn padding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    pre = precompute(tiled_cat, p, t, wk, wbrod, scor_flat, cfg, dtype)
    L = pre["stild"].shape[0]
    n = pre["stild"].shape[-1]
    assert n % nt == 0, (n, nt)

    # pack lt layers per grid step (sublane-full per-(layer, line)
    # operand loads; the per-line/flag/one-hot blocks amortize across
    # the packed layers).  The layer axis pads up to a multiple of
    # lt x mesh-prof-shards by repeating layer 0; padding is cropped.
    np_ = mesh.shape["prof"] if (mesh is not None
                                 and mesh.devices.size > 1) else 1
    lt = max(1, min(lt, -(-L // np_)))
    lp = -(-L // (lt * np_)) * (lt * np_)

    wp = len(wn_hi)
    assert wp % wt == 0, (wp, wt)
    # wsub sub-tiles per step: the wn block stays wt wide but in-kernel
    # compute runs in wt/wsub-lane slices (128-aligned)
    assert wt % (128 * wsub) == 0, (wt, wsub)
    n_wt = wp // wt
    n_cand = cand_map.shape[1]
    assert cand_map.shape == (n_wt, n_cand), (cand_map.shape, n_wt)

    onehot = jax.nn.one_hot(tiled_cat["mol"] - 1, n_mol, dtype=dtype)

    # index maps receive the grid indices then the scalar-prefetch refs;
    # blocks that don't depend on j stay resident across candidate steps
    in_specs = [
        pl.BlockSpec((1, wt), lambda l, i, j, cm, cv: (0, i)),   # wn_hi
        pl.BlockSpec((1, wt), lambda l, i, j, cm, cv: (0, i)),   # wn_lo
    ]
    args = [jnp.asarray(wn_hi, dtype)[None, :],
            jnp.asarray(wn_lo, dtype)[None, :]]
    cand_spec = lambda l, i, j, cm, cv: (0, cm[i, j])
    for k in PER_L:
        args.append(pre[k][None, :])
        in_specs.append(pl.BlockSpec((1, nt), cand_spec))
    for k in PER_LN:
        v = pre[k]
        v = jnp.broadcast_to(v, (L, n)) if v.ndim == 1 else v
        if lp != L:
            v = jnp.concatenate(
                [v, jnp.broadcast_to(v[:1], (lp - L, n))], axis=0)
        args.append(v.reshape(lp // lt, lt, n))      # [Lb, lt, N]
        in_specs.append(pl.BlockSpec(
            (1, lt, nt), lambda l, i, j, cm, cv: (l, 0, cm[i, j])))
    for k in FLAGS:
        args.append(pre["flags"][k][None, :])
        in_specs.append(pl.BlockSpec((1, nt), cand_spec))
    args.append(onehot)
    in_specs.append(pl.BlockSpec((nt, n_mol),
                                 lambda l, i, j, cm, cv: (cm[i, j], 0)))

    def call(cm, cv, *a):
        # grid from *local* shapes so the same body serves the plain call
        # and each shard_map shard (which sees its (L, wn) block only)
        lb_loc = a[len(PER_L) + 2].shape[0]     # first PER_LN operand
        wp_loc = a[0].shape[1]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(lb_loc, cv.shape[0], cv.shape[1]),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, lt, wt, n_mol),
                                   lambda l, i, j, cm, cv: (l, 0, i, 0)),
        )
        return pl.pallas_call(
            functools.partial(_kernel, gate=gate, lt=lt, wsub=wsub,
                              chi_fn=cfg.chi_fn),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((lb_loc, lt, wp_loc, n_mol),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(cm, cv, *a)

    cm = jnp.asarray(cand_map, jnp.int32)
    cv = jnp.asarray(cand_valid, jnp.int32)
    if mesh is None or mesh.devices.size <= 1:
        # Large grids (the 80k-wn reference envelope): the full
        # [n_wt, n_cand] scalar-prefetch map can exceed the ~1 MB SMEM.
        # Split the wn-tile axis into contiguous segments, each with its
        # candidate columns trimmed to the segment's own maximum (valid
        # slots are packed leftmost by the plan builder), and launch one
        # pallas_call per segment — identical semantics, bounded SMEM,
        # and nt stays at the fast 256 instead of the nt=512 big-block
        # penalty the chunked r3 envelope paid (BENCH_NOTES.md).
        # Under a mesh each shard's local map is already 1/n_wn of the
        # total, so segmentation is applied on the single-device path.
        cv_h = np.asarray(cand_valid)
        budget = _SMEM_MAP_BUDGET
        if cv_h.shape[0] * cv_h.shape[1] * 8 <= budget:
            sf = call(cm, cv, *args)
        else:
            counts = cv_h.sum(axis=1)
            segs, r0, maxc = [], 0, 0
            for i in range(cv_h.shape[0]):
                c = max(int(counts[i]), 1)
                rows = i - r0 + 1
                if rows * max(maxc, c) * 8 > budget and rows > 1:
                    segs.append((r0, i, maxc))
                    r0, maxc = i, c
                else:
                    maxc = max(maxc, c)
            segs.append((r0, cv_h.shape[0], max(maxc, 1)))
            cm_h = np.asarray(cand_map)
            parts = []
            for s0, s1, nc in segs:
                a_s = list(args)
                a_s[0] = args[0][:, s0 * wt:s1 * wt]
                a_s[1] = args[1][:, s0 * wt:s1 * wt]
                parts.append(call(jnp.asarray(cm_h[s0:s1, :nc]),
                                  jnp.asarray(cv_h[s0:s1, :nc]
                                              .astype(np.int32)),
                                  *a_s))
            sf = jnp.concatenate(parts, axis=2)
        return sf.reshape(lp, wp, n_mol)[:L]
    else:
        nw = mesh.shape["wn"]
        n_line = dict(mesh.shape).get("line", 1)
        assert n_wt % nw == 0, (n_wt, nw)
        assert n_cand % n_line == 0, (n_cand, n_line)
        # the wn-axis segmentation above only runs single-device; under a
        # mesh each shard must fit its own (1/nw x 1/n_line) slice of the
        # candidate map in scalar-prefetch SMEM — check it up front with
        # an actionable error instead of an opaque Mosaic compile failure
        local_bytes = (n_wt // nw) * (n_cand // n_line) * 8
        if local_bytes > _SMEM_MAP_BUDGET:
            raise ValueError(
                f"per-shard candidate map ({n_wt // nw} wn tiles x "
                f"{n_cand // n_line} slots = {local_bytes} B) exceeds the "
                f"{_SMEM_MAP_BUDGET} B scalar-prefetch budget; use more "
                "'wn'/'line' mesh shards, or chunk the wavenumber grid "
                "(pipeline layer/wn chunking), or run single-device where "
                "the wn axis is segmented automatically")
        # candidate-slot columns additionally split over "line": each
        # shard sweeps its own candidate subset against the replicated
        # tiled catalog, partial sums contracted with one psum
        line_ax = "line" if n_line > 1 else None
        body = call
        if n_line > 1:
            body = lambda cm_, cv_, *a: jax.lax.psum(
                call(cm_, cv_, *a), "line")
        specs = ([P("wn", line_ax), P("wn", line_ax),    # cand map/valid
                  P(None, "wn"), P(None, "wn")]          # wn hi/lo
                 + [P(None, None)] * len(PER_L)
                 + [P("prof", None, None)] * len(PER_LN)
                 + [P(None, None)] * len(FLAGS)
                 + [P(None, None)])                       # one-hot
        # check_vma=False: pallas_call's out_shape carries no varying-axes
        # info; the out_specs fully describe the sharding here
        sf = shard_map(body, mesh=mesh, in_specs=tuple(specs),
                       out_specs=P("prof", None, "wn", None),
                       check_vma=False)(cm, cv, *args)
    return sf.reshape(lp, wp, n_mol)[:L]
