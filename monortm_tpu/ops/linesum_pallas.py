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


def _contrib_block(wn_hi, wn_lo, nu_hi, nu_lo, sdep, is_o2, is_co2,
                   has_cpl, xf1, xf15, valid,
                   shift, stild, hw, ad, k3v, ya, yb, chi_fn,
                   gate: bool = False):
    """Per-block forward math -> contrib [W, Nt].

    Mirrors _kernel's branch value-for-value; used by the backward
    kernel, which re-derives the block under jax.vjp so the cotangents
    are the exact adjoint of the shipped forward — including every
    Humlicek / SD-Voigt rational, the branch trees, and the pedestal
    subtraction.  gate=True adds the same whole-block lax.cond skip of
    the SD-Voigt machinery as the forward kernel (values identical; the
    vjp of lax.cond differentiates the taken branch, so the adjoint of
    an all-Lorentz block never traces the Humlicek transpose)."""
    xnu = nu_hi + (nu_lo + shift)
    d1 = (wn_hi - nu_hi) + (wn_lo - nu_lo) - shift
    dsum = wn_hi + xnu

    mirror = (dsum - DELTNU_CUT) <= 0.0
    within = jnp.abs(d1) <= DELTNU_CUT
    keep = (within | is_o2) & valid

    zlor = hw * jnp.float32(0.01) > ad * jnp.float32(0.99)
    use_lor = (jnp.abs(d1) > 100.0 * ad) | zlor
    k3l = xlorentz(DELTNU_CUT / hw) / hw
    k3 = jnp.where(use_lor, k3l, k3v)

    hw_pi = hw * (1.0 / jnp.float32(np.pi))
    pi_hw2 = hw * hw

    def lor(dd):
        return hw_pi / (pi_hw2 + dd * dd)

    if gate == "lorentz":
        # exact where no kept lane is SD-Voigt (keep & ~use_lor empty):
        # every surviving lane routes through the Lorentz expressions,
        # masked lanes never contribute, and dk3v is zero either way.
        # The backward kernel selects this branch per block at runtime.
        k1 = lor(d1)
        k2 = lor(dsum)
        k3 = k3l
    elif gate:
        any_voigt = jnp.any(keep & ~use_lor)

        def K_g(dd, dl):
            def full():
                dv = sdvoigt(dd, hw, ad,
                             jnp.broadcast_to(sdep, dd.shape),
                             gate=True)
                return jnp.where(use_lor, dl, dv)

            return jax.lax.cond(any_voigt, full, lambda: dl)

        k1 = K_g(d1, lor(d1))
        k2 = jax.lax.cond(
            jnp.any((mirror & keep) | (is_o2 & has_cpl & valid)),
            lambda: K_g(dsum, lor(dsum)),
            lambda: jnp.zeros_like(d1))
    else:
        def K(dd):
            dv = sdvoigt(dd, hw, ad, jnp.broadcast_to(sdep, dd.shape))
            return jnp.where(use_lor, lor(dd), dv)

        k1 = K(d1)
        k2 = K(dsum)

    y1 = 1.0 + ya * d1 + yb
    y2 = 1.0 - ya * dsum + yb
    y1p = 1.0 + ya * DELTNU_CUT + yb
    y2p = 1.0 - ya * DELTNU_CUT + yb
    ped = 2.0 - (d1 * d1) / (DELTNU_CUT * DELTNU_CUT)

    sls_other = jnp.where(
        has_cpl,
        y1 * k1 - y1p * k3 + jnp.where(mirror, y2 * k2 - y2p * k3, 0.0),
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
    if chi_fn is not None:
        sls_co2 = sls_co2 * chi_fn(d1)
    sls = jnp.where(is_o2, sls_o2,
                    jnp.where(is_co2, sls_co2, sls_other))
    return jnp.where(keep, sls, 0.0) * stild


def _bwd_kernel(rmap_ref, rvalid_ref,
                wn_hi_ref, wn_lo_ref,
                nu_hi_ref, nu_lo_ref, sdep_ref,
                shift_ref, stild_ref, hw_ref, ad_ref, k3v_ref, ya_ref,
                yb_ref,
                fo2_ref, fco2_ref, fcpl_ref, fxf1_ref, fxf15_ref, fval_ref,
                onehot_ref, g_ref,
                dshift_ref, dstild_ref, dhw_ref, dad_ref, dk3v_ref,
                dya_ref, dyb_ref, *, lt: int, chi_fn=None,
                gate: bool = True):
    """Adjoint sweep: grid (layer-pack, catalog tile k, reverse slot s).

    The reverse map lists, for each catalog line tile, the wavenumber
    tiles whose candidate lists contain it — the transpose of the
    forward's block-sparse map, so the backward touches exactly the
    blocks the forward did.  Each step pulls the cotangent block
    g [wt, n_mol], contracts it against the tile's one-hot on the MXU
    (gbar = g @ onehot^T — the transpose of the forward's attribution
    matmul), re-derives the forward block under jax.vjp, and accumulates
    the seven per-(layer, line) cotangents into [1, lt, nt] out blocks
    resident across the s sweep."""
    k = pl.program_id(1)
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        for r in (dshift_ref, dstild_ref, dhw_ref, dad_ref, dk3v_ref,
                  dya_ref, dyb_ref):
            r[...] = jnp.zeros_like(r)

    @pl.when(rvalid_ref[k, s] > 0)
    def _compute():
        nu_hi = nu_hi_ref[0, :][None, :]
        nu_lo = nu_lo_ref[0, :][None, :]
        sdep = sdep_ref[0, :][None, :]
        is_o2 = fo2_ref[0, :][None, :] > 0.5
        is_co2 = fco2_ref[0, :][None, :] > 0.5
        has_cpl = fcpl_ref[0, :][None, :] > 0.5
        xf1 = fxf1_ref[0, :][None, :] > 0.5
        xf15 = fxf15_ref[0, :][None, :] > 0.5
        valid = fval_ref[0, :][None, :] > 0.5
        wn_hi = wn_hi_ref[0, 0, :][:, None]
        wn_lo = wn_lo_ref[0, 0, :][:, None]

        for q in range(lt):
            g_blk = g_ref[0, q, :, :]                      # [wc, M]
            gbar = jax.lax.dot_general(                    # [wc, nt]
                g_blk, onehot_ref[...],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            args = (shift_ref[0, q, :][None, :],
                    stild_ref[0, q, :][None, :],
                    hw_ref[0, q, :][None, :],
                    ad_ref[0, q, :][None, :],
                    k3v_ref[0, q, :][None, :],
                    ya_ref[0, q, :][None, :],
                    yb_ref[0, q, :][None, :])

            def f_of(mode):
                def f(shift, stild, hw, ad, k3v, ya, yb):
                    return _contrib_block(
                        wn_hi, wn_lo, nu_hi, nu_lo, sdep, is_o2,
                        is_co2, has_cpl, xf1, xf15, valid,
                        shift, stild, hw, ad, k3v, ya, yb, chi_fn,
                        gate=mode)
                return f

            def acc(ds):
                for r, d in zip((dshift_ref, dstild_ref, dhw_ref,
                                 dad_ref, dk3v_ref, dya_ref, dyb_ref),
                                ds):
                    r[0, q, :] += d[0, :]

            if not gate:
                _, vjp = jax.vjp(f_of(False), *args)
                acc(vjp(gbar))
            else:
                # block-level skip of the SD-Voigt TRANSPOSE: the
                # predicate mirrors the forward's gate, and the cond
                # sits AROUND two independently-derived vjps (no
                # cond-transpose — the pattern Mosaic cannot lower)
                shift_q, hw_q, ad_q = args[0], args[2], args[3]
                d1 = ((wn_hi - nu_hi) + (wn_lo - nu_lo) - shift_q)
                within = jnp.abs(d1) <= DELTNU_CUT
                keep = (within | is_o2) & valid
                zlor = (hw_q * jnp.float32(0.01)
                        > ad_q * jnp.float32(0.99))
                use_lor = (jnp.abs(d1) > 100.0 * ad_q) | zlor
                any_voigt = jnp.any(keep & ~use_lor)

                def full_branch():
                    _, vjp = jax.vjp(f_of(False), *args)
                    acc(vjp(gbar))

                def lor_branch():
                    _, vjp = jax.vjp(f_of("lorentz"), *args)
                    acc(vjp(gbar))

                jax.lax.cond(any_voigt, full_branch, lor_branch)


def _reverse_map(cand_map, cand_valid, k_tiles: int):
    """Transpose of the candidate map: for each catalog tile, the wn
    tiles that list it as a candidate (host, static)."""
    cm = np.asarray(cand_map)
    cv = np.asarray(cand_valid)
    lists: list[list[int]] = [[] for _ in range(k_tiles)]
    for i in range(cm.shape[0]):
        for j in range(cm.shape[1]):
            if cv[i, j]:
                lists[cm[i, j]].append(i)
    n_rev = max(max((len(x) for x in lists), default=1), 1)
    rmap = np.zeros((k_tiles, n_rev), np.int32)
    rvalid = np.zeros((k_tiles, n_rev), np.int32)
    for kk, x in enumerate(lists):
        rmap[kk, :len(x)] = x
        rvalid[kk, :len(x)] = 1
    return rmap, rvalid


def _budget_segments(counts, budget_entries: int):
    """Split a row axis into contiguous segments whose (rows x trimmed
    max-count) stays under the entry budget; valid entries are packed
    leftmost so trimming columns per segment is lossless."""
    segs, r0, maxc = [], 0, 0
    for i in range(len(counts)):
        c = max(int(counts[i]), 1)
        rows = i - r0 + 1
        if rows * max(maxc, c) > budget_entries and rows > 1:
            segs.append((r0, i, maxc))
            r0, maxc = i, c
        else:
            maxc = max(maxc, c)
    segs.append((r0, len(counts), max(maxc, 1)))
    return segs


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
    # operand loads).  The layer axis pads up to a multiple of
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

    # everything below except pre_ln is a CONSTANT under jit (host numpy
    # catalog/plan data), so closing over it inside the custom_vjp
    # functions is safe; the seven state-dependent per-(layer, line)
    # tensors are the differentiable boundary
    onehot = jax.nn.one_hot(tiled_cat["mol"] - 1, n_mol, dtype=dtype)
    wn_args = [jnp.asarray(wn_hi, dtype)[None, :],
               jnp.asarray(wn_lo, dtype)[None, :]]
    per_l_args = [pre[k][None, :] for k in PER_L]
    flag_args = [pre["flags"][k][None, :] for k in FLAGS]
    pre_ln = tuple(jnp.broadcast_to(pre[k], (L, n)) if pre[k].ndim == 1
                   else pre[k] for k in PER_LN)

    # index maps receive the grid indices then the scalar-prefetch refs;
    # blocks that don't depend on j stay resident across candidate steps
    in_specs = [
        pl.BlockSpec((1, wt), lambda l, i, j, cm, cv: (0, i)),   # wn_hi
        pl.BlockSpec((1, wt), lambda l, i, j, cm, cv: (0, i)),   # wn_lo
    ]
    cand_spec = lambda l, i, j, cm, cv: (0, cm[i, j])
    for k in PER_L:
        in_specs.append(pl.BlockSpec((1, nt), cand_spec))
    for k in PER_LN:
        in_specs.append(pl.BlockSpec(
            (1, lt, nt), lambda l, i, j, cm, cv: (l, 0, cm[i, j])))
    for k in FLAGS:
        in_specs.append(pl.BlockSpec((1, nt), cand_spec))
    in_specs.append(pl.BlockSpec((nt, n_mol),
                                 lambda l, i, j, cm, cv: (cm[i, j], 0)))

    def shape_ln(v):
        # [L, n] -> [lp//lt, lt, n]; layer padding repeats layer 0
        if lp != L:
            v = jnp.concatenate(
                [v, jnp.broadcast_to(v[:1], (lp - L, n))], axis=0)
        return v.reshape(lp // lt, lt, n)

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

    cm_d = jnp.asarray(cand_map, jnp.int32)
    cv_d = jnp.asarray(cand_valid, jnp.int32)
    cv_h = np.asarray(cand_valid)
    single = mesh is None or mesh.devices.size <= 1

    if single:
        # Large grids (the 80k-wn reference envelope): the full
        # [n_wt, n_cand] scalar-prefetch map can exceed the ~1 MB SMEM.
        # Split the wn-tile axis into contiguous segments, each with its
        # candidate columns trimmed to the segment's own maximum (valid
        # slots are packed leftmost by the plan builder), and launch one
        # pallas_call per segment — identical semantics, bounded SMEM,
        # and nt stays at the fast 256 instead of the nt=512 big-block
        # penalty the chunked r3 envelope paid (BENCH_NOTES.md).
        fwd_segs = None
        if cv_h.shape[0] * cv_h.shape[1] * 8 > _SMEM_MAP_BUDGET:
            fwd_segs = _budget_segments(cv_h.sum(axis=1),
                                        _SMEM_MAP_BUDGET // 8)
    else:
        nw = mesh.shape["wn"]
        n_line_m = dict(mesh.shape).get("line", 1)
        assert n_wt % nw == 0, (n_wt, nw)
        assert n_cand % n_line_m == 0, (n_cand, n_line_m)
        # the wn-axis segmentation only runs single-device; under a
        # mesh each shard must fit its own (1/nw x 1/n_line) slice of
        # the candidate map in scalar-prefetch SMEM — check it up front
        # with an actionable error instead of an opaque Mosaic failure
        local_bytes = (n_wt // nw) * (n_cand // n_line_m) * 8
        if local_bytes > _SMEM_MAP_BUDGET:
            raise ValueError(
                f"per-shard candidate map ({n_wt // nw} wn tiles x "
                f"{n_cand // n_line_m} slots = {local_bytes} B) exceeds "
                f"the {_SMEM_MAP_BUDGET} B scalar-prefetch budget; use "
                "more 'wn'/'line' mesh shards, or chunk the wavenumber "
                "grid (pipeline layer/wn chunking), or run single-device "
                "where the wn axis is segmented automatically")

    def fwd_impl(pre_ln7):
        ln_args = [shape_ln(v) for v in pre_ln7]
        args = wn_args + per_l_args + ln_args + flag_args + [onehot]
        if single:
            if fwd_segs is None:
                sf = call(cm_d, cv_d, *args)
            else:
                cm_h = np.asarray(cand_map)
                parts = []
                for s0, s1, nc in fwd_segs:
                    a_s = list(args)
                    a_s[0] = args[0][:, s0 * wt:s1 * wt]
                    a_s[1] = args[1][:, s0 * wt:s1 * wt]
                    parts.append(call(jnp.asarray(cm_h[s0:s1, :nc]),
                                      jnp.asarray(cv_h[s0:s1, :nc]
                                                  .astype(np.int32)),
                                      *a_s))
                sf = jnp.concatenate(parts, axis=2)
        else:
            n_line = dict(mesh.shape).get("line", 1)
            line_ax = "line" if n_line > 1 else None
            # candidate-slot columns additionally split over "line":
            # each shard sweeps its own candidate subset against the
            # replicated tiled catalog, partials contracted with one psum
            body = call
            if n_line > 1:
                body = lambda cm_, cv_, *a: jax.lax.psum(
                    call(cm_, cv_, *a), "line")
            specs = ([P("wn", line_ax), P("wn", line_ax),  # cand map/valid
                      P(None, "wn"), P(None, "wn")]        # wn hi/lo
                     + [P(None, None)] * len(PER_L)
                     + [P("prof", None, None)] * len(PER_LN)
                     + [P(None, None)] * len(FLAGS)
                     + [P(None, None)])                     # one-hot
            # check_vma=False: pallas_call's out_shape carries no
            # varying-axes info; the out_specs fully describe it
            sf = shard_map(body, mesh=mesh, in_specs=tuple(specs),
                           out_specs=P("prof", None, "wn", None),
                           check_vma=False)(cm_d, cv_d, *args)
        return sf.reshape(lp, wp, n_mol)[:L]

    def bwd_impl(pre_ln7, g):
        # adjoint sweep over the REVERSE candidate map: same block
        # sparsity as the forward, transposed.  The vjp-traced block
        # holds O(hundreds) of [W, Nt] f32 intermediates live between
        # the recomputed forward and its transpose; at W = wt = 128
        # that overflows the ~16 MB scoped VMEM (measured: 72 MB at the
        # bench shapes), and an in-kernel unrolled sub-slice loop does
        # NOT get its stack reused across iterations (measured: still
        # 40 MB).  So the wavenumber sub-slice is a GRID dimension:
        # each reverse slot expands into wsub_b steps over
        # wt/wsub_b-sublane slices, and each step's vjp body only ever
        # materializes one slice.  The d_* accumulations over W are
        # associative sums, so only their rounding order changes.
        wsub_b = 1 if interpret else max(1, wt // 16)
        wc = wt // wsub_b
        k_tiles = n // nt
        ln_args = [shape_ln(v) for v in pre_ln7]
        if lp != L:
            g = jnp.concatenate(
                [g, jnp.zeros((lp - L,) + g.shape[1:], g.dtype)], axis=0)
        g4 = g.reshape(lp // lt, lt, wp, n_mol)

        def expand(rm, rv):
            """wsub_b wn sub-slice steps per reverse slot."""
            r = rm.shape[1]
            rm2 = (np.repeat(rm, wsub_b, axis=1) * wsub_b
                   + np.tile(np.arange(wsub_b, dtype=np.int32), r))
            return rm2, np.repeat(rv, wsub_b, axis=1)

        # wn operands reshaped to [wp/wc, 8, wc] (a broadcast sublane
        # dim of 8) so the (1, 8, wc) block satisfies the Pallas
        # last-two-dims rule at the 16-lane sub-slice width
        rev_wn = lambda l, k, s, rm, rv: (rm[k, s], 0, 0)
        k_l = lambda l, k, s, rm, rv: (0, k)
        k_ln = lambda l, k, s, rm, rv: (l, 0, k)
        bwd_specs = (
            [pl.BlockSpec((1, 8, wc), rev_wn),
             pl.BlockSpec((1, 8, wc), rev_wn)]
            + [pl.BlockSpec((1, nt), k_l)] * len(PER_L)
            + [pl.BlockSpec((1, lt, nt), k_ln)] * len(PER_LN)
            + [pl.BlockSpec((1, nt), k_l)] * len(FLAGS)
            + [pl.BlockSpec((nt, n_mol), lambda l, k, s, rm, rv: (k, 0)),
               pl.BlockSpec((1, lt, wc, n_mol),
                            lambda l, k, s, rm, rv: (l, 0, rm[k, s], 0))])
        out_spec = pl.BlockSpec((1, lt, nt), k_ln)

        def bwd_call(rm_, rv_, *a):
            lb_loc = a[2 + len(PER_L)].shape[0]   # first PER_LN operand
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(lb_loc, rv_.shape[0], rv_.shape[1]),
                in_specs=bwd_specs,
                out_specs=(out_spec,) * len(PER_LN))
            return pl.pallas_call(
                functools.partial(_bwd_kernel, lt=lt,
                                  chi_fn=cfg.chi_fn, gate=gate),
                grid_spec=grid_spec,
                out_shape=tuple(jax.ShapeDtypeStruct(
                    (lb_loc, lt, rv_.shape[0] * nt), jnp.float32)
                    for _ in PER_LN),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel",
                                         "arbitrary")),
                interpret=interpret,
            )(rm_, rv_, *a)

        wn3 = [jnp.broadcast_to(v.reshape(-1, 1, wc), (wp // wc, 8, wc))
               for v in wn_args]

        if single:
            rmap, rvalid = _reverse_map(cand_map, cand_valid, k_tiles)
            rmap2, rvalid2 = expand(rmap, rvalid)
            if rmap2.shape[0] * rmap2.shape[1] * 8 > _SMEM_MAP_BUDGET:
                segs = _budget_segments(rvalid2.sum(axis=1),
                                        _SMEM_MAP_BUDGET // 8)
            else:
                segs = [(0, k_tiles, rmap2.shape[1])]
            parts = []
            for s0, s1, nc in segs:
                sl = slice(s0 * nt, s1 * nt)
                a_s = (wn3
                       + [v[:, sl] for v in per_l_args]
                       + [v[:, :, sl] for v in ln_args]
                       + [v[:, sl] for v in flag_args]
                       + [onehot[sl], g4])
                parts.append(bwd_call(jnp.asarray(rmap2[s0:s1, :nc]),
                                      jnp.asarray(rvalid2[s0:s1, :nc]),
                                      *a_s))
            if len(parts) == 1:
                outs = parts[0]
            else:
                outs = tuple(
                    jnp.concatenate([p_[i] for p_ in parts], axis=2)
                    for i in range(len(PER_LN)))
            return tuple(o.reshape(lp, n)[:L] for o in outs)

        # ---- mesh path: per-shard reverse maps ----------------------
        # each (wn[, line]) shard re-sweeps exactly the (local wn
        # sub-tile, candidate-subset) blocks it owned in the forward;
        # the seven cotangent partials psum over ("wn"[, "line"]) and
        # stay sharded over "prof" like the per-(layer, line) inputs —
        # the hand-written transpose of the forward's shard_map.
        nw = mesh.shape["wn"]
        n_line = dict(mesh.shape).get("line", 1)
        rows = n_wt // nw
        cols = n_cand // n_line
        cm_h = np.asarray(cand_map)
        cv_h = np.asarray(cand_valid)
        packs = []
        n_rev = 1
        for w in range(nw):
            for li in range(n_line):
                rm, rv = _reverse_map(
                    cm_h[w * rows:(w + 1) * rows,
                         li * cols:(li + 1) * cols],
                    cv_h[w * rows:(w + 1) * rows,
                         li * cols:(li + 1) * cols], k_tiles)
                packs.append((rm, rv))
                n_rev = max(n_rev, rm.shape[1])
        rm2 = np.zeros((nw * n_line, k_tiles, n_rev * wsub_b), np.int32)
        rv2 = np.zeros_like(rm2)
        for idx, (rm, rv) in enumerate(packs):
            a, b = expand(rm, rv)
            rm2[idx, :, :a.shape[1]] = a
            rv2[idx, :, :b.shape[1]] = b
        if k_tiles * rm2.shape[2] * 8 > _SMEM_MAP_BUDGET:
            raise ValueError(
                f"per-shard reverse map ({k_tiles} line tiles x "
                f"{rm2.shape[2]} slots) exceeds the "
                f"{_SMEM_MAP_BUDGET} B scalar-prefetch budget; use more "
                "'wn'/'line' mesh shards or take this gradient "
                "single-device (the wn axis segments automatically "
                "there)")

        axes = ("wn",) + (("line",) if n_line > 1 else ())

        def body(rm_, rv_, wnh, wnl, *a):
            outs = bwd_call(rm_[0], rv_[0], wnh, wnl, *a)
            return tuple(jax.lax.psum(o, axes) for o in outs)

        lead = P(("wn", "line") if n_line > 1 else "wn", None, None)
        specs = ((lead, lead, P("wn", None, None), P("wn", None, None))
                 + (P(None, None),) * len(PER_L)
                 + (P("prof", None, None),) * len(PER_LN)
                 + (P(None, None),) * len(FLAGS)
                 + (P(None, None), P("prof", None, "wn", None)))
        outs = shard_map(
            body, mesh=mesh, in_specs=specs,
            out_specs=(P("prof", None, None),) * len(PER_LN),
            check_vma=False,
        )(jnp.asarray(rm2), jnp.asarray(rv2), *wn3,
          *per_l_args, *ln_args, *flag_args, onehot, g4)
        return tuple(o.reshape(lp, n)[:L] for o in outs)

    @jax.custom_vjp
    def sf_fn(*pre_ln7):
        return fwd_impl(pre_ln7)

    def sf_fwd(*pre_ln7):
        return fwd_impl(pre_ln7), pre_ln7

    def sf_bwd(res, g):
        return bwd_impl(res, g)

    sf_fn.defvjp(sf_fwd, sf_bwd)
    return sf_fn(*pre_ln)
