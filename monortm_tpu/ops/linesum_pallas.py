"""Pallas TPU kernel for the line-sum hot loop.

The O(layers x wavenumbers x lines) part of the line-by-line sum runs as a
Pallas kernel: per (layer, line-tile) grid step, a [wn_tile, line_tile]
block of shape-function evaluations is computed entirely in VMEM and
contracted against the line->molecule one-hot on the MXU, accumulating
[wn_tile, n_mol] partial sums across line tiles without any HBM round
trips.  Everything that is O(layers x lines) — intensities, halfwidths,
coupling Y/G slopes, the wavenumber-independent 25 cm^-1 pedestal — is
precomputed with plain XLA and streamed in as [L, N] operands.

The kernel reuses the branchless SD-Voigt/Humlicek formulations from
ops.voigt verbatim; results match ops.lineshape.line_od_block to f32
round-off (see tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from monortm_tpu import constants as cst
from monortm_tpu.ops.lineshape import (DELTNU_CUT, LineConfig, MOL_CO2,
                                       MOL_O2, _coupling_coeffs)
from monortm_tpu.ops.voigt import sdvoigt, voigt, xlorentz


def precompute(cat: dict, p, t, wk, wbrod, scor_flat, cfg: LineConfig,
               dtype=jnp.float32):
    """All O(L x N) line parameters (mirrors line_od_block's prologue)."""
    t_ = jnp.asarray(t, dtype)
    p_ = jnp.asarray(p, dtype)
    wk = jnp.asarray(wk, dtype)
    wbrod_ = jnp.asarray(wbrod, dtype)

    xn0 = (1013.25 / (cst.BOLTZ * cst.T0)) * 1.0e3
    xn = (p_ / (cst.BOLTZ * t_)) * 1.0e3
    rhorat = xn / xn0
    wtot = jnp.sum(wk, axis=-1) + wbrod_
    rp = p_ / 1013.25
    rp2 = rp * rp
    rt = t_ / cst.T0

    mol = cat["mol"]
    w_line = wk[..., mol - 1]
    rho_mol = rhorat[..., None] * w_line / wtot[..., None]
    aip, bip = _coupling_coeffs(cat, t_, rhorat, rho_mol, cfg)

    shift = cat["pshift"] * rhorat[..., None]
    xnu = cat["nu0_hi"].astype(dtype) + (cat["nu0_lo"].astype(dtype) + shift)

    scor_line = scor_flat[..., cat["iso_flat"]]
    s = cat["s0adj"] * jnp.exp(-cst.RADCT * cat["e"]
                               * (1.0 / t_[..., None] - 1.0 / cst.T0)) * scor_line
    stild = s * (1.0 + jnp.exp(-cst.RADCT * xnu / t_[..., None])) / (
        xnu * (-jnp.expm1(-cst.RADCT * xnu / cst.T0)))

    rtx = rt[..., None] ** cat["tdep"]
    alfa0 = cat["alpf"] * rtx
    hwhms = cat["alps"] * rtx
    hw = alfa0 * (rhorat[..., None] - rho_mol) + hwhms * rho_mol
    hw = jnp.where(cat["xg"] == -3,
                   hw * (1.0 - aip * rp[..., None] - bip * rp2[..., None]),
                   hw)
    ad = (xnu / cst.CLIGHT) * jnp.sqrt(
        2.0 * cst.LN2 * cst.BOLTZ * t_[..., None] * cst.AVOGAD / cat["mass"])

    zeta_lor = (hw / (hw + ad)) > 0.99
    sdep_b = jnp.broadcast_to(cat["sdep"], hw.shape)
    k3v = sdvoigt(jnp.asarray(DELTNU_CUT, dtype), hw, ad, sdep_b)
    k3l = xlorentz(jnp.asarray(DELTNU_CUT, dtype) / hw) / hw

    # line-coupling Y factors: y1 = 1 + ya*d1 + yb, y2 = 1 - ya*dsum + yb
    ya = aip * rp[..., None] / hw
    yb = bip * rp2[..., None]

    xg = cat["xg"]
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
        "shift": shift, "xnu": xnu, "stild": stild, "hw": hw, "ad": ad,
        "zlor": zeta_lor.astype(dtype), "k3v": k3v, "k3l": k3l,
        "ya": ya, "yb": yb, "sdep": sdep_b,
        "nu_hi": cat["nu0_hi"].astype(dtype),
        "nu_lo": cat["nu0_lo"].astype(dtype),
        "flags": flags, "rhorat": rhorat, "wtot": wtot,
    }


def _kernel(wn_hi_ref, wn_lo_ref,
            nu_hi_ref, nu_lo_ref, shift_ref, xnu_ref, stild_ref, hw_ref,
            ad_ref, zlor_ref, k3v_ref, k3l_ref, ya_ref, yb_ref, sdep_ref,
            fo2_ref, fco2_ref, fcpl_ref, fxf1_ref, fxf15_ref, fval_ref,
            onehot_ref, out_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    wn_hi = wn_hi_ref[0, :][:, None]       # [W, 1]
    wn_lo = wn_lo_ref[0, :][:, None]
    nu_hi = nu_hi_ref[0, :][None, :]       # [1, Nt]
    nu_lo = nu_lo_ref[0, :][None, :]
    # per-(layer, line) operands arrive as [L, 1, N] blocks of (1, 1, Nt)
    # so that the blocked trailing dims (1, Nt) match the array dims --
    # the Mosaic lowering requires (8,128)-divisible or full-dim blocks.
    shift = shift_ref[0, 0, :][None, :]
    xnu = xnu_ref[0, 0, :][None, :]
    stild = stild_ref[0, 0, :][None, :]
    hw = hw_ref[0, 0, :][None, :]
    ad = ad_ref[0, 0, :][None, :]
    zlor = zlor_ref[0, 0, :][None, :]
    k3v = k3v_ref[0, 0, :][None, :]
    k3l = k3l_ref[0, 0, :][None, :]
    ya = ya_ref[0, 0, :][None, :]
    yb = yb_ref[0, 0, :][None, :]
    sdep = sdep_ref[0, 0, :][None, :]
    is_o2 = fo2_ref[0, :][None, :] > 0.5
    is_co2 = fco2_ref[0, :][None, :] > 0.5
    has_cpl = fcpl_ref[0, :][None, :] > 0.5
    xf1 = fxf1_ref[0, :][None, :] > 0.5
    xf15 = fxf15_ref[0, :][None, :] > 0.5
    valid = fval_ref[0, :][None, :] > 0.5

    d1 = (wn_hi - nu_hi) + (wn_lo - nu_lo) - shift          # [W, Nt]
    dsum = wn_hi + xnu

    mirror = (dsum - DELTNU_CUT) <= 0.0
    within = jnp.abs(d1) <= DELTNU_CUT
    keep = (within | is_o2) & valid

    # whole-block skip: nothing in this [W, Nt] block is inside the
    # 25 cm^-1 window (and the tile has no O2 lines) — e.g. far line
    # tiles on wide spectral grids
    @pl.when(jnp.any(keep))
    def _():
        use_lor = (jnp.abs(d1) > 100.0 * ad) | (zlor > 0.5)
        any_voigt = jnp.any(keep & ~use_lor)

        def K(dd, dl):
            # block-level skip of the SD-Voigt/Humlicek machinery when
            # every surviving line uses the Lorentz limit (the common MW
            # case: zeta > 0.99 at tropospheric pressures, zlor
            # precomputed per layer x line); identical results — the
            # gated branch evaluates all lanes exactly as before
            def full():
                dv = sdvoigt(dd, hw, ad, jnp.broadcast_to(sdep, dd.shape),
                             gate=True)
                return jnp.where(use_lor, dl, dv)

            return jax.lax.cond(any_voigt, full, lambda: dl)

        k1 = K(d1, xlorentz(d1 / hw) / hw)
        # the wn+nu mirror term is only consumed where mirror holds
        # (lines within 25 cm^-1 of 0) or for coupled O2 lines
        # (modm.f90:649-704); skip its shape evaluations otherwise
        k2 = jax.lax.cond(
            jnp.any((mirror & keep) | (is_o2 & has_cpl & valid)),
            lambda: K(dsum, xlorentz(dsum / hw) / hw),
            lambda: jnp.zeros_like(d1))
        k3 = jnp.where(use_lor, k3l, k3v)

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
            jnp.where(xf15, k1 * y1 - xp4 - k3 * ((y1 - 1.0) * ped), k1 - xp4),
            k1 - xp4)
        sls = jnp.where(is_o2, sls_o2, jnp.where(is_co2, sls_co2, sls_other))

        contrib = jnp.where(keep, sls, 0.0) * stild

        out_ref[0, :, :] += jnp.dot(contrib, onehot_ref[...],
                                    preferred_element_type=jnp.float32)


def line_od_pallas(cat: dict, wn64: np.ndarray, p, t, wk, wbrod, scor_flat,
                   cfg: LineConfig, n_mol: int, line_tile: int = 512,
                   interpret: bool | None = None):
    """Line OD on [L, W, n_mol] via the Pallas kernel (f32 only).

    wn64: [W] float64 host grid (W should be a multiple of 128).
    p/t/wk/wbrod/scor_flat carry a single flat layer axis L.
    interpret=None auto-selects: compiled Mosaic on TPU, interpreter
    elsewhere (CPU test meshes), so the same call sites work everywhere.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtype = jnp.float32
    pre = precompute(cat, p, t, wk, wbrod, scor_flat, cfg, dtype)
    L = pre["stild"].shape[0]
    n = pre["stild"].shape[-1]
    nt = min(line_tile, n)
    assert n % nt == 0, (n, nt)
    n_lt = n // nt

    wn_hi = np.asarray(wn64, np.float64).astype(np.float32)
    wn_lo = (np.asarray(wn64, np.float64) - wn_hi.astype(np.float64)
             ).astype(np.float32)
    w = len(wn_hi)

    onehot = jax.nn.one_hot(cat["mol"] - 1, n_mol, dtype=dtype)

    per_ln = ["shift", "xnu", "stild", "hw", "ad", "zlor", "k3v", "k3l",
              "ya", "yb", "sdep"]
    flags = ["o2", "co2", "cpl", "xf1", "xf15", "valid"]

    # index maps return explicit i32 numpy literals: Python ints would
    # trace as i64 under jax_enable_x64 (Mosaic rejects i64) and jnp
    # arrays would be captured consts (pallas rejects those)
    z = np.int32(0)
    in_specs = [
        pl.BlockSpec((1, w), lambda l, j: (z, z)),   # wn_hi
        pl.BlockSpec((1, w), lambda l, j: (z, z)),   # wn_lo
        pl.BlockSpec((1, nt), lambda l, j: (z, j)),  # nu_hi
        pl.BlockSpec((1, nt), lambda l, j: (z, j)),  # nu_lo
    ]
    args = [jnp.asarray(wn_hi)[None, :], jnp.asarray(wn_lo)[None, :],
            pre["nu_hi"][None, :], pre["nu_lo"][None, :]]
    for k in per_ln:
        v = pre[k]
        v = jnp.broadcast_to(v, (L, n)) if v.ndim == 1 else v
        args.append(v[:, None, :])           # [L, 1, N]
        in_specs.append(pl.BlockSpec((1, 1, nt), lambda l, j: (l, z, j)))
    for k in flags:
        args.append(pre["flags"][k][None, :])
        in_specs.append(pl.BlockSpec((1, nt), lambda l, j: (z, j)))
    args.append(onehot)
    in_specs.append(pl.BlockSpec((nt, n_mol), lambda l, j: (j, z)))

    sf = pl.pallas_call(
        _kernel,
        grid=(L, n_lt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, w, n_mol), lambda l, j: (l, z, z)),
        out_shape=jax.ShapeDtypeStruct((L, w, n_mol), jnp.float32),
        interpret=interpret,
    )(*args)

    # od = RFT * W_species * SF (modm.f90:436-438)
    t_ = jnp.asarray(t, dtype)
    wn_d = jnp.asarray(wn_hi, dtype)
    rft = wn_d * jnp.tanh(cst.RADCT * wn_d / (2.0 * t_[..., None]))
    wk_m = jnp.asarray(wk, dtype)[..., :n_mol]
    return rft[..., :, None] * wk_m[..., None, :] * sf.astype(dtype)
