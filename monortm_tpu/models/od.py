"""Optical-depth model: lines + continuum + cloud (+ cross-sections).

The TPU-native equivalent of MODM (modm.f90:21-274).  A `ODModel` is built
once per run (static wavenumber grid, catalog, continuum plan); its
__call__ is a pure jittable function of the layered state, batched over an
optional leading profile axis and shardable with pjit over wavenumbers and
profiles.

Work partitioning: wavenumbers are processed in tiles via lax.map, lines in
tiles via lax.scan — bounding peak memory at [nlay, wn_tile, line_tile]
while keeping the one-hot molecule attribution matmuls MXU-shaped.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from monortm_tpu.lines import PackedCatalog
from monortm_tpu.ops.cloud import od_clw
from monortm_tpu.ops.continuum import ContinuumPlan, ContinuumFactors, SPECIES
from monortm_tpu.ops.lineshape import LineConfig, catalog_to_device, line_od_block
from monortm_tpu.ops.tips import tips_scor
from monortm_tpu.types import LayerState

# continuum species -> molecule slot it contributes to (modm.f90:265-269)
_CONT_MOL = {"h2o": 0, "co2": 1, "o3": 2, "o2": 6, "n2": 21}


@dataclasses.dataclass
class ODResult:
    od_total: Any       # [..., W, L]   total layer OD (wn-major like O(M,K))
    od_by_mol: Any      # [..., W, M, L] line OD per molecule
    oc: Any             # dict species -> [..., L, W] continuum OD
    od_clw: Any         # [..., L, W]
    od_xsec: Any        # [..., L, W] or None


class ODModel:
    def __init__(self, wn: np.ndarray, dvset: float, catalog: PackedCatalog,
                 nmol: int = 39,
                 factors: ContinuumFactors = ContinuumFactors(),
                 line_cfg: LineConfig = LineConfig(),
                 dtype=jnp.float32,
                 wn_tile: int = 128, line_tile: int = 4096):
        self.wn64 = np.asarray(wn, np.float64)
        self.nwn = len(self.wn64)
        self.nmol = int(nmol)
        self.dtype = dtype
        self.line_cfg = line_cfg
        self.cont = ContinuumPlan(self.wn64, dvset=dvset, factors=factors,
                                  nmol=nmol)
        self.catalog = catalog
        self.dev_cat = catalog_to_device(catalog, dtype)

        # wavenumber tiling (pad with sentinel far from any physical line)
        self.wn_tile = min(wn_tile, max(8, self.nwn))
        npad = -(-self.nwn // self.wn_tile) * self.wn_tile
        wn_pad = np.full(npad, 1.0e6, np.float64)
        wn_pad[:self.nwn] = self.wn64
        self.wn_tiles = wn_pad.reshape(-1, self.wn_tile)
        self.n_wtiles = self.wn_tiles.shape[0]

        # line tiling: split the device catalog into stacked tiles
        n = len(catalog)
        self.line_tile = min(line_tile, n)
        assert n % self.line_tile == 0 or n == 0
        self.n_ltiles = max(1, n // self.line_tile)

        def tile_col(v):
            if v.ndim == 1:
                return v.reshape(self.n_ltiles, self.line_tile)
            return v.reshape(self.n_ltiles, self.line_tile, *v.shape[1:])

        self.dev_cat_tiled = {k: tile_col(v) for k, v in self.dev_cat.items()}

    # ------------------------------------------------------------------
    def line_od(self, state: LayerState, scor_flat):
        """Per-molecule line OD [..., W, M, L] over the full grid."""
        dtype = self.dtype
        wn_t = jnp.asarray(self.wn_tiles, dtype if dtype == jnp.float64
                           else jnp.float64)

        p, t = jnp.asarray(state.p, dtype), jnp.asarray(state.t, dtype)
        wk = jnp.asarray(state.wkl, dtype)
        wb = jnp.asarray(state.wbrodl, dtype)

        def one_wtile(wn_chunk64):
            if dtype == jnp.float64:
                wn_c = wn_chunk64
                split = None
            else:
                wn_hi = wn_chunk64.astype(jnp.float32)
                wn_lo = (wn_chunk64 - wn_hi.astype(jnp.float64)).astype(jnp.float32)
                wn_c = wn_hi.astype(dtype)
                split = (wn_hi.astype(dtype), wn_lo.astype(dtype))

            def body(acc, cat_tile):
                od = line_od_block(cat_tile, wn_c, split, p, t, wk, wb,
                                   scor_flat, self.line_cfg, self.nmol,
                                   dtype)
                return acc + od, None

            init = jnp.zeros(t.shape + (self.wn_tile, self.nmol), dtype)
            acc, _ = jax.lax.scan(body, init, self.dev_cat_tiled)
            return acc

        # [n_wtiles, ..., wn_tile, M]
        tiles = jax.lax.map(one_wtile, wn_t)
        # -> [..., n_wtiles*wn_tile, M] -> crop padding
        perm = tuple(range(1, tiles.ndim - 2)) + (0, tiles.ndim - 2,
                                                  tiles.ndim - 1)
        out = jnp.transpose(tiles, perm)
        out = out.reshape(out.shape[:-3] + (self.n_wtiles * self.wn_tile,
                                            self.nmol))
        return out[..., :self.nwn, :]

    # ------------------------------------------------------------------
    def __call__(self, state: LayerState, od_xsec=None) -> ODResult:
        """Full OD computation (modm.f90:200-272).

        state fields carry layer axis last (after any profile batch axes).
        Outputs use [..., L, W] layout except od_total / od_by_mol which
        match the reference's O(M,K) wn-major convention transposed to
        [..., W, L] for direct use by the RT solver.
        """
        dtype = self.dtype
        scor = tips_scor(jnp.asarray(state.t, dtype), dtype=dtype)
        scor_flat = scor.reshape(scor.shape[:-2] + (39 * 9,))

        # lines: [..., L, W, M] (layer axis comes from broadcasting p/t)
        od_lines = self.line_od(state, scor_flat)

        # continuum per species: dict -> [..., L, W]
        oc = self.cont(state.p, state.t, state.wkl, state.wbrodl, dtype=dtype)

        # cloud liquid water (modm.f90:264)
        wn_d = jnp.asarray(self.wn64, dtype)
        o_clw = od_clw(wn_d, jnp.asarray(state.t, dtype)[..., None],
                       jnp.asarray(state.clw, dtype)[..., None])

        # cross-section OD is precomputed on the host ([..., L, W];
        # ops/xsec.py) — tiny workload, data-dependent truncation
        o_x = None if od_xsec is None else jnp.asarray(od_xsec, dtype)

        total = jnp.sum(od_lines, axis=-1)                    # [..., L, W]
        for sp in SPECIES[:-1]:
            total = total + oc[sp]
        total = total + oc["rayleigh"] + o_clw
        if o_x is not None:
            total = total + o_x

        # reorder to RT convention [..., W, L]
        od_total = jnp.moveaxis(total, -2, -1)
        od_by_mol = jnp.moveaxis(od_lines, -3, -1)            # [..., W, M, L]
        return ODResult(od_total=od_total, od_by_mol=od_by_mol, oc=oc,
                        od_clw=o_clw, od_xsec=o_x)
