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
from jax import shard_map
from jax.sharding import PartitionSpec as P

from monortm_tpu import constants as cst
from monortm_tpu.lines import PackedCatalog
from monortm_tpu.ops.cloud import od_clw
from monortm_tpu.ops.continuum import ContinuumPlan, ContinuumFactors, SPECIES
from monortm_tpu.ops.lineshape import (LineConfig, catalog_to_host,
                                       line_od_block)
from monortm_tpu.ops.tips import tips_scor
from monortm_tpu.types import LayerState

# continuum species -> molecule slot it contributes to (modm.f90:265-269)
_CONT_MOL = {"h2o": 0, "co2": 1, "o3": 2, "o2": 6, "n2": 21}


@jax.tree_util.register_dataclass
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
                 wn_tile: int = 128, line_tile: int = 4096,
                 use_pallas: bool | None = None,
                 pallas_wn_tile: int = 128, pallas_line_tile: int = 256,
                 pallas_layer_tile: int = 1, pallas_wsub: int = 1,
                 pallas_engine: str = "pallas",
                 mesh=None):
        self.wn64 = np.asarray(wn, np.float64)
        self.nwn = len(self.wn64)
        self.nmol = int(nmol)
        self.dtype = dtype
        self.line_cfg = line_cfg
        # (prof, wn) device mesh: when set, the line engines run under
        # shard_map — profiles split over "prof", wavenumber tiles over
        # "wn" — and the continuum/RT stages follow by SPMD propagation.
        # The mesh is a *static* property of the model (it shapes the
        # wn-tile padding below so every shard gets equal tile counts).
        self.mesh = mesh if (mesh is not None
                             and np.prod(list(mesh.shape.values())) > 1) \
            else None
        shape = dict(self.mesh.shape) if self.mesh else {}
        self._n_wn_shards = shape.get("wn", 1)
        self._n_prof_shards = shape.get("prof", 1)
        # optional third axis: the candidate-tile (line) axis is
        # contracted across "line" shards with one psum per forward —
        # parallel/linesharded.py's pattern, composed into both engines
        self._n_line_shards = shape.get("line", 1)
        self.cont = ContinuumPlan(self.wn64, dvset=dvset, factors=factors,
                                  nmol=nmol)
        self.catalog = catalog
        # host copy for tile/plan building — and for everything below:
        # every plan/tile array stays NUMPY at build time and becomes a
        # trace-time constant inside the jitted engines.  Eager
        # jnp.asarray uploads here (~100 small arrays) each cost a
        # device round trip, which on tunneled backends stalls model
        # construction by seconds to minutes (found via the e2e
        # profiles/s bench).
        self.host_cat = catalog_to_host(catalog, dtype)
        self.dev_cat = self.host_cat
        # Pallas line-sum fast path (f32 only; ops/linesum_pallas.py).
        # None = auto: use it whenever the default backend is a TPU.
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = bool(use_pallas) and dtype == jnp.float32

        # wavenumber tiling (pad with sentinel far from any physical line);
        # tile count padded to a multiple of the mesh's wn axis so every
        # shard holds the same number of tiles
        self.wn_tile = min(wn_tile, max(8, self.nwn))
        ntiles = -(-self.nwn // self.wn_tile)
        ntiles = -(-ntiles // self._n_wn_shards) * self._n_wn_shards
        npad = ntiles * self.wn_tile
        wn_pad = np.full(npad, 1.0e6, np.float64)
        wn_pad[:self.nwn] = self.wn64
        self.wn_tiles = wn_pad.reshape(-1, self.wn_tile)
        self.n_wtiles = self.wn_tiles.shape[0]
        # two-float split prepared on host (device f64 is unavailable
        # without x64; the split is exact in f64 numpy)
        self.wn_tiles_hi = self.wn_tiles.astype(np.float32)
        self.wn_tiles_lo = (self.wn_tiles
                            - self.wn_tiles_hi.astype(np.float64)
                            ).astype(np.float32)

        self._build_line_tiles(catalog, line_tile)
        if self.use_pallas:
            self.pallas_engine = pallas_engine
            self.pallas_lt = int(pallas_layer_tile)
            self.pallas_wsub = int(pallas_wsub)
            self._build_pallas_plan(catalog, nt=pallas_line_tile,
                                    wt=pallas_wn_tile)
            plan_p = self._snapshot_plan()
            # the lean all-Lorentz XLA engine runs fastest on smaller
            # tiles than the Pallas kernel (BENCH_NOTES round-4
            # resweep: nt=128/wt=128 -> 19.9 ms vs 26 ms on the shared
            # nt=256 plan), so it gets its own plan over the same
            # catalog unless the tiles already match
            if (pallas_line_tile, pallas_wn_tile) != (128, 128):
                self._build_pallas_plan(catalog, nt=128, wt=128)
                self._plan_lorentz = self._snapshot_plan()
                for k, v in plan_p.items():
                    setattr(self, "pallas_" + k, v)
            else:
                self._plan_lorentz = plan_p

    def _build_line_tiles(self, catalog: PackedCatalog, line_tile: int):
        """Split the catalog into (a) O2 tiles — processed for every
        wavenumber tile (no 25 cm^-1 cut for O2, modm.f90:384) — and
        (b) nu-sorted windowed tiles with a static candidate list per
        wavenumber tile.  Padding candidates point at tile 0; their
        contributions are zeroed by the in-kernel window mask, so the
        pruning is purely an optimisation with identical results."""
        n = len(catalog)
        is_o2 = (catalog.mol == 7) & catalog.valid
        idx_o2 = np.nonzero(is_o2)[0]
        idx_win = np.nonzero(~is_o2 & catalog.valid)[0]
        idx_win = idx_win[np.argsort(catalog.nu0[idx_win], kind="stable")]

        def tiles_from(idx, k_mult: int = 1):
            nt = min(line_tile, max(8, len(idx)))
            k = max(1, -(-len(idx) // nt))
            k = -(-k // k_mult) * k_mult
            full = np.zeros(k * nt, np.int64)
            full[:len(idx)] = idx
            mask = np.zeros(k * nt, bool)
            mask[:len(idx)] = True
            return full.reshape(k, nt), mask.reshape(k, nt)

        # O2 tiles split across "line" shards (each shard scans its
        # slice, partials psum'd), so pad the tile count to a multiple
        self._o2_rows = tiles_from(idx_o2, self._n_line_shards) \
            if len(idx_o2) else None
        self._win_rows = tiles_from(idx_win) if len(idx_win) else None

        def gather_tiles(rows_mask):
            rows, mask = rows_mask
            out = {k: v[rows] for k, v in self.host_cat.items()}
            # padding rows repeat index 0 — mask them out explicitly
            out["valid"] = np.asarray(self.catalog.valid)[rows] & mask
            return out

        self.o2_tiles = gather_tiles(self._o2_rows) \
            if self._o2_rows is not None else None
        self.win_tiles = gather_tiles(self._win_rows) \
            if self._win_rows is not None else None

        # candidate windowed tiles per wavenumber tile (host, static);
        # margin covers pressure shifts so a shifted line centre at a
        # tile edge cannot be pruned while inside the 25 cm^-1 window
        if self._win_rows is not None:
            rows, mask = self._win_rows
            margin = 25.0
            if len(catalog.pshift):
                margin += 2.0 * float(np.max(np.abs(catalog.pshift)))
            nu = np.where(mask, catalog.nu0[rows], np.nan)
            lo = np.nanmin(nu, axis=1) - margin
            hi = np.nanmax(nu, axis=1) + margin
            cands = []
            for wt in self.wn_tiles:
                w = wt[wt < 9.0e5]
                wmin, wmax = (w.min(), w.max()) if len(w) else (0.0, 0.0)
                sel = np.nonzero((lo <= wmax) & (hi >= wmin))[0]
                cands.append(sel)
            kmax = max((len(c) for c in cands), default=0)
            self.n_cand = max(kmax, 1)
            # candidate slots split across "line" shards: equal columns
            self.n_cand = (-(-self.n_cand // self._n_line_shards)
                           * self._n_line_shards)
            cand_idx = np.zeros((self.n_wtiles, self.n_cand), np.int32)
            cand_mask = np.zeros((self.n_wtiles, self.n_cand), bool)
            for i, c in enumerate(cands):
                cand_idx[i, :len(c)] = c
                cand_mask[i, :len(c)] = True
            self.cand_idx = cand_idx
            self.cand_mask = cand_mask
        else:
            self.n_cand = 0

    def _snapshot_plan(self) -> dict:
        """The most recently built block-sparse plan, as a dict."""
        return {k: getattr(self, "pallas_" + k)
                for k in ("cat", "nt", "wt", "wn_hi", "wn_lo",
                          "cand_map", "cand_valid")}

    # ------------------------------------------------------------------
    def _build_pallas_plan(self, catalog: PackedCatalog, nt: int, wt: int):
        """Block-sparse plan for the Pallas kernel (ops/linesum_pallas.py).

        Lines are re-ordered into nu-sorted windowed tiles of `nt` followed
        by O2 tiles (O2 is exempt from the 25 cm^-1 cut, modm.f90:384);
        each wavenumber tile of `wt` gets a static candidate list of the
        windowed tiles overlapping its +-25 cm^-1 reach plus every O2
        tile.  Padding slots map to tile 0 with valid=0 and are skipped
        in-kernel, so pruning is purely an optimisation.
        """
        # lane-dim blocks must be 128-divisible (pallas_guide: tiling)
        nt = max(128, (nt // 128) * 128)
        wt = max(128, (wt // 128) * 128)
        valid = np.asarray(catalog.valid)
        is_o2 = (np.asarray(catalog.mol) == 7) & valid
        idx_o2 = np.nonzero(is_o2)[0]
        idx_win = np.nonzero(~is_o2 & valid)[0]
        nu0 = np.asarray(catalog.nu0)
        idx_win = idx_win[np.argsort(nu0[idx_win], kind="stable")]

        def tiles_from(idx):
            k = max(1, -(-len(idx) // nt))
            rows = np.zeros(k * nt, np.int64)
            rows[:len(idx)] = idx
            mask = np.zeros(k * nt, bool)
            mask[:len(idx)] = True
            return rows.reshape(k, nt), mask.reshape(k, nt)

        win_rows, win_mask = tiles_from(idx_win)
        k_win = win_rows.shape[0] if len(idx_win) else 0
        parts = [(win_rows, win_mask)] if k_win else []
        k_o2 = 0
        if len(idx_o2):
            o2_rows, o2_mask = tiles_from(idx_o2)
            k_o2 = o2_rows.shape[0]
            parts.append((o2_rows, o2_mask))
        if not parts:                       # empty catalog: one dead tile
            parts = [tiles_from(np.zeros(0, np.int64))]
            k_win = 1
        rows = np.concatenate([p[0] for p in parts]).reshape(-1)
        mask = np.concatenate([p[1] for p in parts]).reshape(-1)

        self.pallas_cat = {k: v[rows] for k, v in self.host_cat.items()}
        self.pallas_cat["valid"] = \
            np.asarray(self.catalog.valid)[rows] & mask
        self.pallas_nt = nt
        self.pallas_wt = wt

        # padded wavenumber grid + host two-float split; tile count padded
        # to a multiple of the mesh's wn axis (equal tiles per shard)
        n_wtile = max(1, -(-self.nwn // wt))
        n_wtile = -(-n_wtile // self._n_wn_shards) * self._n_wn_shards
        wp = n_wtile * wt
        wn_pad = np.full(wp, 1.0e6, np.float64)
        wn_pad[:self.nwn] = self.wn64
        self.pallas_wn_hi = wn_pad.astype(np.float32)
        self.pallas_wn_lo = (wn_pad - self.pallas_wn_hi.astype(np.float64)
                             ).astype(np.float32)
        n_wt = wp // wt

        # candidate tiles per wavenumber tile: windowed tiles whose nu
        # range (pressure-shift margin included) reaches within 25 cm^-1,
        # plus every O2 tile
        margin = 25.0
        if len(catalog.pshift):
            margin += 2.0 * float(np.max(np.abs(catalog.pshift)))
        cands = []
        if k_win and len(idx_win):
            nu_t = np.where(win_mask, nu0[win_rows], np.nan)
            lo = np.nanmin(nu_t, axis=1) - margin
            hi = np.nanmax(nu_t, axis=1) + margin
        for i in range(n_wt):
            w = wn_pad[i * wt:(i + 1) * wt]
            w = w[w < 9.0e5]
            sel = []
            if k_win and len(idx_win) and len(w):
                wmin, wmax = w.min(), w.max()
                sel = list(np.nonzero((lo <= wmax) & (hi >= wmin))[0])
            sel += list(range(k_win, k_win + k_o2))    # O2 tiles always
            cands.append(sel)
        n_cand = max(max((len(c) for c in cands), default=0), 1)
        # equal candidate columns per "line" shard (psum-contracted)
        n_cand = -(-n_cand // self._n_line_shards) * self._n_line_shards
        cmap = np.zeros((n_wt, n_cand), np.int32)
        cvalid = np.zeros((n_wt, n_cand), np.int32)
        for i, c in enumerate(cands):
            cmap[i, :len(c)] = c
            cvalid[i, :len(c)] = 1
        self.pallas_cand_map = cmap
        self.pallas_cand_valid = cvalid

    def line_od_pallas(self, state: LayerState, scor_flat,
                       engine: str | None = None, lor_layers=None):
        """Line OD via the Pallas kernel: [..., L, W, M].

        Leading batch axes are flattened into the kernel's layer grid
        dimension; per-wavenumber-tile candidate pruning (the static
        block-sparse plan above) keeps the sweep sub-linear in far lines
        while the in-kernel 25 cm^-1 mask preserves exact semantics.

        engine="hybrid" splits the layer axis: the (static) lor_layers
        indices — layers whose every line passes the zeta > 0.99 test —
        sweep through the lean all-Lorentz XLA engine, the rest through
        the full Pallas kernel; results are scattered back in layer
        order.  Layer-axis gathers run along an unsharded axis, so the
        (prof, wn) mesh composition is untouched.
        """
        if (engine or self.pallas_engine) == "hybrid":
            import numpy as _np
            L = state.p.shape[-1]
            lor = sorted(int(i) for i in (lor_layers or ()))
            voigt = [i for i in range(L) if i not in set(lor)]
            if not lor or not voigt:
                only = "lorentz-xla" if lor else "pallas"
                return self.line_od_pallas(state, scor_flat, engine=only)

            def sub(idxs):
                ix = _np.asarray(idxs, _np.int32)
                st = LayerState(
                    p=jnp.take(state.p, ix, axis=-1),
                    t=jnp.take(state.t, ix, axis=-1),
                    tz=state.tz,
                    wkl=jnp.take(state.wkl, ix, axis=-2),
                    wbrodl=jnp.take(state.wbrodl, ix, axis=-1),
                    clw=state.clw)
                return st, jnp.take(scor_flat, ix, axis=-2)

            sL, scL = sub(lor)
            sV, scV = sub(voigt)
            outL = self.line_od_pallas(sL, scL, engine="lorentz-xla")
            outV = self.line_od_pallas(sV, scV, engine="pallas")
            # scatter each engine's layers into a preallocated buffer
            # (layer sets are disjoint and static): peak extra memory is
            # one full-size buffer + the larger part, instead of the
            # concatenate + inverse-permutation take's two full copies
            out = jnp.zeros(outL.shape[:-3] + (L,) + outL.shape[-2:],
                            outL.dtype)
            ixL = jnp.asarray(_np.asarray(lor, _np.int32))
            ixV = jnp.asarray(_np.asarray(voigt, _np.int32))
            out = out.at[..., ixL, :, :].set(outL, unique_indices=True,
                                             indices_are_sorted=True)
            return out.at[..., ixV, :, :].set(outV, unique_indices=True,
                                              indices_are_sorted=True)
        from monortm_tpu.ops.linesum_pallas import line_od_pallas

        p = jnp.asarray(state.p, self.dtype)
        lead = p.shape                       # [..., L]

        flat = lambda a, trail: jnp.asarray(a, self.dtype).reshape(
            (-1,) + trail)
        flat_args = (flat(state.p, ()), flat(state.t, ()),
                     flat(state.wkl, (state.wkl.shape[-1],)),
                     flat(state.wbrodl, ()),
                     scor_flat.reshape(-1, scor_flat.shape[-1]))
        if (engine or self.pallas_engine) == "lorentz-xla":
            # all-Lorentz XLA sweep over the same block-sparse plan
            # (exact when zeta > 0.99 everywhere; ops/linesum_lorentz.py)
            from monortm_tpu.ops.linesum_lorentz import line_od_lorentz_xla
            pl_ = self._plan_lorentz
            sf = line_od_lorentz_xla(
                pl_["cat"], pl_["wn_hi"], pl_["wn_lo"],
                pl_["cand_map"], pl_["cand_valid"],
                pl_["nt"], pl_["wt"], *flat_args,
                cfg=self.line_cfg, n_mol=self.nmol, mesh=self.mesh)
        else:
            sf = line_od_pallas(
                self.pallas_cat, self.pallas_wn_hi, self.pallas_wn_lo,
                self.pallas_cand_map, self.pallas_cand_valid,
                self.pallas_nt, self.pallas_wt, *flat_args,
                cfg=self.line_cfg, n_mol=self.nmol, mesh=self.mesh,
                lt=self.pallas_lt, wsub=self.pallas_wsub)
        sf = sf.reshape(lead + sf.shape[1:])[..., :self.nwn, :]

        # od = RFT * W_species * SF (modm.f90:436-438)
        t_ = jnp.asarray(state.t, self.dtype)
        wn_d = jnp.asarray(self.pallas_wn_hi[:self.nwn], self.dtype)
        rft = wn_d * jnp.tanh(cst.RADCT * wn_d / (2.0 * t_[..., None]))
        wk_m = jnp.asarray(state.wkl, self.dtype)[..., :self.nmol]
        return rft[..., :, None] * wk_m[..., None, :] * sf

    def _one_wtile(self, args, p, t, wk, wb, scor_flat, vma=(),
                   o2_tiles="model"):
        """Line sum for one wavenumber tile: [..., wn_tile, nmol].

        vma: mesh axis names when called inside shard_map — the scan
        carry must be marked varying over them (JAX vma typing).
        o2_tiles: "model" scans self.o2_tiles; a tree scans that (the
        line-sharded path passes each shard's slice); None skips."""
        dtype = self.dtype
        *wn_chunks, cand_idx, cand_mask = args
        if dtype == jnp.float64:
            wn_c = wn_chunks[0]
            split = None
        else:
            wn_hi, wn_lo = wn_chunks
            wn_c = wn_hi
            split = (wn_hi, wn_lo)

        acc = jnp.zeros(t.shape + (self.wn_tile, self.nmol), dtype)
        if vma:
            acc = jax.lax.pcast(acc, vma, to="varying")

        def block(cat_tile):
            return line_od_block(cat_tile, wn_c, split, p, t, wk, wb,
                                 scor_flat, self.line_cfg, self.nmol,
                                 dtype)

        if self.win_tiles is not None:
            # trace-time constant conversion (the tiles are host numpy;
            # v[k] with a traced k needs device arrays)
            win = jax.tree_util.tree_map(jnp.asarray, self.win_tiles)

            def body_w(a, km):
                k, m = km
                tile = jax.tree_util.tree_map(lambda v: v[k], win)
                od = block(tile)
                return a + jnp.where(m, od, 0.0), None

            acc, _ = jax.lax.scan(body_w, acc, (cand_idx, cand_mask))

        if o2_tiles == "model":
            o2_tiles = self.o2_tiles
        if o2_tiles is not None:
            def body_o2(a, tile):
                return a + block(tile), None

            acc, _ = jax.lax.scan(body_o2, acc, o2_tiles)
        return acc

    def line_od(self, state: LayerState, scor_flat):
        """Per-molecule line OD [..., W, M, L] over the full grid."""
        dtype = self.dtype
        if dtype == jnp.float64:
            wn_args = (jnp.asarray(self.wn_tiles, dtype),)
        else:
            # hi/lo split prepared on host (f64 numpy) — requesting f64 on
            # device would silently truncate without x64 enabled
            wn_args = (jnp.asarray(self.wn_tiles_hi, dtype),
                       jnp.asarray(self.wn_tiles_lo, dtype))

        p, t = jnp.asarray(state.p, dtype), jnp.asarray(state.t, dtype)
        wk = jnp.asarray(state.wkl, dtype)
        wb = jnp.asarray(state.wbrodl, dtype)

        # [n_wtiles, ..., wn_tile, M]
        if self.n_cand:
            cargs = wn_args + (self.cand_idx, self.cand_mask)
        else:
            cargs = wn_args + (jnp.zeros((self.n_wtiles, 0), jnp.int32),
                               jnp.zeros((self.n_wtiles, 0), bool))
        if self.mesh is not None:
            # split the wn-tile sweep over "wn" and the profile batch over
            # "prof"; each shard runs the identical lax.map over its local
            # tiles against the replicated line-tile catalogs — results
            # are bitwise identical to the single-device sweep
            if p.ndim != 2:
                raise ValueError("mesh execution requires a [batch, nlay] "
                                 f"state, got p.shape={p.shape}")
            b = p.shape[0]
            if b % self._n_prof_shards:
                raise ValueError(
                    f"profile batch {b} not divisible by mesh prof axis "
                    f"{self._n_prof_shards}; pad the batch")

            n_line = self._n_line_shards
            vma = ("prof", "wn") + (("line",) if n_line > 1 else ())

            def mapped(cargs_, o2_, p_, t_, wk_, wb_, sc_):
                tiles_ = jax.lax.map(
                    lambda c: self._one_wtile(c, p_, t_, wk_, wb_, sc_,
                                              vma=vma, o2_tiles=o2_),
                    cargs_)
                if n_line > 1:
                    # contract the candidate/O2-tile partials (the
                    # line-axis psum of parallel/linesharded.py)
                    tiles_ = jax.lax.psum(tiles_, "line")
                return tiles_

            # wn-tile arrays split over "wn"; the candidate columns (and
            # the O2 tile stack) additionally split over "line"
            line_ax = "line" if n_line > 1 else None
            wn_specs = (P("wn", None),) * len(wn_args) \
                + (P("wn", line_ax), P("wn", line_ax))
            o2_arg = self.o2_tiles
            o2_spec = None
            if o2_arg is not None:
                o2_spec = jax.tree_util.tree_map(
                    lambda v: P(line_ax, *(None,) * (v.ndim - 1)), o2_arg)
            pr = lambda a: P("prof", *(None,) * (np.ndim(a) - 1))
            tiles = shard_map(
                mapped, mesh=self.mesh,
                in_specs=(wn_specs, o2_spec, pr(p), pr(t), pr(wk), pr(wb),
                          pr(scor_flat)),
                out_specs=P("wn", "prof", None, None, None),
            )(cargs, o2_arg, p, t, wk, wb, scor_flat)
        else:
            tiles = jax.lax.map(
                lambda c: self._one_wtile(c, p, t, wk, wb, scor_flat),
                cargs)
        # -> [..., n_wtiles*wn_tile, M] -> crop padding
        perm = tuple(range(1, tiles.ndim - 2)) + (0, tiles.ndim - 2,
                                                  tiles.ndim - 1)
        out = jnp.transpose(tiles, perm)
        out = out.reshape(out.shape[:-3] + (self.n_wtiles * self.wn_tile,
                                            self.nmol))
        return out[..., :self.nwn, :]

    # ------------------------------------------------------------------
    def all_lorentz(self, state: LayerState, scor_flat=None,
                    per_layer: bool = False, margin: float = 0.0):
        """Device scalar: True iff every valid (layer, line) pair takes
        the Lorentz branch (zeta > 0.99, modm.f90:427) — the regime in
        which the all-Lorentz XLA engine (ops/linesum_lorentz.py) is
        exactly equal to the full kernel.  The pipeline evaluates this
        per profile chunk to pick the faster engine at runtime."""
        from monortm_tpu.ops.linesum_lorentz import all_lorentz_predicate
        from monortm_tpu.ops.tips import tips_scor
        dtype = self.dtype
        if scor_flat is None:
            scor = tips_scor(jnp.asarray(state.t, dtype), dtype=dtype)
            scor_flat = scor.reshape(scor.shape[:-2] + (39 * 9,))
        return all_lorentz_predicate(
            self.dev_cat, jnp.asarray(state.p, dtype),
            jnp.asarray(state.t, dtype), jnp.asarray(state.wkl, dtype),
            jnp.asarray(state.wbrodl, dtype), scor_flat, self.line_cfg,
            dtype, per_layer=per_layer, margin=margin)

    def __call__(self, state: LayerState, od_xsec=None,
                 od_clw_in=None, engine: str | None = None,
                 lor_layers=None) -> ODResult:
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
        if self.use_pallas:
            od_lines = self.line_od_pallas(state, scor_flat, engine=engine,
                                           lor_layers=lor_layers)
        else:
            od_lines = self.line_od(state, scor_flat)

        # continuum per species: dict -> [..., L, W]
        oc = self.cont(state.p, state.t, state.wkl, state.wbrodl, dtype=dtype)

        # cloud liquid water (modm.f90:264); od_clw_in lets the caller
        # inject a precomputed cloud OD — the pipeline evaluates the TKC
        # chain in its own (mesh-independent) jit so mesh and
        # single-device runs stay bitwise identical
        wn_d = jnp.asarray(self.wn64, dtype)
        if od_clw_in is not None:
            o_clw = jnp.asarray(od_clw_in, dtype)
        else:
            o_clw = od_clw(wn_d, jnp.asarray(state.t, dtype)[..., None],
                           jnp.asarray(state.clw, dtype)[..., None])

        # cross-section OD is precomputed on the host ([..., L, W];
        # ops/xsec.py) — tiny workload, data-dependent truncation
        o_x = None if od_xsec is None else jnp.asarray(od_xsec, dtype)

        # molecule-axis sum in a FIXED sequential order (lax.scan): a
        # plain jnp.sum lets XLA pick a shape-dependent reduction order,
        # and under a (prof, wn) mesh the per-shard W extent changes that
        # order — the one reassociation that made mesh and single-device
        # od_total differ by 1 f32 ulp on case 1 (every *component* was
        # bitwise identical; found by the case-1 multi-controller
        # byte-compare).  The scan pins the chain, restoring the bitwise
        # mesh-independence guarantee end-to-end.
        mm = jnp.moveaxis(od_lines, -1, 0)
        total, _ = jax.lax.scan(lambda c, v: (c + v, None),
                                jnp.zeros(mm.shape[1:], mm.dtype), mm)
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
