"""Flagship forward model: layered state -> radiance / brightness temperature.

TPU-native equivalent of the reference driver's per-profile pipeline
(monortm.f90:357-588): MODM optical depths -> CALCTMR -> RTM.  Built once
per run (static grid/catalog/flags); `forward` is pure and jittable, and is
the function exposed to pjit/shard_map for multi-chip execution (profiles x
wavenumbers sharding).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from monortm_tpu import constants as cst
from monortm_tpu.lines import PackedCatalog
from monortm_tpu.models.od import ODModel, ODResult
from monortm_tpu.models.rt import rtm, RTResult
from monortm_tpu.ops.continuum import ContinuumFactors
from monortm_tpu.ops.lineshape import LineConfig
from monortm_tpu.types import LayerState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ForwardResult:
    rt: RTResult
    od: ODResult
    emis: Any
    refl: Any


class MonoRTM:
    """Configured forward model for one spectral setup."""

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
        self.wn = np.asarray(wn, np.float64)
        self.dtype = dtype
        self.mesh = mesh
        self.od_model = ODModel(wn, dvset, catalog, nmol=nmol,
                                factors=factors, line_cfg=line_cfg,
                                dtype=dtype, wn_tile=wn_tile,
                                line_tile=line_tile,
                                use_pallas=use_pallas,
                                pallas_wn_tile=pallas_wn_tile,
                                pallas_line_tile=pallas_line_tile,
                                pallas_layer_tile=pallas_layer_tile,
                                pallas_wsub=pallas_wsub,
                                pallas_engine=pallas_engine,
                                mesh=mesh)

    def forward(self, state: LayerState, tsfc, emis, refl, irt: int,
                od_xsec=None, engine: str | None = None,
                lor_layers=None) -> ForwardResult:
        """Complete forward computation for one (batched) profile set.

        tsfc: scalar or [...] surface temperature; emis/refl: [W] or
        [..., W] boundary spectra; irt: 1 up / 2 limb / 3 down (static).
        """
        od = self.od_model(state, od_xsec=od_xsec, engine=engine,
                           lor_layers=lor_layers)
        wn_d = jnp.asarray(self.wn, self.dtype)
        od_total = od.od_total
        if self.mesh is not None and jnp.ndim(od_total) == 3:
            # gather the wn axis before the RT solve: RT is O(W x L) —
            # negligible next to the line sum — and computing it on
            # wn-replicated operands keeps the per-profile recurrence
            # bitwise identical to the single-device program (the wn
            # partition otherwise shifts XLA's fusion/vectorization and
            # wobbles the last f32 bits of RAD/TMR)
            from jax.sharding import NamedSharding, PartitionSpec as P
            od_total = jax.lax.with_sharding_constraint(
                od_total, NamedSharding(self.mesh, P("prof", None, None)))
        rt = rtm(od_total, jnp.asarray(state.t, self.dtype)[..., None, :],
                 jnp.asarray(state.tz, self.dtype)[..., None, :],
                 wn_d, tsfc, emis, refl, irt)
        return ForwardResult(rt=rt, od=od, emis=emis, refl=refl)

    def tb(self, state: LayerState, tsfc, emis, refl, irt: int,
           od_xsec=None, engine: str | None = None, lor_layers=None):
        """Brightness temperatures only (jit-friendly thin wrapper)."""
        return self.forward(state, tsfc, emis, refl, irt, od_xsec,
                            engine=engine,
                            lor_layers=lor_layers).rt.tb
