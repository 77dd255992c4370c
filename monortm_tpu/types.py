"""Core data types: layered atmospheric state and run configuration.

`LayerState` is the device-facing product of either the MONORTM_PROF.IN
reader (IATM=0; TAPE7 dialect) or the internal layering engine (IATM=1,
LBLATM equivalent).  It is a pytree and may carry an arbitrary leading
profile batch axis — the whole forward model is batched/shardable over it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

MXMOL = 39


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LayerState:
    """Layered path state (ref COMMON /PATHD/, monortm.f90:229-230).

    Shapes written for a single profile; a leading batch axis is allowed.
    """
    p: Any          # [nlay]      layer-average pressure (hPa)
    t: Any          # [nlay]      layer-average temperature (K)
    tz: Any         # [nlay+1]    level temperatures, [0]=surface side
    wkl: Any        # [nlay, 39]  molecular column densities (molec/cm^2)
    wbrodl: Any     # [nlay]      broadening-gas column
    clw: Any        # [nlay]      cloud liquid water (mm)

    @property
    def nlay(self):
        return self.t.shape[-1]


@dataclasses.dataclass(frozen=True)
class ProfileMeta:
    """Per-profile host-side metadata (not traced)."""
    nmol: int
    angle: float      # viewing angle (deg); sets IRT (monortm.f90:383-385)
    h1: float = 0.0
    h2: float = 0.0
    altz: np.ndarray | None = None   # [nlay+1] level altitudes (km)
    pz: np.ndarray | None = None     # [nlay+1] level pressures (hPa)

    @property
    def irt(self) -> int:
        if self.angle > 90.0:
            return 1   # space-based, looking down
        if self.angle < 90.0:
            return 3   # ground-based, looking up
        return 2       # limb


def irt_from_angle(angle: float) -> int:
    if angle > 90.0:
        return 1
    if angle < 90.0:
        return 3
    return 2
