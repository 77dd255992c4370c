"""XINT 4-point regridding as static gather plans.

The reference's XINT (lblrtm_sub.f90:1-34) interpolates a uniformly gridded
array onto another uniform grid with cubic-like 4-point weights and fixed
ONEPL/ONEMI rounding.  Grid geometry is static for a given run, so here the
index arithmetic runs once on the host (f64 NumPy, reproducing the Fortran
truncation exactly) and the device op is a fixed gather + weighted sum —
XLA fuses it with the surrounding arithmetic.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

ONEPL = 1.001
ONEMI = 0.999


@dataclass(frozen=True)
class XintPlan:
    """Static interpolation plan: out[ti] += sum_k w[k] * src[j + k - 1].

    Indices are 0-based into the *padded* source array (2 zeros on each
    side), so gathers can never go out of bounds (matching the reference's
    zero-initialised work arrays).
    """
    target_idx: np.ndarray   # [n] 0-based indices into the target grid
    src_idx: np.ndarray      # [n] 0-based index of A(J) in padded source
    weights: np.ndarray      # [n, 4] weights for A(J-1), A(J), A(J+1), A(J+2)
    n_src: int               # unpadded source length
    n_target: int

    def apply(self, src, out=None):
        """src: [..., n_src] -> contributions accumulated on [..., n_target]."""
        src = jnp.asarray(src)
        pad = [(0, 0)] * (src.ndim - 1) + [(2, 2)]
        p = jnp.pad(src, pad)
        j = jnp.asarray(self.src_idx)
        w = jnp.asarray(self.weights, dtype=src.dtype)
        conti = (p[..., j - 1] * w[:, 0] + p[..., j] * w[:, 1]
                 + p[..., j + 1] * w[:, 2] + p[..., j + 2] * w[:, 3])
        if out is None:
            out = jnp.zeros(src.shape[:-1] + (self.n_target,), src.dtype)
        return out.at[..., jnp.asarray(self.target_idx)].add(conti)

    def gather(self, src):
        """Dense variant: returns only the interpolated values [..., n]."""
        src = jnp.asarray(src)
        pad = [(0, 0)] * (src.ndim - 1) + [(2, 2)]
        p = jnp.pad(src, pad)
        j = jnp.asarray(self.src_idx)
        w = jnp.asarray(self.weights, dtype=src.dtype)
        return (p[..., j - 1] * w[:, 0] + p[..., j] * w[:, 1]
                + p[..., j + 1] * w[:, 2] + p[..., j + 2] * w[:, 3])


def _trunc(x: np.ndarray | float) -> np.ndarray:
    return np.trunc(np.asarray(x)).astype(np.int64)


def build_xint_plan(v1a: float, dva: float, n_src: int,
                    vft: float, dvr3: float, n1r3: int, n2r3: int,
                    n_target: int) -> XintPlan:
    """Plan XINT(V1A,V2A,DVA, A, ., VFT, DVR3, R3, N1R3, N2R3).

    n1r3/n2r3 are the reference's 1-based bounds; the plan stores 0-based.
    """
    v2a = v1a + dva * (n_src - 1)
    ilo = int(_trunc((v1a + dva - vft) / dvr3 + 1.0 + ONEMI))
    ilo = max(ilo, n1r3)
    ihi = int(_trunc((v2a - dva - vft) / dvr3 + ONEMI))
    ihi = min(ihi, n2r3)

    if ihi < ilo:
        empty = np.zeros((0,), np.int64)
        return XintPlan(empty, empty, np.zeros((0, 4)), n_src, n_target)

    i = np.arange(ilo, ihi + 1, dtype=np.int64)          # 1-based target index
    vi = vft + dvr3 * (i - 1).astype(np.float64)
    j = _trunc((vi - v1a) / dva + ONEPL)                 # 1-based source index
    vj = v1a + dva * (j - 1).astype(np.float64)
    p = (vi - vj) / dva
    cc = (3.0 - 2.0 * p) * p * p
    b = 0.5 * p * (1.0 - p)
    b1 = b * (1.0 - p)
    b2 = b * p
    w = np.stack([-b1, 1.0 - cc + b2, cc + b1, -b2], axis=-1)
    # 0-based target; 0-based padded-source index of A(J) is (j-1) + 2
    return XintPlan(i - 1, j + 1, w, n_src, n_target)


def build_xint_plan_points(v1a: float, dva: float, n_src: int,
                           vi: np.ndarray) -> XintPlan:
    """Per-point XINT as used for explicit wavenumber lists (modm.f90:221-226).

    Each target wavenumber is interpolated independently:
    XINT(..., VFT=wn, DVR3=1.0, R3=oc(iw), N1R3=1, N2R3=1); the ILO/IHI
    bounds then reduce to an in-range test per point.
    """
    vi = np.asarray(vi, dtype=np.float64)
    v2a = v1a + dva * (n_src - 1)
    keep = []
    for k, v in enumerate(vi):
        ilo = int(_trunc((v1a + dva - v) / 1.0 + 1.0 + ONEMI))
        ihi = int(_trunc((v2a - dva - v) / 1.0 + ONEMI))
        if ilo <= 1 and ihi >= 1:
            keep.append(k)
    keep = np.asarray(keep, dtype=np.int64)
    v = vi[keep]
    j = _trunc((v - v1a) / dva + ONEPL)
    vj = v1a + dva * (j - 1).astype(np.float64)
    p = (v - vj) / dva
    cc = (3.0 - 2.0 * p) * p * p
    b = 0.5 * p * (1.0 - p)
    b1 = b * (1.0 - p)
    b2 = b * p
    w = np.stack([-b1, 1.0 - cc + b2, cc + b1, -b2], axis=-1)
    return XintPlan(keep, j + 1, w, n_src, len(vi))
