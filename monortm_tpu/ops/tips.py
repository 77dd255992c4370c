"""TIPS-2003 total internal partition sums — vectorized Lagrange recall.

The reference dispatches to 38 per-molecule subroutines, each doing a 3/4
point Lagrange interpolation over a 119-temperature table via AtoB
(tips_2003.f90:2-292, 4610-4702).  Here all (molecule, isotopologue) tables
are stacked into one dense [39, 9, 119] array and interpolated at once —
one gather + fused polynomial per layer temperature, batched over layers.

Special cases kept faithful to the reference:
  * mol 34 (atomic O): Q = 1, ratio = 1          (tips_2003.f90:233-238)
  * mol 39 (CH3OH): classical rotational T-dependence with the reference's
    literal 'qt_296 = 296.' numerator              (tips_2003.f90:258-266)
  * untabulated (mol, iso) slots: ratio = 1
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from monortm_tpu.data import loader


def _lagrange_q(t, tdat, q):
    """Interpolate Q(t) for every (mol, iso) table.

    t: scalar or [...]; tdat: [119]; q: [39, 9, 119]
    returns [..., 39, 9]
    """
    t = jnp.asarray(t)
    npt = tdat.shape[0]
    # first index k (0-based) with tdat[k] >= t   (AtoB's 'I', 1-based I=k+1)
    h = tdat[1] - tdat[0]              # uniform 25 K grid
    k = jnp.ceil((t - tdat[0]) / h).astype(jnp.int32)
    k = jnp.clip(k, 1, npt - 1)

    use3 = (k < 2) | (k == npt - 1)    # AtoB: I<3 or I==npt -> 3-point
    j3 = jnp.where(k < 2, 2, npt - 1)  # 3-point pivot (J=3 or J=npt, 0-based)

    def wgt3(j):
        a0_, a1_, a2_ = tdat[j - 2], tdat[j - 1], tdat[j]
        w0 = (t - a1_) * (t - a2_) / ((a0_ - a1_) * (a0_ - a2_))
        w1 = (t - a0_) * (t - a2_) / ((a1_ - a0_) * (a1_ - a2_))
        w2 = (t - a0_) * (t - a1_) / ((a2_ - a0_) * (a2_ - a1_))
        return w0, w1, w2

    def wgt4(j):
        a0_, a1_, a2_, a3_ = tdat[j - 2], tdat[j - 1], tdat[j], tdat[j + 1]
        w0 = (t - a1_) * (t - a2_) * (t - a3_) / ((a0_ - a1_) * (a0_ - a2_) * (a0_ - a3_))
        w1 = (t - a0_) * (t - a2_) * (t - a3_) / ((a1_ - a0_) * (a1_ - a2_) * (a1_ - a3_))
        w2 = (t - a0_) * (t - a1_) * (t - a3_) / ((a2_ - a0_) * (a2_ - a1_) * (a2_ - a3_))
        w3 = (t - a0_) * (t - a1_) * (t - a2_) / ((a3_ - a0_) * (a3_ - a1_) * (a3_ - a2_))
        return w0, w1, w2, w3

    w3_0, w3_1, w3_2 = wgt3(j3)
    w4_0, w4_1, w4_2, w4_3 = wgt4(k)

    base = jnp.where(use3, j3, k)
    w0 = jnp.where(use3, w3_0, w4_0)
    w1 = jnp.where(use3, w3_1, w4_1)
    w2 = jnp.where(use3, w3_2, w4_2)
    w3 = jnp.where(use3, 0.0, w4_3)

    # gather q at base-2 .. base+1 along the temperature axis, moving any
    # batch axes of t in front of the (mol, iso) axes
    def gq(idx):
        g = q[..., idx]                       # [39, 9] or [39, 9, ...batch]
        if idx.ndim:
            g = jnp.moveaxis(g, tuple(range(-idx.ndim, 0)),
                             tuple(range(idx.ndim)))
        return g

    qt = (w0[..., None, None] * gq(base - 2)
          + w1[..., None, None] * gq(base - 1)
          + w2[..., None, None] * gq(base)
          + w3[..., None, None] * gq(jnp.minimum(base + 1, npt - 1)))
    return qt


def tips_scor(t, dtype=jnp.float32):
    """Intensity temperature correction scor[mol, iso] = Q(296)/Q(T).

    t: [...] layer temperatures (K).  Returns [..., 39, 9].
    ref: tips_2003.f90:60-292 (scor), modm.f90:250,387.
    """
    tabs = loader.tips_tables()
    tdat = jnp.asarray(tabs["tdat"])
    q = jnp.asarray(tabs["q"])
    t = jnp.asarray(t)

    q296 = _lagrange_q(jnp.asarray(296.0, tdat.dtype), tdat, q)
    qt = _lagrange_q(t, tdat, q)
    present = tabs["q"][..., 0] > 0.0        # static [39, 9] mask
    ratio = jnp.where(jnp.asarray(present), q296 / jnp.where(qt > 0, qt, 1.0), 1.0)

    # CH3OH (mol 39): the reference uses qt_296 = 296. literally
    ch3oh = 296.0 / (t[..., None] / 296.0) ** 1.5
    ratio = ratio.at[..., 38, :].set(ch3oh)
    return ratio.astype(dtype)


def tips_scor_numpy(t: float) -> np.ndarray:
    """Host/NumPy single-temperature reference (used by tests and host code)."""
    tabs = loader.tips_tables()
    tdat, q = tabs["tdat"], tabs["q"]

    def interp(tt):
        npt = tdat.size
        k = int(np.ceil((tt - tdat[0]) / (tdat[1] - tdat[0])))
        k = min(max(k, 1), npt - 1)
        if k < 2 or k == npt - 1:
            j = 2 if k < 2 else npt - 1
            xs = tdat[j - 2:j + 1]
            ws = [np.prod([(tt - x) for m, x in enumerate(xs) if m != i]) /
                  np.prod([(xs[i] - x) for m, x in enumerate(xs) if m != i])
                  for i in range(3)]
            return sum(w * q[..., j - 2 + i] for i, w in enumerate(ws))
        xs = tdat[k - 2:k + 2]
        ws = [np.prod([(tt - x) for m, x in enumerate(xs) if m != i]) /
              np.prod([(xs[i] - x) for m, x in enumerate(xs) if m != i])
              for i in range(4)]
        return sum(w * q[..., k - 2 + i] for i, w in enumerate(ws))

    q296 = interp(296.0)
    qt = interp(float(t))
    present = q[..., 0] > 0
    ratio = np.where(present, q296 / np.where(qt > 0, qt, 1.0), 1.0)
    ratio[38, :] = 296.0 / (float(t) / 296.0) ** 1.5
    return ratio
