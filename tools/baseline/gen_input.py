#!/usr/bin/env python
"""Dump a LINES workload for tools/baseline/ref_scalar.cpp.

Writes the grouped per-molecule line arrays (the same J/JJ-walk layout
the Fortran LINES consumes, lnfl_mod.f90:5-13) plus the layer state,
wavenumber grid, TIPS ratios and isotope masses as one flat binary file.

Usage:
  python tools/baseline/gen_input.py out.bin [--bench|--tiny]

--bench: the bench.py workload (synthetic MW catalog 2048 H2O + 1024 O2
  lines, 1024 wn, but only 2 of the 40 layers — the scalar walk's cost
  per layer is uniform, so the measured evals/s extrapolates exactly).
--tiny: small case for the correctness test (dump-out comparable against
  tests/reference_lines.lines_ref).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from monortm_tpu import constants as cst
from monortm_tpu.data import loader
from monortm_tpu.lines import group
from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state


def dump(path: str, g, wn, p, t, wk, wbrod, scor):
    nlay = len(p)
    nwn = len(wn)
    lmax = int(max(1, g.nblm.max()))

    def field(d):
        out = np.zeros((39, lmax), np.float64)
        for mo, v in d.items():
            out[mo - 1, :len(v)] = np.asarray(v, np.float64)[:lmax]
        return out

    smass = loader.isotopes()["smass"].astype(np.float64).reshape(39, 9)
    with open(path, "wb") as f:
        np.asarray([cst.RADCT, cst.BOLTZ, cst.AVOGAD, cst.CLIGHT, cst.T0],
                   np.float64).tofile(f)
        np.asarray([nwn, nlay, lmax], np.int64).tofile(f)
        np.asarray(g.nblm, np.int64).tofile(f)
        for name in ("xnu0", "s0", "alpf", "alps", "e", "x", "deltnu",
                     "xg", "iso", "rmol", "sdep"):
            field(getattr(g, name)).tofile(f)
        np.asarray(wn, np.float64).tofile(f)
        np.asarray(p, np.float64).tofile(f)
        np.asarray(t, np.float64).tofile(f)
        np.asarray(wk, np.float64).reshape(nlay, 39).tofile(f)
        np.asarray(wbrod, np.float64).tofile(f)
        np.asarray(scor, np.float64).reshape(nlay, 39 * 9).tofile(f)
        smass.tofile(f)


def workload(mode: str):
    from monortm_tpu.ops.tips import tips_scor
    if mode == "--tiny":
        raw = synthetic_catalog_mw(n_h2o=24, n_o2=12, raw_lines=True)
        wn = np.linspace(0.3, 25.0, 16)
        nlay = 2
    else:
        # bench.py's catalog/grid (bench.py:48-52)
        raw = synthetic_catalog_mw(n_h2o=2048, n_o2=1024, raw_lines=True)
        wn = np.linspace(0.3, 55.0, 1024)
        nlay = 2          # extrapolates: per-layer cost is uniform
    g = group(raw)
    st = synthetic_state(nlay=40)
    p = np.asarray(st.p)[:nlay]
    t = np.asarray(st.t)[:nlay]
    wk = np.asarray(st.wkl)[:nlay]
    wbrod = np.asarray(st.wbrodl)[:nlay]
    scor = np.asarray(tips_scor(t, dtype=np.float64)).reshape(nlay, 39 * 9)
    return g, wn, p, t, wk, wbrod, scor


if __name__ == "__main__":
    out = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "--bench"
    dump(out, *workload(mode))
    print(f"wrote {out} ({mode})")
