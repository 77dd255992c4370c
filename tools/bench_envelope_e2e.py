#!/usr/bin/env python
"""End-to-end run at the reference's designed capacity envelope
(VERDICT r3 item 2): NWNMX = 80000 wavenumbers (RTMmono.f90:10) x
200 layers (monortm_sub.F90:369-375) x 250k-line catalog
(lnfl_mod.f90:5), through the REAL pipeline.run path — TAPE5 parse,
TAPE3 load, layered profile ingest, OD (hybrid engine dispatch), RT,
MONORTM.OUT writer — on one chip.

Generates the inputs (uniform 80000-wn grid via record 1.3 DVSET, a
200-layer MONORTM_PROF.IN written by the repo's own TAPE7 writer, a
synthetic dense 250k-line TAPE3), runs the CLI-equivalent pipeline,
and prints wall time, per-stage breakdown, host-transfer bytes and
peak device memory.

Usage: python tools/bench_envelope_e2e.py [--outdir DIR] [--nlay 200]
"""

from __future__ import annotations

import argparse
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

TAPE5 = """\
* reference capacity envelope (IATM=0, uniform 80000-wn grid)
$ Rundeck envelope
    1         1    0    1    0         0    0    0    0    0         0
 0.300E+00  55.49931 0.000E+00 0.690E-03 0.000E+00 0.000E+00 0.000E+00 0.000E+00    0      0.000E+00    0
     0.    1.0       0.000E+00 0.000E+00 0.000E+00 0.000E+00 0.000E+00
%%%%
"""


def make_profile(nlay: int):
    """A 200-layer surface->0.05 hPa profile (Profile for write_tape7)."""
    from monortm_tpu.io.profin import Profile
    from monortm_tpu.types import LayerState, ProfileMeta

    p = np.geomspace(1013.0, 0.05, nlay)
    t = 288.0 - 65.0 * (1.0 - (p / 1013.0) ** 0.22)
    t = np.clip(t, 190.0, 300.0)
    tz = np.concatenate([[t[0] + 1.0], t - 0.5])
    col = p / p.sum()
    wkl = np.zeros((nlay, 39))
    wkl[:, 0] = 4.5e22 * col * np.exp(-np.arange(nlay) / (nlay / 4))
    wkl[:, 1] = 7.5e21 * col
    wkl[:, 2] = 9.0e18 * col
    wkl[:, 6] = 4.5e24 * col
    wbrodl = 1.7e25 * col
    state = LayerState(p=p, t=t, tz=tz, wkl=wkl, wbrodl=wbrodl,
                       clw=np.zeros(nlay))
    alt = np.concatenate([[0.0], np.cumsum(np.full(nlay, 70.0 / nlay))])
    pz = np.concatenate([[1013.25], p - (p - np.roll(p, -1)) / 2])
    pz[-1] = p[-1] * 0.9
    meta = ProfileMeta(nmol=7, angle=0.0, h1=0.0, h2=70.0,
                       altz=alt, pz=pz)
    return Profile(state=state, meta=meta, hmod="ENVELOPE")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/envelope_e2e")
    ap.add_argument("--nlay", type=int, default=200)
    ap.add_argument("--lines", type=int, default=250000)
    ap.add_argument("--engine", default="auto")
    args = ap.parse_args()

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(__file__).parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from monortm_tpu.io.tape3 import write_tape3
    from monortm_tpu.io.tape7 import write_tape7
    from monortm_tpu.pipeline import run
    from monortm_tpu.testing import synthetic_catalog_mw

    d = Path(args.outdir)
    d.mkdir(parents=True, exist_ok=True)
    (d / "MONORTM.IN").write_text(TAPE5)
    t0 = time.perf_counter()
    if not (d / "TAPE3").exists():
        n_h2o = args.lines * 2 // 3
        raw = synthetic_catalog_mw(n_h2o=n_h2o, n_o2=args.lines - n_h2o,
                                   raw_lines=True)
        write_tape3(d / "TAPE3", raw)
    write_tape7(d / "MONORTM_PROF.IN", [make_profile(args.nlay)])
    print(f"inputs ready in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    res = run(filein=d / "MONORTM.IN", fileprof=d / "MONORTM_PROF.IN",
              hfile=d / "TAPE3", outdir=d, engine=args.engine)
    wall = time.perf_counter() - t0

    nwn = len(res.wn)
    evals = args.nlay * nwn * args.lines
    log = (d / "MONORTM.LOG").read_text()
    pull = re.search(r"HOST PULL: (\d+)", log)
    stats = {}
    try:
        stats = jax.devices()[0].memory_stats() or {}
    except Exception:
        pass
    print(f"envelope e2e: 1 profile x {args.nlay} layers x {nwn} wn x "
          f"{args.lines} lines")
    print(f"  wall {wall:.1f}s  ({evals / wall:.3e} od-evals/s incl. "
          f"parse+writer)")
    print(f"  host pull: {int(pull.group(1)) / 1e6:.1f} MB" if pull
          else "  host pull: n/a")
    peak = stats.get("peak_bytes_in_use")
    if peak:
        print(f"  peak device memory: {peak / 1e9:.2f} GB")
    for ln in log.splitlines():
        if "stage" in ln.lower() or re.match(r"\s+\w[\w>-]+:\s+[\d.]+s", ln):
            print("  " + ln.strip())
    tb = np.asarray(res.tb[0])
    print(f"  Tb[0]={tb[0]:.3f}K  Tb[-1]={tb[-1]:.3f}K  "
          f"finite={np.isfinite(tb).all()}")


if __name__ == "__main__":
    main()
