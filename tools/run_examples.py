#!/usr/bin/env python
"""Run the seven reference example cases (run/run_monortm_examples:20-123
+ the IATM=1 lidar upwelling input).

The reference distribution's TAPE3 is a broken symlink in this snapshot, so
a synthetic microwave catalog is written in its place (structure-identical
LNFL format; --tape3 overrides with a real file).  Each case runs in its
own output directory under --out with timing, like the reference's
`time ../monortm_...` per case.

Usage: python tools/run_examples.py [--cases 1,4,5] [--out out_examples]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF_IN = Path("/root/reference/run/in")

CASES = {
    1: ("MONORTM.IN_MDL_ATM_dn", None),
    2: ("MONORTM.IN_MDL_ATM_up", None),
    3: ("MONORTM.IN_NOSCALE_IATM1_dn", None),
    4: ("MONORTM.IN_IATM0_dn", "MONORTM_PROF.IN_sav"),
    5: ("MONORTM.IN_IATM0_dn", "MONORTM_PROF.IN_liquid_cloud"),
    6: ("MONORTM.IN_SCALE_IATM1_MODEL0_HMOL1_dn", None),
    7: ("MONORTM.IN_IATM1_lidar_up", None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="1,2,3,4,5,6,7")
    ap.add_argument("--out", default="out_examples", type=Path)
    ap.add_argument("--tape3", default=None)
    ap.add_argument("--precision", default="float32")
    ap.add_argument("--ref-in", default=REF_IN, type=Path)
    args = ap.parse_args()

    if args.precision == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from monortm_tpu.pipeline import run

    dtype = jnp.float64 if args.precision == "float64" else jnp.float32

    args.out.mkdir(parents=True, exist_ok=True)
    if args.tape3:
        tape3 = Path(args.tape3)
    else:
        tape3 = args.out / "TAPE3_synthetic"
        if not tape3.exists():
            from monortm_tpu.io.tape3 import write_tape3
            write_tape3(tape3, _synthetic_raw())
            print(f"wrote synthetic TAPE3 -> {tape3}")

    for c in [int(x) for x in args.cases.split(",")]:
        filein, prof = CASES[c]
        d = args.out / f"case{c}"
        d.mkdir(exist_ok=True)
        shutil.copy(args.ref_in / filein, d / "MONORTM.IN")
        if prof:
            shutil.copy(args.ref_in / prof, d / "MONORTM_PROF.IN")
        shutil.copy(tape3, d / "TAPE3")
        t0 = time.time()
        res = run(filein=d / "MONORTM.IN", fileprof=d / "MONORTM_PROF.IN",
                  hfile=d / "TAPE3", fileout="MONORTM.OUT", outdir=d,
                  dtype=dtype)
        dt = time.time() - t0
        print(f"case{c}: {len(res.tb)} profiles x {len(res.wn)} wn "
              f"in {dt:.2f}s -> {d/'MONORTM.OUT'}")


def _synthetic_raw():
    import numpy as np
    from monortm_tpu.io.tape3 import RawLines
    rng = np.random.default_rng(7)
    rows = []

    def line(vnu, sp, alfa, epp, mol, iso, hwhm, tmpalf, pshift, iflg=0,
             sdep=0.0):
        rows.append([vnu, sp, alfa, epp, mol + 100 * iso, hwhm, tmpalf,
                     pshift, iflg, sdep])

    # H2O 22/183 GHz-like + rotational band lines over 0-60 cm^-1
    line(0.741721, 1.3e-25, 0.0782, 136.16, 1, 1, 0.43, 0.69, 0.0, sdep=0.1)
    line(6.114581, 1.0e-23, 0.095, 136.76, 1, 1, 0.45, 0.65, 0.0, sdep=0.08)
    for v in np.sort(rng.uniform(8.0, 60.0, 120)):
        line(v, 10 ** rng.uniform(-26, -22), rng.uniform(0.06, 0.1),
             rng.uniform(20, 700), 1, int(rng.integers(1, 4)),
             rng.uniform(0.3, 0.5), rng.uniform(0.6, 0.8),
             rng.uniform(-0.02, 0.02), sdep=float(rng.uniform(0, 0.12)))
    # O2 60 GHz complex + 119 GHz with -1 coupling rows
    for v in np.sort(np.concatenate([rng.uniform(1.8, 2.3, 30), [3.9687]])):
        line(v, 10 ** rng.uniform(-25.5, -24.5), rng.uniform(0.04, 0.05),
             rng.uniform(0, 200), 7, 1, rng.uniform(0.04, 0.05),
             rng.uniform(0.7, 0.75), 0.0, iflg=1)
        y = rng.uniform(-0.01, 0.01, 4)
        g = rng.uniform(-1e-4, 0.0, 4)
        mol_bits = int(np.float32(y[2]).view(np.int32))
        rows.append([y[0], g[0], y[1], g[1], mol_bits, g[2], y[3], g[3],
                     -1, 0.0])
    # 1.57 um window for case 7 (MONORTM.IN_IATM1_lidar_up, explicit wn
    # at 6364.92/6365.13): weak H2O + CO2 30012<-00001-band-like lines
    for v in np.sort(rng.uniform(6340.0, 6390.0, 24)):
        line(v, 10 ** rng.uniform(-26, -23.5), rng.uniform(0.06, 0.1),
             rng.uniform(50, 800), 1, int(rng.integers(1, 4)),
             rng.uniform(0.35, 0.5), rng.uniform(0.6, 0.8),
             rng.uniform(-0.02, 0.0), sdep=float(rng.uniform(0, 0.1)))
    for v in np.sort(rng.uniform(6300.0, 6400.0, 30)):
        line(v, 10 ** rng.uniform(-25, -23), rng.uniform(0.06, 0.08),
             rng.uniform(0, 400), 2, 1, rng.uniform(0.07, 0.09),
             rng.uniform(0.6, 0.75), rng.uniform(-0.008, 0.0))
    n = len(rows)
    return RawLines(
        vnu=np.asarray([r[0] for r in rows], np.float64),
        sp=np.asarray([r[1] for r in rows], np.float32),
        alfa=np.asarray([r[2] for r in rows], np.float32),
        epp=np.asarray([r[3] for r in rows], np.float32),
        mol=np.asarray([r[4] for r in rows], np.int32),
        hwhm=np.asarray([r[5] for r in rows], np.float32),
        tmpalf=np.asarray([r[6] for r in rows], np.float32),
        pshift=np.asarray([r[7] for r in rows], np.float32),
        iflg=np.asarray([r[8] for r in rows], np.int32),
        brd_mol_flg=np.zeros((n, 7), np.int32),
        brd_mol_hw=np.zeros((n, 7), np.float32),
        brd_mol_tmp=np.zeros((n, 7), np.float32),
        brd_mol_shft=np.zeros((n, 7), np.float32),
        speed_dep=np.asarray([r[9] for r in rows], np.float32),
    )


if __name__ == "__main__":
    main()
