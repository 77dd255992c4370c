#!/usr/bin/env python
"""Radiosonde -> MONORTM.IN (TAPE5) generator.

Python equivalent of the reference's IDL tool
(idl/create_monortm_input_from_sonde.pro:19-132): builds a MODEL=0 user
profile where pressure/temperature/altitude/RH come from a sonde, CO2 is
fixed at 380 ppmv and all other molecules default to a chosen model
atmosphere (JCHAR digits).  Above 15 km, levels are averaged in groups of
five and duplicate-pressure levels removed, as the IDL does.

Input formats: ARM netCDF is not readable without a netCDF library in this
image, so a CSV/whitespace table with columns alt_m, pres_hPa, tdry_C, rh%
is accepted (--columns to reorder).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def condense(alt_km, pres, tdry_k, rh):
    """5-point averaging above 15 km + duplicate-pressure removal
    (create_monortm_input_from_sonde.pro:62-105)."""
    n = len(alt_km)
    w_top = np.nonzero(alt_km >= 15.0)[0]
    if len(w_top):
        i_top = int(w_top[0])
        i_ct = 0
        a, p, r, t = (alt_km.copy(), pres.copy(), rh.copy(), tdry_k.copy())
        for q in range(i_top, n - 5, 5):
            k = i_top + i_ct
            a[k] = a[q:q + 5].mean()
            p[k] = p[q:q + 5].mean()
            r[k] = r[q:q + 5].mean()
            t[k] = t[q:q + 5].mean()
            i_ct += 1
        last = i_top + i_ct - 1 if i_ct else n - 1
        alt_km, pres, rh, tdry_k = (a[:last + 1], p[:last + 1],
                                    r[:last + 1], t[:last + 1])
    good = np.nonzero(pres[:-1] - pres[1:] >= 1e-5)[0]
    return alt_km[good], pres[good], tdry_k[good], rh[good]


def write_tape5(out, alt_km, pres, tdry_k, rh, iatm=6, v1=-0.1, v2=2.0,
                freqs=(0.789344, 0.79828, 1.043027, 1.051763),
                tbound=0.0, angle_rec=("     0.000", "    30.000",
                                       "     0.000")):
    nlev = len(alt_km)
    jcharm = f"HA{iatm}{iatm}{iatm}{iatm}{iatm}"
    lines = []
    lines.append("$ sonde-derived rundeck (tools/sonde_to_tape5.py)")
    lines.append("    1         1    0    1    1         0    0    0"
                 "    0    0         0")
    lines.append(f"{v1:10.3E}{v2:10.3E}" + f"{0.0:10.3E}" * 6
                 + "    0      0.000E+00    0")
    lines.append(f"{len(freqs)}")
    for f in freqs:
        lines.append(f"{f:.6f}")
    lines.append(f"{tbound:10.3f}{1.0:10.3f}" + f"{0.0:10.3E}" * 5)
    # record 3.1: MODEL=0, ITYPE=2, IBMAX=0 (autolayer), NMOL=7
    lines.append("    0    2    0    1    0    7    0")
    lines.append("".join(angle_rec))
    lines.append("     0.000     0.000     0.000     0.000     0.000")
    lines.append(f"{nlev:5d} sonde profile          ")
    for i in range(nlev):
        lines.append(f"{alt_km[i]:10.3f}{pres[i]:10.4f}{tdry_k[i]:10.3f}"
                     + " " * 5 + "AA " + "  " + jcharm)
        lines.append(f"{rh[i]:10.3E}{380.0:10.3E}" + f"{0.0:10.3E}" * 5)
    lines.append("%%%%")
    Path(out).write_text("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sonde", help="table with alt_m pres_hPa tdry_C rh columns")
    ap.add_argument("--out", default="TAPE5")
    ap.add_argument("--iatm", type=int, default=6)
    args = ap.parse_args()
    d = np.loadtxt(args.sonde)
    alt_km = d[:, 0] / 1000.0
    pres = d[:, 1]
    tdry_k = d[:, 2] + 273.16
    rh = d[:, 3]
    alt_km, pres, tdry_k, rh = condense(alt_km, pres, tdry_k, rh)
    write_tape5(args.out, alt_km, pres, tdry_k, rh, iatm=args.iatm)
    print(f"wrote {args.out}: {len(alt_km)} levels")


if __name__ == "__main__":
    main()
