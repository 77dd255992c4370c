"""Synthetic fixtures: line catalogs and layered states for tests, the
compile-check entry points, and benchmarks.

The reference distribution ships no TAPE3 (the example symlink points at
an AER-internal path), so realistic synthetic catalogs stand in for it:
microwave H2O/O2/N2 lines with the same structural features as real LNFL
output (coupling rows, isotopes, speed dependence).
"""

from __future__ import annotations

import numpy as np

from monortm_tpu.io.tape3 import RawLines
from monortm_tpu.lines import PackedCatalog, group, pack, resolve
from monortm_tpu.types import LayerState


def synthetic_catalog_mw(n_h2o: int = 64, n_o2: int = 48, seed: int = 0,
                         tile: int = 128, raw_lines: bool = False
                         ) -> PackedCatalog | RawLines:
    """A microwave-band-like synthetic catalog (0-60 cm^-1).

    raw_lines=True returns the RawLines instead (e.g. for write_tape3)."""
    rng = np.random.default_rng(seed)
    rows = []

    def line(vnu, sp, alfa, epp, mol, iso, hwhm, tmpalf, pshift, iflg=0,
             sdep=0.0):
        rows.append([vnu, sp, alfa, epp, mol + 100 * iso, hwhm, tmpalf,
                     pshift, iflg, sdep])

    # H2O 22.2 GHz-like + rotational lines
    for v in np.sort(rng.uniform(0.5, 60.0, n_h2o)):
        line(v, 10 ** rng.uniform(-28, -24), rng.uniform(0.06, 0.1),
             rng.uniform(20, 600), 1, int(rng.integers(1, 4)),
             rng.uniform(0.3, 0.5), rng.uniform(0.6, 0.8),
             rng.uniform(-0.02, 0.02), sdep=float(rng.uniform(0, 0.12)))
    # O2 60 GHz complex-like lines with -1 coupling rows
    for v in np.sort(rng.uniform(1.5, 10.0, n_o2)):
        line(v, 10 ** rng.uniform(-26, -25), rng.uniform(0.04, 0.05),
             rng.uniform(0, 100), 7, 1, rng.uniform(0.04, 0.05),
             rng.uniform(0.7, 0.75), 0.0, iflg=1)
        y = rng.uniform(-0.02, 0.02, 4)
        g = rng.uniform(-2e-4, 0.0, 4)
        mol_bits = int(np.float32(y[2]).view(np.int32))
        rows.append([y[0], g[0], y[1], g[1], mol_bits, g[2], y[3], g[3],
                     -1, 0.0])
    # N2 lines
    for v in (4.0, 9.7):
        line(v, 1e-30, 0.05, 30.0, 22, 1, 0.048, 0.7, 0.0)

    n = len(rows)
    raw = RawLines(
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
    if raw_lines:
        return raw
    return pack(resolve(group(raw)), tile=tile)


# minimal IATM=0 run inputs for pipeline-level tests and the multi-chip
# dryrun: 4 explicit wavenumbers (V1<0 list option), NMOL=7, downwelling
_MIN_TAPE5 = """\
* synthetic minimal case (IATM=0, explicit wn list)
$ Rundeck test
    1         1    0    1    0         0    0    0    0    0         0
-0.200E+00 8.800E+00 0.000E+00 0.100E-00 0.000E+00 0.000E+00 0.000E+00 0.000E+00    0      0.000E+00    0
4
0.789344
0.79828
1.043027
1.051763
     0.    1.0       0.000E+00 0.000E+00 0.000E+00 0.000E+00 0.000E+00
%%%%
"""

_MIN_PROF_REC = """\
 1  2    7  1.000000TEST    ATM          0.00        20.00         0.000      0
{p0:15.7E}{t0:10.2f}              3   0.000 1013.00 288.20  0.700  931.64 283.65  0.030
{w0:15.7E}  5.6517653E+20  4.7120675E+16  5.4804989E+17  2.5390745E+17  2.9115142E+18  3.5794498E+23  1.3375841E+24
  8.9382500E+02    281.40              3                         1.400 855.746 279.10  0.000
  9.5935612E+21  5.2824106E+20  4.7150147E+16  5.1223340E+17  2.3170005E+17  2.7212402E+18  3.3455267E+23  1.2501701E+24
"""


def make_minimal_rundir(dirpath, nprof: int = 1) -> None:
    """Write MONORTM.IN + MONORTM_PROF.IN + synthetic TAPE3 into dirpath
    (a case-4-style IATM=0 run with `nprof` slightly-perturbed profiles)."""
    from pathlib import Path
    from monortm_tpu.io.tape3 import write_tape3

    d = Path(dirpath)
    (d / "MONORTM.IN").write_text(_MIN_TAPE5)
    recs = [_MIN_PROF_REC.format(p0=972.2109 * (1 + 0.002 * i),
                                 t0=285.94 + 0.5 * i,
                                 w0=1.2207059e22 * (1 + 0.01 * i))
            for i in range(nprof)]
    (d / "MONORTM_PROF.IN").write_text("".join(recs))
    raw = synthetic_catalog_mw(raw_lines=True)
    write_tape3(d / "TAPE3", raw)


def synthetic_state(nlay: int = 26, batch: int | None = None,
                    seed: int = 0) -> LayerState:
    """A US-standard-like layered state (surface -> top)."""
    rng = np.random.default_rng(seed)
    p = np.geomspace(1000.0, 50.0, nlay)
    t = 288.0 - 60.0 * (1.0 - p / 1000.0)
    tz = np.concatenate([[t[0] + 2.0], t - 1.0])
    wkl = np.zeros((nlay, 39))
    col = p / p.sum()
    wkl[:, 0] = 4.5e22 * col * np.exp(-np.arange(nlay) / 6.0) * 6
    wkl[:, 1] = 7.5e21 * col
    wkl[:, 2] = 9.0e18 * col
    wkl[:, 6] = 4.5e24 * col
    wkl[:, 21] = 1.7e25 * col
    wbrodl = 2.0e22 * col
    clw = np.zeros(nlay)
    clw[2] = 0.03

    def b(x):
        if batch is None:
            return x
        out = np.broadcast_to(x, (batch,) + x.shape).copy()
        out *= (1.0 + 0.01 * rng.standard_normal((batch,) + (1,) * x.ndim))
        return out

    return LayerState(p=b(p), t=b(t), tz=b(tz), wkl=b(wkl), wbrodl=b(wbrodl),
                      clw=b(clw))
