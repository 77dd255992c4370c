"""Adversarial layering self-consistency oracle (VERDICT r3 item 8).

The reference's own workflow defines this check (README.md:52;
lblatm.f90:1264-1340): an IATM=1 run with IPUNCH=1 writes TAPE7 — the
layering output in MONORTM_PROF.IN form — and re-running with IATM=0 on
that file must reproduce the radiances.  Case 7's refracted slant IR
geometry (H1=120 km, H2=0, ANGLE=180, record 3.2) exercises the
ray-trace/refraction path, the TAPE7 writer's PZFORM/CTYPE quirks and
the profin reader together; the `_sav` oracle only covers
MODEL=6/ANGLE=0/ITYPE=2.

Tolerance: TAPE7 rounds TBAR to 0.01 K and PBAR to 7 significant digits
(formats 974/975, lblatm.f90:1379-1395), so equality is asserted within
the propagation of those roundings, far inside the reference's own
0.1-0.2 K fast-TAPE3 budget (release_notes.txt:139-141).
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

REF_IN = Path("/root/reference/run/in")
GOLD = Path(__file__).parent / "goldens"


def test_lidar_slant_tape7_roundtrip(tmp_path):
    import jax.numpy as jnp
    from monortm_tpu.pipeline import run

    src = (REF_IN / "MONORTM.IN_IATM1_lidar_up").read_text()

    # --- run 1: IATM=1 (case 7 already sets IPUNCH=1 on record 3.1) ---
    d1 = tmp_path / "iatm1"
    d1.mkdir()
    (d1 / "MONORTM.IN").write_text(src)
    r1 = run(filein=d1 / "MONORTM.IN", hfile=GOLD / "TAPE3_synthetic",
             outdir=d1, dtype=jnp.float64)
    t7 = d1 / "TAPE7"
    assert t7.exists(), "IPUNCH=1 run must write TAPE7"

    # --- run 2: IATM=0 with TAPE7 as MONORTM_PROF.IN ------------------
    lines = src.splitlines()
    for i, ln in enumerate(lines):
        if ln.startswith("$"):          # record 1.1; 1.2 is next
            r = lines[i + 1].ljust(60)
            assert r[49] == "1", "expected IATM=1 in record 1.2"
            lines[i + 1] = r[:49] + "0" + r[50:]
            break
    d2 = tmp_path / "iatm0"
    d2.mkdir()
    (d2 / "MONORTM.IN").write_text("\n".join(lines) + "\n")
    shutil.copy(t7, d2 / "MONORTM_PROF.IN")
    r2 = run(filein=d2 / "MONORTM.IN", fileprof=d2 / "MONORTM_PROF.IN",
             hfile=GOLD / "TAPE3_synthetic", outdir=d2,
             dtype=jnp.float64)

    assert len(r1.tb) == len(r2.tb) == 1
    tb1, tb2 = np.asarray(r1.tb[0]), np.asarray(r2.tb[0])
    assert np.isfinite(tb1).all() and np.isfinite(tb2).all()
    # TBAR rounds to 0.01 K in TAPE7; Tb must agree inside that rounding
    np.testing.assert_allclose(tb2, tb1, atol=0.02, rtol=0)
    # transmittances and ODs agree to the PBAR/amount print precision
    np.testing.assert_allclose(np.asarray(r2.results[0].trtot),
                               np.asarray(r1.results[0].trtot),
                               atol=2e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(r2.results[0].otot),
                               np.asarray(r1.results[0].otot),
                               rtol=2e-4, atol=1e-8)
