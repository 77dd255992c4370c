#!/usr/bin/env python
"""Freeze f64-CPU golden MONORTM.OUT files for the six example cases.

The reference distribution ships no usable TAPE3 (broken symlink) and the
image has no Fortran compiler, so true reference outputs are impossible;
instead the e2e numeric behaviour is pinned by committed goldens produced
by the double-precision CPU path (tests/test_goldens.py fails on any
drift).  The synthetic TAPE3's bytes are committed alongside so the
goldens do not depend on generator code staying fixed.

Usage: python tools/make_goldens.py       (must run on CPU: forces it)
"""

from __future__ import annotations

import os
import shutil
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

GOLD = ROOT / "tests" / "goldens"


def main():
    import jax.numpy as jnp
    from monortm_tpu.io.tape3 import write_tape3
    from monortm_tpu.pipeline import run
    sys.path.insert(0, str(ROOT / "tools"))
    from run_examples import CASES, REF_IN, _synthetic_raw

    GOLD.mkdir(exist_ok=True)
    tape3 = GOLD / "TAPE3_synthetic"
    if not tape3.exists():
        write_tape3(tape3, _synthetic_raw())
        print(f"wrote {tape3}")

    import tempfile
    for c, (filein, prof) in CASES.items():
        with tempfile.TemporaryDirectory() as td:
            d = Path(td)
            shutil.copy(REF_IN / filein, d / "MONORTM.IN")
            if prof:
                shutil.copy(REF_IN / prof, d / "MONORTM_PROF.IN")
            run(filein=d / "MONORTM.IN", fileprof=d / "MONORTM_PROF.IN",
                hfile=tape3, fileout="MONORTM.OUT", outdir=d,
                dtype=jnp.float64)
            shutil.copy(d / "MONORTM.OUT", GOLD / f"case{c}.MONORTM.OUT")
            print(f"case{c} -> {GOLD / f'case{c}.MONORTM.OUT'}")


if __name__ == "__main__":
    main()
