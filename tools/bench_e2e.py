#!/usr/bin/env python
"""End-to-end production throughput: stacked radiosonde profiles through
the full CLI pipeline (parse -> layering -> batched device forward ->
MONORTM.OUT), reported as profiles/s.

The reference runs this workload strictly serially (monortm.f90:357);
here layering is vectorized/native on the host and same-shape profiles
ride one batched [B, nlay] forward per device call.

Usage: python tools/bench_e2e.py [--n 200] [--out /tmp/bench_e2e]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CASE3 = Path("/root/reference/run/in/MONORTM.IN_NOSCALE_IATM1_dn")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--out", type=Path, default=Path("/tmp/bench_e2e"))
    ap.add_argument("--workers", type=int, default=None,
                    help="host layering process fan-out (default: cpus)")
    ap.add_argument("--chunk-size", type=int, default=None,
                    help="force the profile-batch chunk size (exercises "
                         "the pipelined chunk loop: prefetch thread + "
                         "deferred pulls)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    import jax.numpy as jnp
    from monortm_tpu.pipeline import run

    args.out.mkdir(parents=True, exist_ok=True)
    src = CASE3.read_text()
    block = src[src.index("$"):src.index("%")]
    (args.out / "MONORTM.IN").write_text(block * args.n + "%")
    tape3 = ROOT / "tests" / "goldens" / "TAPE3_synthetic"

    import os
    workers = args.workers if args.workers is not None else os.cpu_count()
    if args.chunk_size:
        import monortm_tpu.pipeline as pl
        cap = args.chunk_size
        pl._max_batch = lambda *a, **k: cap
    t0 = time.time()
    res = run(filein=args.out / "MONORTM.IN", hfile=tape3,
              outdir=args.out, dtype=jnp.float32, workers=workers)
    dt = time.time() - t0
    n = len(res.tb)
    print(f"e2e: {n} profiles x {len(res.wn)} wn in {dt:.2f}s "
          f"= {n / dt:.1f} profiles/s "
          f"(backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
