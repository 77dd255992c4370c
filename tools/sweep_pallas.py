#!/usr/bin/env python
"""Sweep Pallas line-kernel tile parameters on the bench workload.

Usage: python tools/sweep_pallas.py "wt,nt,lt[,gate]" ["wt,nt,lt" ...]
Prints steady-state ms/iter per config (bench.py's workload/metric).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path(__file__).parent.parent / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    from monortm_tpu.models.monortm import MonoRTM
    from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

    batch, nlay, nwn = 8, 40, 1024
    cat = synthetic_catalog_mw(n_h2o=2048, n_o2=1024, tile=512)
    n_lines = int(np.sum(np.asarray(cat.valid)))
    wn = np.linspace(0.3, 55.0, nwn)
    state = synthetic_state(nlay=nlay, batch=batch)
    state = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                   state)
    emis = jnp.full((nwn,), 0.95, jnp.float32)
    refl = 1.0 - emis
    tsfc = jnp.full((batch, 1), 288.0, jnp.float32)

    for spec in sys.argv[1:]:
        parts = spec.split(",")
        wt, nt, lt = (int(x) for x in parts[:3])
        gate = len(parts) < 4 or parts[3] != "nogate"
        model = MonoRTM(wn, dvset=float(wn[1] - wn[0]), catalog=cat,
                        nmol=22, dtype=jnp.float32,
                        pallas_wn_tile=wt, pallas_line_tile=nt,
                        pallas_layer_tile=lt, use_pallas=True)
        if not gate:
            # reach into the od model: gate is a line_od_pallas kwarg
            import functools
            from monortm_tpu.ops import linesum_pallas as lp
            orig = lp.line_od_pallas
            lp.line_od_pallas = functools.partial(orig, gate=False)
        try:
            fn = jax.jit(lambda s: model.tb(s, tsfc, emis, refl, irt=3))
            t0 = time.perf_counter()
            fn(state).block_until_ready()
            compile_s = time.perf_counter() - t0
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(state)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            rate = batch * nlay * nwn * n_lines / dt
            print(f"wt={wt} nt={nt} lt={lt} gate={gate}: "
                  f"{dt * 1e3:8.2f} ms/iter  {rate:.3e} evals/s  "
                  f"(compile {compile_s:.0f}s)", flush=True)
        finally:
            if not gate:
                lp.line_od_pallas = orig


if __name__ == "__main__":
    main()
