#!/usr/bin/env python
"""Benchmark: line·layer·channel optical-depth evaluations per second per
chip on a representative microwave workload (full forward model: line sum +
continuum + cloud + RT).

Prints ONE JSON line:
  {"metric": "od_evals_per_s_per_chip", "value": N, "unit": "evals/s",
   "vs_baseline": R}

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md) and
this image has no Fortran compiler, so the denominator is a *measured*
single-core C++ port of the reference's LINES walk (tools/baseline/
ref_scalar.cpp, -O3, f64, oracle-tested) on this same workload —
BASELINE_MEASURED.json, produced by tools/baseline/run_baseline.py.  If
that file is absent the round-2 documented estimate (1.0e7 evals/s/core)
is used.  BENCH_NOTES.md records the methodology.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np

FORTRAN_SINGLE_CORE_EVALS_PER_S = 1.0e7  # fallback estimate, see BENCH_NOTES.md


def _baseline_denominator() -> float:
    p = pathlib.Path(__file__).parent / "BASELINE_MEASURED.json"
    try:
        return float(json.loads(p.read_text())["evals_per_s"])
    except Exception:
        return FORTRAN_SINGLE_CORE_EVALS_PER_S


def main():
    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the axon/TPU backend compiles large
    # fusions slowly (minutes); cached executables make repeat runs fast
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(__import__("pathlib").Path(__file__).parent
                              / ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from monortm_tpu.models.monortm import MonoRTM
    from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

    batch = 8
    nlay = 40
    nwn = 1024
    cat = synthetic_catalog_mw(n_h2o=2048, n_o2=1024, tile=512)
    # count valid physical lines (not padding slots): the same accounting
    # the measured C++ baseline uses (tools/baseline/run_baseline.py)
    n_lines = int(np.sum(np.asarray(cat.valid)))

    wn = np.linspace(0.3, 55.0, nwn)
    # the Pallas line-sum kernel is the TPU compute path (use_pallas=None
    # auto-selects it on TPU backends; ops/linesum_pallas.py)
    model = MonoRTM(wn, dvset=float(wn[1] - wn[0]), catalog=cat, nmol=22,
                    dtype=jnp.float32, wn_tile=256, line_tile=512)
    state = synthetic_state(nlay=nlay, batch=batch)
    emis = jnp.full((nwn,), 0.95, jnp.float32)
    refl = 1.0 - emis
    tsfc = jnp.full((batch, 1), 288.0, jnp.float32)

    import jax.tree_util as jtu
    state = jtu.tree_map(lambda x: jnp.asarray(x, jnp.float32), state)

    # production engine dispatch (mirrors pipeline.run): layers in the
    # all-Lorentz regime (zeta > 0.99 for every line) sweep through the
    # lean XLA engine, which beats the Pallas kernel's per-grid-step
    # floor; the rest keep the full kernel
    # (ops/linesum_lorentz.py, BENCH_NOTES.md)
    eng, lor_lay = None, ()
    if model.od_model.use_pallas:
        rows = np.asarray(jax.jit(
            lambda s: model.od_model.all_lorentz(s, per_layer=True)
        )(state)).all(axis=0)
        if rows.all():
            eng = "lorentz-xla"
        elif rows.any():
            eng = "hybrid"
            lor_lay = tuple(np.nonzero(rows)[0].tolist())
    fn = jax.jit(lambda s: model.forward(s, tsfc, emis, refl, irt=3,
                                         engine=eng,
                                         lor_layers=lor_lay).rt.tb)
    fn(state).block_until_ready()          # compile + warm

    # measurement hygiene: DISTINCT inputs per iteration.  The tunneled
    # backend can return a cached result for an identical (executable,
    # inputs) pair (observed at envelope scale: a loop over the same
    # arrays read 0.1 ms for a 4.7 s program).  At this workload the
    # distinct-pipelined rate matches the identical-loop rate (26.5 vs
    # 27.1 ms measured), so the historical numbers stand; distinct
    # inputs keep the measurement valid if the caching behavior changes.
    import dataclasses as _dc
    iters = 5
    states = [_dc.replace(state,
                          t=state.t * (1.0 + jnp.float32(1e-6 * (i + 1))))
              for i in range(iters)]
    t0 = time.perf_counter()
    outs = [fn(s) for s in states]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters

    evals = batch * nlay * nwn * n_lines
    rate = evals / dt
    print(json.dumps({
        "metric": "od_evals_per_s_per_chip",
        "value": rate,
        "unit": "evals/s",
        "vs_baseline": rate / _baseline_denominator(),
    }))


if __name__ == "__main__":
    main()
