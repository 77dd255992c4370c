#!/usr/bin/env python
"""Gradient-step timing at the bench workload (VERDICT r4 missing #2).

Times value_and_grad of a Tb misfit w.r.t. the layer temperatures
through the production engines on one chip:

  * hybrid  — per-layer dispatch: lean all-Lorentz XLA sweep on the
    zeta-clean layers + the Pallas kernel (custom_vjp adjoint
    block-sparse sweep) on the SD-Voigt-active layers — the shipping
    configuration, now differentiable in ALL regimes
  * pallas  — the full kernel + its custom VJP on every layer
  * lorentz-xla — the lean engine (exact only where zeta > 0.99)

Workload mirrors bench.py: 8 profiles x 40 layers x 1024 wn x the
synthetic ~3074-valid-line MW catalog.  Prints one line per engine:
ms/iter for forward and for value_and_grad.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import dataclasses as dc
    from monortm_tpu.models.monortm import MonoRTM
    from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

    batch, nlay, nwn = 8, 40, 1024
    cat = synthetic_catalog_mw(n_h2o=2048, n_o2=1024, tile=512)
    n_lines = int(np.sum(np.asarray(cat.valid)))
    wn = np.linspace(0.3, 55.0, nwn)
    model = MonoRTM(wn, dvset=float(wn[1] - wn[0]), catalog=cat, nmol=22,
                    dtype=jnp.float32, wn_tile=256, line_tile=512)
    state = synthetic_state(nlay=nlay, batch=batch)
    state = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), state)
    emis = jnp.full((nwn,), 0.95, jnp.float32)
    refl = 1.0 - emis
    tsfc = jnp.full((batch, 1), 288.0, jnp.float32)

    rows = np.asarray(jax.jit(
        lambda s: model.od_model.all_lorentz(s, per_layer=True))(state)
    ).all(axis=0)
    lor = tuple(np.nonzero(rows)[0].tolist())
    print(f"# {rows.sum()}/{nlay} layers all-Lorentz; "
          f"{nlay - rows.sum()} SD-Voigt-active")
    evals = batch * nlay * nwn * n_lines

    def run_engine(name, eng, lor_lay):
        def tb_fn(s):
            return model.tb(s, tsfc, emis, refl, irt=3, engine=eng,
                            lor_layers=lor_lay)

        tb_obs = tb_fn(state)
        tb_obs.block_until_ready()

        def loss(t):
            return jnp.sum((tb_fn(dc.replace(state, t=t)) - tb_obs) ** 2)

        fwd = jax.jit(loss)
        vg = jax.jit(jax.value_and_grad(loss))

        def timeit(f, t):
            # distinct inputs per iteration (the tunneled backend can
            # return cached results for identical calls; BENCH_NOTES
            # "measurement hygiene")
            jax.block_until_ready(f(t))
            n = 5
            ts = [t * (1.0 + jnp.float32(1e-6 * (i + 1)))
                  for i in range(n)]
            t0 = time.perf_counter()
            outs = [f(x) for x in ts]
            jax.block_until_ready(outs)
            return (time.perf_counter() - t0) / n

        t_f = timeit(fwd, state.t)
        t_g = timeit(vg, state.t)
        g = vg(state.t)[1]
        assert bool(jnp.isfinite(g).all()), name
        print(f"{name:12s} forward {t_f * 1e3:8.1f} ms/iter   "
              f"value_and_grad {t_g * 1e3:8.1f} ms/iter   "
              f"({evals / t_g:.3e} od-evals/s through the adjoint)")

    run_engine("hybrid", "hybrid", lor)
    run_engine("pallas", "pallas", ())
    run_engine("lorentz-xla", "lorentz-xla", ())


if __name__ == "__main__":
    main()
