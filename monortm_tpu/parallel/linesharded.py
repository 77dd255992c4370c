"""Line-axis sharding: partial line sums combined with a single psum.

For catalogs too large for one chip's HBM (the reference supports 250k
lines/molecule, lnfl_mod.f90:5, times 39 molecules), the mesh gains a
"line" axis: every device holds a shard of the line catalog, evaluates
the full [layer, wn] block against its shard only, and the per-molecule
OD partials — already a *sum* over lines — combine with one `psum`.
No other collective appears: wavenumbers/layers stay replicated (or
sharded on the other mesh axes as usual).

This composes with the (prof, wn) data parallelism of
`parallel.sharding`: the line axis multiplies the mesh, e.g.
("prof", "wn", "line").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from monortm_tpu.lines import PackedCatalog
from monortm_tpu.ops.lineshape import (LineConfig, catalog_to_host,
                                       line_od_block)


def split_catalog_stack(catalog: PackedCatalog, n_shards: int,
                        dtype=jnp.float32) -> dict:
    """Round-robin split of the catalog's valid lines into n_shards
    equal-shape shards, stacked on a leading axis: {col: [S, Npad, ...]}.

    Padding rows replicate row 0 with valid=False, so every shard's
    masked line sum is exact and all shards share one trace.
    """
    host = catalog_to_host(catalog, dtype)
    valid_idx = np.nonzero(np.asarray(catalog.valid))[0]
    shards = [valid_idx[s::n_shards] for s in range(n_shards)]
    npad = max(1, max(len(s) for s in shards))

    out = {}
    rows = np.zeros((n_shards, npad), np.int64)
    mask = np.zeros((n_shards, npad), bool)
    for s, idx in enumerate(shards):
        rows[s, :len(idx)] = idx
        mask[s, :len(idx)] = True
    for k, v in host.items():
        out[k] = jnp.asarray(v[rows])
    out["valid"] = jnp.asarray(mask)
    return out


def line_od_linesharded(cat_stack: dict, wn, wn_split, state, scor_flat,
                        cfg: LineConfig, n_mol: int, mesh: Mesh,
                        axis: str = "line", dtype=jnp.float32):
    """Per-molecule line OD with the catalog sharded over `axis`.

    cat_stack: from split_catalog_stack, leading dim == mesh.shape[axis].
    state: LayerState (replicated).  Returns [..., W, n_mol] identical to
    the unsharded `line_od_block` up to f32 summation order.
    """
    n_shards = mesh.shape[axis]
    assert next(iter(cat_stack.values())).shape[0] == n_shards

    cat_specs = {k: P(axis) for k in cat_stack}
    rep = P()
    has_split = wn_split is not None

    # jit around the shard_map: called eagerly, every primitive inside
    # would otherwise compile as its own tiny SPMD executable (minutes
    # of compile for the transcendental-heavy line math)
    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(cat_specs, rep, rep, rep, rep, rep, rep, rep),
             out_specs=rep)
    def f(cat_shard, wn_, split_arr, p, t, wk, wb, scor):
        cat = {k: v[0] for k, v in cat_shard.items()}
        split = (split_arr[0], split_arr[1]) if has_split else None
        od = line_od_block(cat, wn_, split, p, t, wk, wb,
                           scor, cfg, n_mol, dtype)
        return jax.lax.psum(od, axis)

    split_arr = jnp.stack(wn_split) if has_split else \
        jnp.zeros((2,) + jnp.shape(wn), dtype)
    return f(cat_stack, wn, split_arr,
             jnp.asarray(state.p, dtype), jnp.asarray(state.t, dtype),
             jnp.asarray(state.wkl, dtype),
             jnp.asarray(state.wbrodl, dtype),
             jnp.asarray(scor_flat, dtype))
