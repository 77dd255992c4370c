"""Multi-chip execution: device mesh + sharded batched forward.

The reference is strictly serial (SURVEY.md section 2.3); here parallelism
is first-class.  The natural axes of the problem map onto a 2-D mesh:

  * "prof" — independent atmospheric profiles (embarrassingly parallel,
    data-parallel batch axis; rides DCN across hosts)
  * "wn"   — wavenumber/channel axis (elementwise through the whole model
    except tiny static regrid gathers; rides ICI within a host)

The model's line axis is contracted locally on every device (each shard
sums all lines for its wavenumbers) — no collectives in the hot loop at
all; only the input broadcast and output gather touch the interconnect.

`shard_forward` places inputs with NamedSharding and jits the configured
model; XLA's SPMD partitioner propagates the (prof, wn) sharding through
the elementwise/cumsum/matmul graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monortm_tpu.types import LayerState


def make_mesh(n_prof: int | None = None, n_wn: int | None = None,
              devices=None, n_line: int = 1) -> Mesh:
    """Build a (prof, wn[, line]) mesh over the available devices.

    n_line > 1 adds a third "line" axis: the line catalog's candidate
    tiles are contracted across it with one psum per forward (for
    catalogs too large per chip; see parallel/linesharded.py and the
    engines' mesh paths in models/od.py)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size // n_line
    if n_prof is None and n_wn is None:
        n_wn = n
        n_prof = 1
    elif n_prof is None:
        n_prof = n // n_wn
    elif n_wn is None:
        n_wn = n // n_prof
    assert n_prof * n_wn * n_line == devices.size, \
        (n_prof, n_wn, n_line, devices.size)
    if n_line > 1:
        return Mesh(devices.reshape(n_prof, n_wn, n_line),
                    ("prof", "wn", "line"))
    return Mesh(devices.reshape(n_prof, n_wn), ("prof", "wn"))


def shard_state(state: LayerState, mesh: Mesh) -> LayerState:
    """Place a profile-batched LayerState: batch axis over 'prof',
    replicated over 'wn'."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return LayerState(
        p=put(state.p, P("prof", None)),
        t=put(state.t, P("prof", None)),
        tz=put(state.tz, P("prof", None)),
        wkl=put(state.wkl, P("prof", None, None)),
        wbrodl=put(state.wbrodl, P("prof", None)),
        clw=put(state.clw, P("prof", None)),
    )


def shard_forward(model, mesh: Mesh, irt: int):
    """Jitted batched forward with (prof, wn)-sharded outputs.

    Returns fn(state, tsfc, emis, refl) -> tb [B, W].
    """
    out_sharding = NamedSharding(mesh, P("prof", "wn"))

    @partial(jax.jit, out_shardings=out_sharding)
    def fn(state, tsfc, emis, refl):
        return model.tb(state, tsfc, emis, refl, irt)

    return fn


def shard_forward_and_grad(model, mesh: Mesh, irt: int):
    """Forward + adjoint (retrieval-style sensitivity) under the same
    sharding: returns fn(state, tsfc, emis, refl, tb_obs) ->
    (loss, grads wrt state).  The adjoint outputs are constrained to the
    same profile sharding as the inputs (replicated scalar loss)."""
    out_shardings = (NamedSharding(mesh, P()),
                     jax.tree_util.tree_map(
                         lambda _: NamedSharding(mesh, P("prof")),
                         LayerState(p=0, t=0, tz=0, wkl=0, wbrodl=0, clw=0)))

    def loss_fn(state, tsfc, emis, refl, tb_obs):
        tb = model.tb(state, tsfc, emis, refl, irt)
        return jnp.mean((tb - tb_obs) ** 2)

    @partial(jax.jit, out_shardings=out_shardings)
    def fn(state, tsfc, emis, refl, tb_obs):
        loss, grads = jax.value_and_grad(loss_fn)(state, tsfc, emis, refl,
                                                  tb_obs)
        return loss, grads

    return fn
