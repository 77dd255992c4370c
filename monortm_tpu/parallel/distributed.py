"""Multi-host execution: jax.distributed init + global (prof, wn) mesh.

The reference is a single serial process (SURVEY.md section 2.3); scale-out
here follows the standard JAX SPMD recipe:

  * every host runs the same program and calls `init_distributed` once
    (coordinator rendezvous over DCN);
  * the profile axis is sharded across hosts/processes — profiles are
    embarrassingly parallel, so the only DCN traffic is the input scatter
    and output gather (no collectives in the forward itself);
  * within a host, chips split profiles x wavenumbers over ICI exactly as
    in `parallel.sharding` — the global mesh simply spans all processes'
    devices, and XLA's SPMD partitioner handles both levels at once;
  * per-host input pipelines build only their local profile shard
    (`host_local_batch` -> `make_global_state`), the device arrays are
    assembled with jax.make_array_from_process_local_data, and results
    come back with process_allgather.

For a sharded *line* axis (catalogs beyond one chip's HBM) the same mesh
gains a "line" axis and per-shard partial shape-function sums are combined
with psum — the contraction in models/od.py is already a sum over line
tiles, so the collective composes; see docs/ARCHITECTURE.md.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from monortm_tpu.types import LayerState


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids=None) -> bool:
    """Initialize jax.distributed for a multi-process run.

    No-op (returns False) for single-process runs, so the same entry point
    works everywhere.  With arguments (or the JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID environment set), performs the
    coordinator rendezvous and returns True.
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id, local_device_ids)
    return True


def global_mesh(n_wn: int = 1) -> Mesh:
    """A (prof, wn) mesh over every device of every process.

    The prof axis is the outer (DCN-friendly) axis: with the default
    device order, consecutive prof shards live on the same process, so
    profile scatter/gather rides the local host link and nothing in the
    forward crosses DCN.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    assert n % n_wn == 0, (n, n_wn)
    return Mesh(devices.reshape(n // n_wn, n_wn), ("prof", "wn"))


def host_local_batch(n_global: int, mesh: Mesh) -> tuple[int, int]:
    """(start, count) of the profile indices this process should load.

    Profiles are block-distributed across the prof axis in process order;
    n_global must divide evenly by the prof-axis size (pad the last batch
    on the driver side otherwise).
    """
    n_prof = mesh.shape["prof"]
    assert n_global % n_prof == 0, (n_global, n_prof)
    per_shard = n_global // n_prof
    # which prof shards does this process own?
    mine = [i for i in range(n_prof)
            if mesh.devices[i, 0].process_index == jax.process_index()]
    if not mine:
        return 0, 0
    start = min(mine) * per_shard
    count = len(mine) * per_shard
    return start, count


def make_global_state(local: LayerState, n_global: int,
                      mesh: Mesh) -> LayerState:
    """Assemble the globally-sharded LayerState from this process's local
    profile block (jax.make_array_from_process_local_data)."""
    def put(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=(n_global,) + x.shape[1:])

    return LayerState(
        p=put(local.p, P("prof", None)),
        t=put(local.t, P("prof", None)),
        tz=put(local.tz, P("prof", None)),
        wkl=put(local.wkl, P("prof", None, None)),
        wbrodl=put(local.wbrodl, P("prof", None)),
        clw=put(local.clw, P("prof", None)),
    )


def gather_to_host(x) -> np.ndarray:
    """All-gather a (prof, wn)-sharded result to every host as numpy."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
