"""Worker process for the 2-process multi-host CPU test.

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
       <out.npz>

Each process exposes 4 virtual CPU devices; the global (prof, wn) mesh
spans 2 x 4 = 8 devices with the profile axis block-distributed across
processes.  Process 0 writes the gathered Tb to <out.npz>.
"""

import os
import sys
from pathlib import Path

pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                         int(sys.argv[3]), Path(sys.argv[4]))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from monortm_tpu.parallel.distributed import (gather_to_host, global_mesh,
                                              host_local_batch,
                                              init_distributed,
                                              make_global_state)

assert init_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc

import jax.numpy as jnp
from monortm_tpu.models.monortm import MonoRTM
from monortm_tpu.parallel.sharding import shard_forward
from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

N_GLOBAL = 8
wn = 0.3 + 0.05 * np.arange(32)
cat = synthetic_catalog_mw(n_h2o=16, n_o2=8, tile=64)
model = MonoRTM(wn, dvset=0.05, catalog=cat, nmol=22, dtype=jnp.float32,
                wn_tile=8, line_tile=64, use_pallas=False)

mesh = global_mesh(n_wn=2)
assert mesh.shape == {"prof": 4, "wn": 2}, mesh.shape

# every process builds the same global profile set, then keeps its block
full = synthetic_state(nlay=8, batch=N_GLOBAL)
start, count = host_local_batch(N_GLOBAL, mesh)
local = jax.tree_util.tree_map(lambda a: np.asarray(a)[start:start + count],
                               full)
state = make_global_state(local, N_GLOBAL, mesh)

emis = jnp.full((len(wn),), 0.95, jnp.float32)
refl = 1.0 - emis
tsfc = jnp.full((N_GLOBAL, 1), 288.0, jnp.float32)

with mesh:
    tb = shard_forward(model, mesh, irt=3)(state, tsfc, emis, refl)
    tb_host = gather_to_host(tb)

if pid == 0:
    np.savez(out, tb=tb_host)
print(f"worker {pid}: OK tb {tb_host.shape}")
