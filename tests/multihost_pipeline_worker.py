"""Worker process for the 2-process *production pipeline* CLI test.

Usage: python tests/multihost_pipeline_worker.py <process_id>
       <num_processes> <port> <rundir>

Each process exposes 4 virtual CPU devices; the CLI is invoked with
--distributed --mesh 2x4, so the global (prof, wn) mesh spans 2 x 4 = 8
devices with the profile axis block-distributed across the two
processes.  Process 0 writes <rundir>/dist/MONORTM.OUT; the test
compares it byte-for-byte with a single-process run.
"""

import os
import sys
from pathlib import Path

pid, nproc, port, rundir = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), Path(sys.argv[4]))
mesh_arg = sys.argv[5] if len(sys.argv) > 5 else "2x4"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["JAX_NUM_PROCESSES"] = str(nproc)
os.environ["JAX_PROCESS_ID"] = str(pid)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

from monortm_tpu.cli import main

rc = main(["--distributed", "--mesh", mesh_arg,
           "--in", str(rundir / "MONORTM.IN"),
           "--prof", str(rundir / "MONORTM_PROF.IN"),
           "--tape3", str(rundir / "TAPE3"),
           "--outdir", str(rundir / "dist")])
assert rc == 0
assert jax.process_count() == nproc
print(f"worker {pid}: pipeline OK")
