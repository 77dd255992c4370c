"""Multi-process (2-host-style) CPU run == single-process run.

Launches two worker processes that rendezvous via jax.distributed over
localhost, compute Tb on a global 2x(4-device) (prof, wn) mesh with the
profile axis block-distributed across processes, and compares the gathered
result to this process's single-mesh answer (VERDICT r1 item 6).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pipeline_cli_matches_single(tmp_path):
    """The PRODUCTION path across processes: `monortm-tpu --distributed
    --mesh 2x4` in two rendezvousing CPU processes must write the same
    MONORTM.OUT bytes as a single-process single-device run (VERDICT r3
    item 4 — not a bespoke model, the real CLI)."""
    from monortm_tpu.pipeline import run
    from monortm_tpu.testing import make_minimal_rundir

    make_minimal_rundir(tmp_path, nprof=3)
    (tmp_path / "dist").mkdir()
    (tmp_path / "single").mkdir()
    run(filein=tmp_path / "MONORTM.IN",
        fileprof=tmp_path / "MONORTM_PROF.IN",
        hfile=tmp_path / "TAPE3", outdir=tmp_path / "single", mesh=None)

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    worker = Path(__file__).parent / "multihost_pipeline_worker.py"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outs.append(stdout.decode())
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o}"

    b_dist = (tmp_path / "dist" / "MONORTM.OUT").read_bytes()
    b_single = (tmp_path / "single" / "MONORTM.OUT").read_bytes()
    assert b_dist == b_single


def test_two_process_run_matches_single(tmp_path):
    port = _free_port()
    out = tmp_path / "tb.npz"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"

    worker = Path(__file__).parent / "multihost_worker.py"
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outs.append(stdout.decode())
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{o}"
    got = np.load(out)["tb"]

    # single-process reference on the same synthetic inputs
    from monortm_tpu.models.monortm import MonoRTM
    from monortm_tpu.testing import synthetic_catalog_mw, synthetic_state

    wn = 0.3 + 0.05 * np.arange(32)
    cat = synthetic_catalog_mw(n_h2o=16, n_o2=8, tile=64)
    model = MonoRTM(wn, dvset=0.05, catalog=cat, nmol=22,
                    dtype=jnp.float32, wn_tile=8, line_tile=64,
                    use_pallas=False)
    state = synthetic_state(nlay=8, batch=8)
    emis = jnp.full((len(wn),), 0.95, jnp.float32)
    refl = 1.0 - emis
    tsfc = jnp.full((8, 1), 288.0, jnp.float32)
    want = np.asarray(jax.jit(
        lambda s: model.tb(s, tsfc, emis, refl, 3))(state))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-6, atol=5e-6)
