"""Command-line driver: `python -m monortm_tpu.cli [options]`.

Drop-in workflow replacement for the reference executable: reads
MONORTM.IN (+ MONORTM_PROF.IN when IATM=0, TAPE3) from the working
directory and writes MONORTM.OUT, like PROGRAM MONORTM
(monortm.f90:292-298) — plus flags the Fortran never had (precision,
tiling, output directory).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(prog="monortm-tpu",
                                 description=__doc__)
    ap.add_argument("--in", dest="filein", default="MONORTM.IN")
    ap.add_argument("--prof", dest="fileprof", default="MONORTM_PROF.IN")
    ap.add_argument("--tape3", dest="hfile", default="TAPE3")
    ap.add_argument("--out", dest="fileout", default="MONORTM.OUT")
    ap.add_argument("--outdir", default=".")
    ap.add_argument("--precision", choices=("float32", "float64"),
                    default="float32")
    ap.add_argument("--wn-tile", type=int, default=128)
    ap.add_argument("--line-tile", type=int, default=4096)
    ap.add_argument("--netcdf", action="store_true",
                    help="also write MONORTM.NNNNN.nc per profile "
                         "(USENETCDF build option of the reference)")
    ap.add_argument("--mesh", default="auto", metavar="PROFxWN[xLINE]",
                    help="device mesh: 'auto' (default; every local "
                         "device on a (prof, wn) mesh), 'off' (single "
                         "device), or an explicit shape like '2x4' — "
                         "an optional third factor shards the line "
                         "catalog's candidate tiles (psum-contracted), "
                         "e.g. '2x2x2'")
    ap.add_argument("--workers", type=int, default=None,
                    help="host processes for IATM=1 layering "
                         "(default: auto for large profile stacks)")
    ap.add_argument("--engine",
                    choices=("auto", "xla", "pallas", "hybrid"),
                    default="auto",
                    help="line engine: 'auto' (Pallas kernel + "
                         "per-layer all-Lorentz dispatch on TPU, dense "
                         "XLA elsewhere), 'xla' (dense engine), "
                         "'pallas' (kernel only), 'hybrid' (kernel + "
                         "dispatch even off-TPU)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host run: jax.distributed rendezvous via "
                         "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                         "JAX_PROCESS_ID before building the mesh")
    args = ap.parse_args(argv)

    if args.distributed:
        from monortm_tpu.parallel.distributed import init_distributed
        if not init_distributed():
            print("monortm-tpu: --distributed set but coordinator env "
                  "not configured; running single-process")

    if args.precision == "float64":
        import jax
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from monortm_tpu.pipeline import run

    mesh = args.mesh
    if mesh == "off":
        mesh = None
    elif mesh != "auto":
        import jax
        from monortm_tpu.parallel.sharding import make_mesh
        dims = [int(v) for v in mesh.lower().split("x")]
        n_prof, n_wn = dims[0], dims[1]
        n_line = dims[2] if len(dims) > 2 else 1
        mesh = make_mesh(n_prof=n_prof, n_wn=n_wn, n_line=n_line,
                         devices=jax.devices()[:n_prof * n_wn * n_line])

    dtype = jnp.float64 if args.precision == "float64" else jnp.float32
    t0 = time.time()
    res = run(filein=args.filein, fileprof=args.fileprof, hfile=args.hfile,
              fileout=args.fileout, outdir=args.outdir, dtype=dtype,
              wn_tile=args.wn_tile, line_tile=args.line_tile,
              netcdf=args.netcdf, mesh=mesh, workers=args.workers,
              engine=args.engine)
    dt = time.time() - t0
    print(f"monortm-tpu: {len(res.tb)} profile(s) x {len(res.wn)} "
          f"wavenumber(s) in {dt:.2f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
