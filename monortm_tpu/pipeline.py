"""End-to-end run pipeline: MONORTM.IN (+ MONORTM_PROF.IN, TAPE3) ->
MONORTM.OUT, mirroring the reference driver loop (monortm.f90:316-588).

Host-side orchestration only; all device compute lives in models/*.
Profiles with identical shapes (same layer count / viewing geometry) are
stacked and batched onto the device as one [B, nlay] forward call, jitted
once per shape; outputs are written per profile in input order.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from monortm_tpu import constants as cst
from monortm_tpu.io import emis as emis_io
from monortm_tpu.io.output import OutputWriter
from monortm_tpu.io.profin import Profile, read_profiles
from monortm_tpu.io.tape5 import Tape5Config, Tape5Reader, count_profiles
from monortm_tpu.lines import load_catalog
from monortm_tpu.models.monortm import MonoRTM
from monortm_tpu.ops.lineshape import LineConfig
from monortm_tpu.types import LayerState, irt_from_angle
from monortm_tpu.utils.trace import StageTimer, profile_trace


def profil_scal(wkl: np.ndarray, wbrodl: np.ndarray, nmol: int,
                hmol_scal: str, xmol_scal: np.ndarray,
                nmol_scal: int) -> np.ndarray:
    """Profile scaling (profil_scal_sub, monortm_sub.F90:937-1044).

    wkl: [nlay, 39] column densities -> returns scaled copy.
    """
    wkl = np.array(wkl, np.float64)
    wmt = wkl.sum(axis=0)
    wsum_brod = float(np.sum(wbrodl))
    wsum_drair = (0.0 if nmol >= 22 else wsum_brod) + wmt[1:nmol].sum()

    for m in range(nmol_scal):
        hm = hmol_scal[m] if m < len(hmol_scal) else " "
        xm = float(xmol_scal[m]) if m < len(xmol_scal) else 1.0
        if hm == " ":
            fac = 1.0
        elif hm == "0":
            fac = 0.0
        elif hm == "1":
            fac = xm
        elif hm in "Cc":
            fac = xm / wmt[m]
        elif hm in "Mm":
            if wsum_drair <= 0:
                raise ValueError("mixing ratio failure: wsum_drair = 0")
            fac = xm / (wmt[m] / wsum_drair)
        elif hm in "Pp":
            if m != 0:
                raise ValueError("PWV scaling only valid for H2O")
            fac = (xm / cst.PWV_CM_PER_MOLEC_CM2) / wmt[0]
        elif hm in "Dd":
            fac = (xm * cst.DOBSON_TO_MOLEC_CM2) / wmt[m]
        else:
            raise ValueError(f"unknown scaling code {hm!r}")
        wkl[:, m] *= fac
    return wkl


def integr(wkl: np.ndarray, clw: np.ndarray):
    """Column PWV [cm] and CLW [mm] (INTEGR, monortm_sub.F90:831-845)."""
    pwv = float(np.sum(wkl[:, 0])) * cst.PWV_CM_PER_MOLEC_CM2
    return pwv, float(np.sum(clw))


# the reference's hand-centred 8-char labels (DATA HMOLC,
# lblatm.f90:179-188), printed through A10 edits in the LOG tables
_HMOLC8 = (
    "  H2O   ", "  CO2   ", "   O3   ", "  N2O   ", "   CO   ",
    "  CH4   ", "   O2   ", "   NO   ", "  SO2   ", "  NO2   ",
    "  NH3   ", " HNO3   ", "   OH   ", "   HF   ", "  HCL   ",
    "  HBR   ", "   HI   ", "  CLO   ", "  OCS   ", " H2CO   ",
    " HOCL   ", "   N2   ", "  HCN   ", " CH3CL  ", " H2O2   ",
    " C2H2   ", " C2H6   ", "  PH3   ", " COF2   ", "  SF6   ",
    "  H2S   ", " HCOOH  ", "  HO2   ", "   O+   ", " ClONO2 ",
    "   NO+  ", "  HOBr  ", " C2H4   ", " CH3OH  ")


def _fort_hmolid(m: int) -> str:
    """HMOLC(m) through an A10 edit (2 leading blanks)."""
    return "  " + _HMOLC8[m]


def _log_layer_table(log, p, t, wkl, wbrodl, nmol, title=None):
    """Per-layer column-amount + mixing-ratio tables into MONORTM.LOG,
    byte-matching the reference's IFORM=1 format statements
    974/980/985/976/979 (monortm_sub.F90:1052-1209; lblatm.f90:1219-1244
    logs the same layout for IATM=1 paths).

    Deviation (documented): in the molecules-8+ mixing-ratio block the
    reference divides by a stale WDRAIR from the previous loop (the
    variable is not recomputed per layer, monortm_sub.F90:1160-1185);
    here the per-layer dry-air density is used for every block.
    """
    p = np.asarray(p, np.float64)
    t = np.asarray(t, np.float64)
    wkl = np.asarray(wkl, np.float64)
    wbrodl = np.asarray(wbrodl, np.float64)
    nlay = len(p)
    holn2 = "  OTHER "

    wmt = wkl.sum(axis=0)
    wtot = wkl[:, :7].sum(axis=1) + wbrodl
    pwtd = float((p * wtot).sum() / wtot.sum())
    twtd = float((t * wtot).sum() / wtot.sum())

    def hdr974(names):
        log.write("0" + " " * 53
                  + "MOLECULAR AMOUNTS (MOL/CM**2) BY LAYER \n")
        log.write(" " * 13 + "P(MB)" + " " * 6 + "T(K)" + " " * 5
                  + "".join(f"{n:>10s}" + " " * 5 for n in names) + "\n")

    def row980(lbl, pv, tv, vals):
        # C-level %-formatting: this table is the host-prep hot spot at
        # many-profile scale (~5 ms/profile with f-string joins)
        log.write("0%3d%15.7f%9.2f  " % (lbl, pv, tv)
                  + ("%15.7E" * len(vals)) % tuple(vals) + "\n")

    # molecular amounts, 8 columns per block (974/980/985): block 1 is
    # mols 1-7 + OTHER, later blocks mols 8-15, 16-23, ... (MLO=8,8)
    for mlo in [0] + list(range(7, nmol, 8)):
        mhi = min(mlo + 8, nmol)
        if mlo == 0:
            names = [_fort_hmolid(m)[2:] for m in range(7)] + [holn2]
            cols = lambda k: list(wkl[k, :7]) + [wbrodl[k]]
            tot = list(wmt[:7]) + [float(wbrodl.sum())]
        else:
            log.write("\n" * 5)          # format 970 (////)
            names = [_fort_hmolid(m)[2:] for m in range(mlo, mhi)]
            cols = lambda k: list(wkl[k, mlo:mhi])
            tot = list(wmt[mlo:mhi])
        hdr974(names)
        for k in range(nlay):
            row980(k + 1, p[k], t[k], cols(k))
        if nlay > 1:
            log.write("0" + " " * 54
                      + "ACCUMULATED MOLECULAR AMOUNTS FOR TOTAL PATH\n")
            row980(nlay, pwtd, twtd, tot)

    # mixing ratios vs dry air (976/980/979)
    wdrair = wbrodl + wkl[:, 1:nmol].sum(axis=1)

    def hdr976(names):
        log.write("\n1" + " " * 54
                  + "----------------------------------\n")
        log.write("0" + " " * 60 + "MIXING RATIOS BY LAYER \n")
        log.write(" " * 10 + "P(MB)" + " " * 6 + "T(K)" + " " * 5
                  + "".join(f"{n:>10s}" + " " * 5 for n in names) + "\n")

    for mlo in [0] + list(range(7, nmol, 8)):
        mhi = min(mlo + 8, nmol)
        if mlo == 0:
            names = [_fort_hmolid(m)[2:] for m in range(7)] + [holn2]
            cols = lambda k: list(wkl[k, :7] / wdrair[k]) + [wbrodl[k]]
        else:
            if nlay < 5:
                log.write("\n" * 5)      # format 970
            names = [_fort_hmolid(m)[2:] for m in range(mlo, mhi)]
            cols = lambda k: list(wkl[k, mlo:mhi] / wdrair[k])
        hdr976(names)
        for k in range(nlay):
            if wdrair[k] == 0.0:
                log.write("\n0  MIXING RATIO IS UNDEFINED. "
                          "DRYAIR DENSITY=0.0\n")
            else:
                row980(k + 1, p[k], t[k], cols(k))


@dataclasses.dataclass
class RunResult:
    wn: np.ndarray
    tb: list          # per profile [W]
    rad: list
    results: list     # per profile io.output.ProfileOutput


def _index_tree(x, i):
    """Per-profile numpy view into one batched output container."""
    if x is None:
        return None
    if isinstance(x, dict):
        return {k: _index_tree(v, i) for k, v in x.items()}
    return np.asarray(x)[i]


def _slice_result(res, i):
    """Profile i's view of a batched ForwardResult (host numpy)."""
    from monortm_tpu.models.monortm import ForwardResult
    from monortm_tpu.models.od import ODResult
    from monortm_tpu.models.rt import RTResult
    od = ODResult(od_total=_index_tree(res.od.od_total, i),
                  od_by_mol=_index_tree(res.od.od_by_mol, i),
                  oc=_index_tree(res.od.oc, i),
                  od_clw=_index_tree(res.od.od_clw, i),
                  od_xsec=_index_tree(res.od.od_xsec, i))
    rt = RTResult(*(_index_tree(v, i) for v in res.rt))
    return ForwardResult(rt=rt, od=od, emis=res.emis, refl=res.refl)


# upper bound on line-sum evaluations (layers x wavenumbers x lines) per
# device call: ~25 s worst-case on a v5e chip at the measured dense-
# catalog rate.  Single executions past ~1-2 min are killed on tunneled
# backends, so the pipeline splits the independent layer axis to stay
# under this (the 200-layer x 80k-wn x 250k-line reference envelope).
_MAX_OD_EVALS_PER_CALL = 8.0e11


def _device_budget_bytes(default: float = 2.0e9) -> float:
    """Usable per-device memory for batching, from the device itself.

    Uses memory_stats()['bytes_limit'] where the backend reports it (TPU
    does), keeping 25% headroom for compiler scratch; falls back to a
    2 GB default on backends without stats (CPU test meshes).
    """
    try:
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            return 0.75 * float(limit)
    except Exception:
        pass
    return default


def _max_batch(nwn: int, nlay: int, nmol: int, n_prof_shards: int = 1,
               budget_bytes: float | None = None) -> int:
    """Cap the profile batch so the dominant [B, W, M, L] output fits.

    The budget is per device; a (prof, wn) mesh splits both the batch and
    the wavenumber axis, so the cap scales with the device count."""
    if budget_bytes is None:
        budget_bytes = _device_budget_bytes()
    per = max(1, nwn * nlay * (nmol + 6) * 4 * 2)
    b = int(max(1, min(1024, n_prof_shards * budget_bytes // per)))
    # keep full shards: round down to a multiple of the prof mesh axis
    if b > n_prof_shards:
        b -= b % n_prof_shards
    return b


def _auto_mesh(nprof: int):
    """(prof, wn) mesh over all *global* devices (jax.devices()): as much
    profile data parallelism as the workload allows, the rest of the
    devices on the wavenumber axis.  In multi-controller runs the mesh
    spans every process's devices — process-local shards are uploaded via
    make_array_from_callback (see put_prof below).  Returns None on a
    single device."""
    devs = jax.devices()
    n = len(devs)
    if n <= 1:
        return None
    from monortm_tpu.parallel.sharding import make_mesh
    n_prof = 1
    for d in range(1, n + 1):
        if n % d == 0 and d <= max(1, nprof):
            n_prof = d
    return make_mesh(n_prof=n_prof, n_wn=n // n_prof, devices=devs)


def run(filein="MONORTM.IN", fileprof="MONORTM_PROF.IN", hfile="TAPE3",
        fileout="MONORTM.OUT", outdir=".", dtype=jnp.float32,
        wn_tile=128, line_tile=4096, emis_dir=None,
        netcdf=False, profile_dir=None, mesh="auto",
        workers=None, engine="auto") -> RunResult:
    """Run the full MONORTM.IN -> MONORTM.OUT pipeline.

    mesh: "auto" builds a (prof, wn) mesh over every local device (the
    production multi-chip path; single device -> plain jit), None forces
    single-device execution, or pass a jax.sharding.Mesh with
    ("prof", "wn") axes.  workers: host-side process count for IATM=1
    layering (atmos.tape5_atm.profiles_from_tape5).
    engine: "auto" (hardware default: Pallas kernel + per-layer
    all-Lorentz dispatch on TPU, dense XLA engine elsewhere), "xla"
    (dense engine), "pallas" (kernel only, dispatch off), or "hybrid"
    (kernel + dispatch even off-TPU — interpret mode; tests).
    """
    if engine not in ("auto", "xla", "pallas", "hybrid"):
        raise ValueError(f"unknown engine {engine!r}")
    use_pallas = {"auto": None, "xla": False, "pallas": True,
                  "hybrid": True}[engine]
    filein = Path(filein)
    Path(outdir).mkdir(parents=True, exist_ok=True)
    timer = StageTimer()
    # persistent compile cache: first compile of the forward is slow on
    # this class of backend (tens of seconds); repeat runs hit the cache
    try:
        jax.config.update("jax_compilation_cache_dir",
                          str(Path.home() / ".cache" / "monortm_tpu_jax"))
        # cache even sub-second compiles: on remote-compile backends every
        # miss is an HTTP round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    except Exception:
        pass
    with timer.stage("tape5-parse"):
        iatm, ixsect, nprof = count_profiles(filein, fileprof)
        rd = Tape5Reader(filein)
        cfg = rd.read_block()
    wn = cfg.wn
    if cfg.nwn == 0:
        raise ValueError("no wavenumbers configured")

    with timer.stage("line-catalog"):
        catalog = load_catalog(hfile, float(wn[0]), float(wn[-1]),
                               tile=min(line_tile, 4096))

    # boundary spectra (EMISS_REFLEC, monortm_sub.F90:506-516)
    ed = Path(emis_dir) if emis_dir else filein.parent / "in"
    emis = emis_io.boundary_spectrum(
        wn, cfg.bndemi, ed / "EMISSION" if cfg.bndemi[0] < 0 else None)
    refl = emis_io.boundary_spectrum(
        wn, cfg.bndrfl, ed / "REFLECTION" if cfg.bndrfl[0] < 0 else None)

    nprocs = jax.process_count()
    # profiles: IATM=0 parses the layer file (fast); IATM=1 runs the
    # LBLATM-equivalent layering.  Single-process IATM=1 runs STREAM
    # the layering through a worker pool so the device starts on early
    # profiles while later ones are still being layered (the
    # producer/consumer loop below); multi-controller and IXSECT runs
    # keep the blocking list (deterministic enqueue order across
    # processes / the thread-pooled xsec pre-pass needs the full list).
    stream = iatm == 1 and nprocs == 1 and cfg.ixsect == 0
    profiles = None
    if iatm == 0:
        with timer.stage("profiles+layering"):
            profiles = read_profiles(fileprof, ixsect=ixsect)
    elif not stream:
        from monortm_tpu.atmos.tape5_atm import profiles_from_tape5
        with timer.stage("profiles+layering"):
            profiles = profiles_from_tape5(filein, cfg, workers=workers)
    if profiles is not None and len(profiles) != nprof:
        # '$'-recycling runs can differ; trust the parsed list
        nprof = len(profiles)

    # (prof, wn) device mesh for the production forward (the reference's
    # profile loop, monortm.f90:357, made data-parallel)
    if mesh == "auto":
        mesh = _auto_mesh(nprof)
    n_prof_shards = mesh.shape["prof"] if mesh is not None else 1
    n_wn_shards = mesh.shape["wn"] if mesh is not None else 1
    # multi-controller (jax.distributed) runs execute this same function
    # on every process: device arrays are assembled from process-local
    # shards, results are all-gathered, and only process 0 writes files
    # (the reference's serial profile loop, monortm.f90:357, spread over
    # the DCN axis)
    is_main = jax.process_index() == 0

    # TAPE7 (IPUNCH=1 on record 3.1, lblatm.f90:1264-1340): the layering
    # output in MONORTM_PROF.IN-compatible form — the reference's
    # checkpoint artifact for IATM=0 re-runs.  Collected by the producer
    # (streamed profiles arrive incrementally), written after the loop.
    punched: list = []

    model_cache: dict[int, MonoRTM] = {}
    out = RunResult(wn=wn, tb=[], rad=[], results=[])
    import os as _os
    writer = OutputWriter(Path(outdir) / fileout if is_main
                          else _os.devnull)

    # MONORTM.LOG (unit IPR=66 in the reference, monortm.f90:322-325):
    # control-record echo, line-file stats, per-profile notes
    log = open(Path(outdir) / "MONORTM.LOG" if is_main else _os.devnull,
               "w")
    log.write(" HIRAC    CNTNM    EMISS     PLOT     IATM      IOD"
              "    XSECT     ISPD     IBRD\n")
    log.write(f"{cfg.ihirac:5d}{cfg.icntnm:9d}{cfg.iemit:9d}"
              f"{cfg.iplot:9d}{cfg.iatm:9d}{cfg.iod:9d}{cfg.ixsect:9d}"
              f"{cfg.ispd:9d}{cfg.ibrd:9d}\n")
    log.write(f"0 TBOUND   = {cfg.tbound:12.4f}     BOUNDARY EMISSIVITY"
              f"   = {cfg.bndemi[0]:11.3E}{cfg.bndemi[1]:11.3E}"
              f"{cfg.bndemi[2]:11.3E}\n")
    # CHECKINPUTS-style echoes (monortm_sub.F90:163-253)
    for w in cfg.warnings:
        print("----------------------------------------")
        print(w)
        log.write(f" {w}\n")
    # PRCNTM-equivalent continuum info (contnm.f90:1170)
    f = cfg.factors
    log.write(" MT_CKD 3.5 CONTINUUM (ICNTNM={:d}): XSELF={:.3f} "
              "XFRGN={:.3f} XCO2C={:.3f} XO3CN={:.3f} XO2CN={:.3f} "
              "XN2CN={:.3f} XRAYL={:.3f}\n".format(
                  cfg.icntnm, f.xself, f.xfrgn, f.xco2c, f.xo3cn,
                  f.xo2cn, f.xn2cn, f.xrayl))
    log.write("   LINE FILE INFORMATION\n")
    import collections
    mol_counts = collections.Counter(
        int(m) for m, v in zip(catalog.mol, catalog.valid) if v)
    from monortm_tpu.data.loader import HMOLC
    for m in sorted(mol_counts):
        log.write(f"    {HMOLC[m-1]:>6s} = {mol_counts[m]:6d}\n")
    log.write(f"0 TOTAL NUMBER OF LINES ={catalog.n_lines:8d}\n")

    # ---- host prep per profile (scaling, columns, xsec OD) ----------
    cld_file = filein.parent / "in_lblrtm_cld"

    # cross-section OD prep is the one per-profile host stage with real
    # compute (file reads + pressure convolutions); fan it out across a
    # thread pool up front — the index/spectra caches are shared and the
    # numpy convolutions release the GIL (monortm.f90:492-532 runs this
    # serially per profile)
    xsec_results: dict[int, Any] = {}
    xs_profiles = [] if profiles is None else \
        [i for i, prof in enumerate(profiles)
         if cfg.ixsect >= 1
         and getattr(prof, "xamnt", None) is not None]
    if xs_profiles:
        from concurrent.futures import ThreadPoolExecutor
        from monortm_tpu.io.fscdxs import read_fscdxs, read_xs_file
        from monortm_tpu.ops.xsec import xsec_od
        fdir = filein.parent
        idx_cache: dict[tuple, Any] = {}
        spectra: dict[str, Any] = {}

        def _prep_xsec(i):
            prof = profiles[i]
            key = tuple(prof.xsname)
            if key not in idx_cache:
                idx_cache[key] = read_fscdxs(fdir / "FSCDXS", prof.xsname,
                                             float(wn.min()),
                                             float(wn.max()))
            idx = idx_cache[key]
            for regs in idx.regions.values():
                for reg in regs:
                    for f in reg.files:
                        if f not in spectra:
                            spectra[f] = read_xs_file(fdir / "xs" / f)
            st = prof.state
            return i, xsec_od(idx, spectra, wn, st.p, st.t, prof.xamnt)

        with timer.stage("xsec-prep"):
            # warm the caches serially on the first profile, then fan out
            xsec_results.update([_prep_xsec(xs_profiles[0])])
            rest = xs_profiles[1:]
            if rest:
                nthreads = min(8, len(rest))
                with ThreadPoolExecutor(nthreads) as ex:
                    xsec_results.update(ex.map(_prep_xsec, rest))

    prepped: list = []

    def prep_profile(npr0, prof):
        """Per-profile host prep (LOG tables, scaling, columns, xsec
        OD) — the reference's per-profile preamble
        (monortm.f90:369-551).  Called by the producer in input order."""
        st, meta = prof.state, prof.meta
        wkl = st.wkl
        log.write(f"1 PROFILE {npr0}\n")
        if getattr(prof, "path", None):
            # LBLATM path summary (lblatm.f90:1243-1244, format 968)
            pa = prof.path
            log.write(
                f" PATH: MODEL={prof.hmod or '(user)':24s} "
                f"H1={meta.h1:10.3f} H2={meta.h2:10.3f} "
                f"ANGLE={meta.angle:10.3f} RANGE={pa['range']:10.3f} "
                f"BETA={pa['beta']:10.3f} PHI={pa['phi']:10.3f} "
                f"HMIN={pa['hmin']:10.3f} BENDING={pa['bendng']:10.5f} "
                f"LEN={pa['len']:d} "
                f"AIRTOT={pa['airtot']:11.4E}\n")
        _log_layer_table(log, st.p, st.t, wkl, st.wbrodl, meta.nmol,
                         "MOLECULAR AMOUNTS (MOL/CM**2) BY LAYER")
        if cfg.nmol_scal > 0:
            wkl = profil_scal(wkl, st.wbrodl, meta.nmol,
                              cfg.hmol_scal, cfg.xmol_scal,
                              cfg.nmol_scal)
            log.write(" PROFILE SCALING (profil_scal_sub): HMOL_SCAL="
                      f"{cfg.hmol_scal[:cfg.nmol_scal]!r} XMOL_SCAL="
                      + " ".join(f"{x:.5E}" for x in
                                 cfg.xmol_scal[:cfg.nmol_scal]) + "\n")
            _log_layer_table(
                log, st.p, st.t, wkl, st.wbrodl, meta.nmol,
                "MODIFIED MOLECULAR AMOUNTS (MOL/CM**2) BY LAYER")
        pwv, clw_col = integr(wkl, st.clw)

        # cross-section molecules (IATM=0 layer amounts;
        # monortm.f90:492-532 + MONORTM_XSEC_SUB), prepared above
        od_xsec = xsec_results.get(npr0 - 1)

        # optional TES cloud OD file (see io/cldod.py)
        if cld_file.exists():
            from monortm_tpu.io.cldod import cloud_od_on_grid
            extra = cloud_od_on_grid(cld_file, wn, st.t.shape[-1])
            od_xsec = extra if od_xsec is None else od_xsec + extra

        irt = irt_from_angle(meta.angle)
        tbound = cfg.tbound
        if tbound < 0.0:       # FPACK: use TZ(0) (lblatm.f90:5952)
            tbound = float(np.asarray(st.tz)[0])
        return dict(st=st, meta=meta, wkl=wkl, pwv=pwv,
                    clw_col=clw_col, od_xsec=od_xsec,
                    irt=irt, tbound=tbound)

    # dtype conversions happen in host numpy: converting inside
    # jnp.asarray dispatches an eager convert_element_type on the device
    # (an extra compile round trip on remote-compile backends)
    npdt = np.dtype(jnp.dtype(dtype).name)
    wn_dev = jnp.asarray(np.asarray(wn, npdt))
    jit_cache: dict[tuple, Any] = {}
    results: dict[int, Any] = {}

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put_prof(x):
            # profile batch axis over "prof", everything else replicated;
            # the wn axis is split inside the model (shard_map over "wn")
            spec = P("prof", *(None,) * (x.ndim - 1))
            sh = NamedSharding(mesh, spec)
            if nprocs > 1:
                # multi-controller: every process holds the same host
                # stack; each uploads only its addressable shards (the
                # callback is invoked per local device index only)
                x = np.asarray(x)
                return jax.make_array_from_callback(x.shape, sh,
                                                    lambda i: x[i])
            return jax.device_put(x, sh)
    else:
        put_prof = jnp.asarray

    # The device work is two jits, both living on the (prof, wn) mesh
    # when one is active.  The OD stage (the hot line/continuum sweep)
    # also reduces everything the writer prints over the layer axis *on
    # device*, so the default path transfers only O(B x W) arrays to
    # host; per-layer arrays come back only for IOD=1 / NetCDF.  The RT
    # stage consumes the sharded OD directly (no de-shard round trip).
    #
    # Bitwise mesh-independence (asserted by tests/test_pipeline_mesh.py)
    # is preserved the same way the line engine does it: fixed-shape
    # blocked execution.  A plain jnp.sum / whole-array RT lets XLA pick
    # shape-dependent reduction orders, FMA contractions and
    # transcendental code paths per shard, wobbling the last ulp; here
    # every layer reduction is an order-fixed lax.scan, the RT
    # recurrences run per (profile, wn-tile) block so the per-element
    # program is identical under any mesh, and the final O(W) boundary
    # combine + Planck inversion happen in host NumPy on the arrays the
    # writer pulls anyway (combine_boundary_np).
    # Reference analog: per-wn independence of RTM, RTMmono.f90:177.
    from monortm_tpu.models.monortm import ForwardResult
    from monortm_tpu.models.rt import (RTResult, combine_boundary_np,
                                       rt_parts)

    def _lsum(x, axis=-1):
        """Layer sum in a fixed sequential order (elementwise adds are
        exact-rounded, so the result cannot depend on the sharding)."""
        xm = jnp.moveaxis(x, axis, 0)
        out, _ = jax.lax.scan(lambda c, xl: (c + xl, None),
                              jnp.zeros(xm.shape[1:], x.dtype), xm)
        return out

    # RT tiling geometry: tile count padded to a multiple of the mesh's
    # wn axis so each shard sweeps whole tiles; pad lanes carry a benign
    # wn=1.0 / od=0 and are cropped after the sweep
    nwn = len(wn)
    wt_rt = min(128, max(1, nwn))
    n_rt_tiles = -(-nwn // wt_rt)
    n_rt_tiles = -(-n_rt_tiles // n_wn_shards) * n_wn_shards
    wp_rt = n_rt_tiles * wt_rt
    _wn_rt = np.full(wp_rt, 1.0, np.float64)
    _wn_rt[:nwn] = wn
    wn_rt = jnp.asarray(_wn_rt.astype(npdt).reshape(n_rt_tiles, wt_rt))

    def _rt_parts_fn():
        def blocked(od4, t, tz, wnt):
            # od4 [b, nt, wt, L]; t [b, L]; tz [b, L+1]; wnt [nt, wt] —
            # nt/b are this shard's local counts, the per-tile body
            # below always sees the same [wt, L] shapes
            def per_prof(args):
                od3, t_l, tz_l = args
                return jax.lax.map(
                    lambda a: rt_parts(a[0], t_l[None, :],
                                       tz_l[None, :], a[1]),
                    (od3, wnt))
            return jax.lax.map(per_prof, (od4, t, tz))

        def f(odt, t, tz):
            b, nlay = odt.shape[0], odt.shape[-1]
            od4 = jnp.pad(odt, ((0, 0), (0, wp_rt - odt.shape[1]),
                                (0, 0)))
            od4 = od4.reshape(b, n_rt_tiles, wt_rt, nlay)
            if mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P
                res = shard_map(
                    blocked, mesh=mesh,
                    in_specs=(P("prof", "wn", None, None),
                              P("prof", None), P("prof", None),
                              P("wn", None)),
                    out_specs=P("prof", "wn", None),
                )(od4, t, tz, wn_rt)
            else:
                res = blocked(od4, t, tz, wn_rt)
            return jax.tree_util.tree_map(
                lambda v: v.reshape(v.shape[0], -1)[:, :nwn], res)
        return jax.jit(f)

    def _od_fn(model, keep_full: bool, engine: str | None = None,
               lor_layers=None):
        def f(s, ox, oclw):
            od = model.od_model(s, od_xsec=ox, od_clw_in=oclw,
                                engine=engine, lor_layers=lor_layers)
            # layer reductions in the OD jit: the [B,W,M,L] per-molecule
            # array stays on device (peak HBM is unchanged — the line
            # engine materializes it either way) and only the [B,W,M]
            # sums cross PCIe unless the NetCDF path asks for the full
            # array (keep_full)
            red = dict(otot=_lsum(od.od_total),
                       by_mol=_lsum(od.od_by_mol),
                       oc={k: _lsum(v, axis=-2)
                           for k, v in od.oc.items()})
            if od.od_xsec is not None:
                red["odx"] = _lsum(od.od_xsec, axis=-2)
            return od.od_total, red, (od if keep_full else None)
        return jax.jit(f)

    from monortm_tpu.ops.cloud import od_clw as _od_clw
    # the cloud OD is trivial elementwise work; jit it on the LOCAL CPU
    # backend when one exists — on remote-compile (tunneled) TPU
    # backends even a trivial first compile costs 20-100 s of HTTP
    # round trip (measured via the e2e profiles/s bench), which
    # dominated many-profile runs.  The result is a host-side array
    # either way (uploaded with the state batch below).
    wn_np = np.asarray(wn, npdt)
    _clw_jit = jax.jit(lambda t, c: _od_clw(jnp.asarray(wn_np),
                                            t[..., None], c[..., None]))
    try:
        # multi-controller runs must NOT divert to the local CPU
        # backend: with jax.distributed initialized the CPU platform
        # spans processes and a "local" jit turns into a Gloo
        # collective (observed DEADLINE_EXCEEDED in the 2-process test)
        _cpu0 = jax.devices("cpu")[0] if nprocs == 1 else None
    except RuntimeError:
        _cpu0 = None

    def clw_fn(t_h, c_h):
        if _cpu0 is not None:
            with jax.default_device(_cpu0):
                return np.asarray(_clw_jit(jnp.asarray(t_h),
                                           jnp.asarray(c_h)))
        return np.asarray(_clw_jit(jnp.asarray(t_h), jnp.asarray(c_h)))

    from monortm_tpu.io.output import ProfileOutput
    keep_layers = cfg.iod == 1 or netcdf
    host_bytes = [0]

    def pull(x):
        """Device -> host with transfer-byte accounting (the LOG line
        proves the default path never hauls a per-layer array).  In a
        multi-controller run the sharded result is all-gathered so every
        process sees the full arrays (only process 0 writes files)."""
        if x is None:
            return None
        if (nprocs > 1 and isinstance(x, jax.Array)
                and not x.is_fully_addressable):
            from jax.experimental import multihost_utils
            a = np.asarray(multihost_utils.process_allgather(x, tiled=True))
        else:
            a = np.asarray(x)
        host_bytes[0] += a.nbytes
        return a

    def ensure_model(nmol):
        """Build (once) the model + RT jit + dispatch predicate for an
        nmol group; returns whether runtime engine dispatch applies.

        Runtime engine dispatch: in the all-Lorentz regime (zeta > 0.99
        for every line/layer — the common microwave case,
        modm.f90:419-431) the lean XLA sweep beats the Pallas kernel's
        per-grid-step floor (BENCH_NOTES.md); the predicate makes the
        switch exact, and both runs of a mesh-vs-single comparison take
        the same branch (line-sharded meshes included: both engines
        contract the candidate columns over "line" with one psum)."""
        if nmol not in model_cache:
            with timer.stage("model-build"):
                model_cache[nmol] = MonoRTM(
                    wn, cfg.dvset, catalog, nmol=nmol,
                    factors=cfg.factors,
                    line_cfg=LineConfig(ibrd=cfg.ibrd),
                    dtype=dtype, wn_tile=wn_tile,
                    line_tile=line_tile,
                    use_pallas=use_pallas, mesh=mesh)
        model = model_cache[nmol]
        if "rt" not in jit_cache:
            jit_cache["rt"] = _rt_parts_fn()
        can_lor = model.od_model.use_pallas and \
            engine in ("auto", "hybrid")
        if can_lor and ("pred", nmol) not in jit_cache:
            # margin=1e-3 biases the predicate conservatively: the
            # check runs on the local CPU backend while the engines
            # run on TPU, and cross-backend f32 pow/exp differ by up
            # to ~1e-4 relative (BENCH_NOTES accuracy budget); a
            # boundary lane then keeps the full kernel, which is
            # correct in both branches
            jit_cache[("pred", nmol)] = jax.jit(
                lambda s, m=model: m.od_model.all_lorentz(
                    s, per_layer=True, margin=1e-3))
        return can_lor

    def produce():
        """The producer: profiles (possibly streaming out of the
        layering worker pool) -> per-profile prep -> same-shape chunk
        buffers (one [B, nlay] forward per chunk; the reference runs
        profile by profile, monortm.f90:357 — batching is the
        TPU-native win) -> fully host-prepped work items, yielded in
        deterministic order."""
        buffers: dict[tuple, list[int]] = {}
        bmax_of: dict[tuple, int] = {}

        def emit(key):
            nlay, irt_, nmol, has_x = key
            can_lor = ensure_model(nmol)
            return host_prep(dict(nlay=nlay, irt=irt_, nmol=nmol,
                                  has_x=has_x, can_lor=can_lor,
                                  chunk=buffers.pop(key)))

        if profiles is not None:
            src = iter(profiles)
        else:
            from monortm_tpu.atmos.tape5_atm import \
                profiles_from_tape5_iter
            src = profiles_from_tape5_iter(filein, cfg, workers=workers)
        npr0 = 0
        while True:
            if profiles is None:
                with timer.stage("profiles+layering"):
                    prof = next(src, None)
            else:
                prof = next(src, None)
            if prof is None:
                break
            npr0 += 1
            with timer.stage("host-prep"):
                pr = prep_profile(npr0, prof)
            prepped.append(pr)
            if getattr(prof, "ipunch", 0) == 1:
                punched.append(prof)
            key = (pr["st"].t.shape[-1], pr["irt"], pr["meta"].nmol,
                   pr["od_xsec"] is not None)
            buffers.setdefault(key, []).append(len(prepped) - 1)
            if key not in bmax_of:
                # NOTE: memory-sized chunks (not latency-sized): on the
                # tunneled dev backend every host->device call costs an
                # HTTP round trip (~1.3 s measured), so splitting a
                # fitting batch into small chunks LOSES even though the
                # consumer overlaps them; on direct-attached hardware
                # smaller chunks would pipeline profitably
                # (tools/bench_e2e.py --chunk-size exists to measure)
                bmax_of[key] = _max_batch(len(wn), key[0], key[2],
                                          n_prof_shards)
            if len(buffers[key]) >= bmax_of[key]:
                yield emit(key)
        # layering is complete here: write the TAPE7 checkpoint artifact
        # BEFORE the remaining device work so a mid-compute failure
        # cannot lose the expensive layering output (the reference
        # writes it from LBLATM, lblatm.f90:1264-1340)
        if punched and is_main:
            from monortm_tpu.io.tape7 import write_tape7
            write_tape7(Path(outdir) / "TAPE7", punched, xid=cfg.xid)
        for key in list(buffers):         # flush partial buffers
            yield emit(key)

    def host_prep(item):
        """Stage A: stack the chunk's host arrays, cloud OD and the
        engine predicate — pure host / local-CPU work.  Runs on the
        prefetch thread for chunk N+1 while the device executes chunk N
        (the reference's serial profile loop, monortm.f90:357, is the
        thing being overlapped away)."""
        prs = [prepped[i] for i in item["chunk"]]
        # pad the batch to a full set of "prof" shards (padding
        # repeats the last profile; its outputs are dropped)
        npad = (-len(prs)) % n_prof_shards
        prs = prs + [prs[-1]] * npad
        with timer.stage("host-stack"):
            nstack = lambda f: np.stack([f(p) for p in prs]).astype(npdt)
            h = dict(t=nstack(lambda p: p["st"].t),
                     tz=nstack(lambda p: p["st"].tz),
                     tsfc=nstack(lambda p: np.asarray([p["tbound"]])),
                     clw=nstack(lambda p: p["st"].clw),
                     p=nstack(lambda p: p["st"].p),
                     wkl=nstack(lambda p: p["wkl"]),
                     wb=nstack(lambda p: p["st"].wbrodl))
            if item["has_x"]:
                h["ox"] = nstack(lambda p: p["od_xsec"])
        # cloud OD in its own jit (see od_clw_in in models/od.py)
        with timer.stage("cloud-od"):
            h["oclw"] = clw_fn(h["t"], h["clw"])
        if item["can_lor"] and _cpu0 is not None:
            # per-layer zeta predicate -> engine choice: all layers
            # Lorentz -> lean XLA sweep; some -> hybrid layer split;
            # none -> Pallas kernel.  Evaluated on the LOCAL CPU
            # backend where one exists: the check is O(L x N)
            # elementwise, and a remote first compile costs 20-100 s
            # (see clw_fn above).  Multi-controller runs (no local CPU
            # diversion) defer the predicate to dispatch(), where it
            # runs on the mesh-sharded state — an unsharded evaluation
            # here would concentrate the full-chunk line_params
            # intermediates on one device.
            with timer.stage("engine-predicate"):
                st_h = LayerState(p=h["p"], t=h["t"], tz=h["tz"],
                                  wkl=h["wkl"], wbrodl=h["wb"],
                                  clw=h["clw"])
                pred = jit_cache[("pred", item["nmol"])]
                with jax.default_device(_cpu0):
                    rows = np.asarray(pred(st_h))
            h["lay_ok"] = np.asarray(rows).all(axis=0)
        item["host"] = h
        return item

    def dispatch(item):
        """Stage B: upload + enqueue the chunk's device work.  All jax
        dispatch is asynchronous, so this returns device futures; the
        synchronous pull happens in finalize() AFTER the next chunk has
        been dispatched, keeping the device busy across chunks."""
        h = item.pop("host")
        nlay, nmol = item["nlay"], item["nmol"]
        model = model_cache[nmol]
        with timer.stage("host->device"):
            oclw = h["oclw"]
            if mesh is not None:
                oclw = put_prof(oclw)
            state_d = LayerState(
                p=put_prof(h["p"]), t=put_prof(h["t"]),
                tz=put_prof(h["tz"]), wkl=put_prof(h["wkl"]),
                wbrodl=put_prof(h["wb"]), clw=put_prof(h["clw"]))
            ox = put_prof(h["ox"]) if "ox" in h else None
        lay_ok = h.get("lay_ok")
        if item["can_lor"] and lay_ok is None:
            # deferred predicate (multi-controller): evaluate on the
            # mesh-sharded state and all-gather the per-layer rows
            with timer.stage("engine-predicate"):
                rows = pull(jit_cache[("pred", item["nmol"])](state_d))
            lay_ok = np.asarray(rows).all(axis=0)

        # bound per-call device work by splitting the (independent)
        # layer axis: the reference envelope (200 layers x 80k wn x
        # 250k lines) is ~2 min in one program, past the backend's
        # execution limit; layer chunks keep each call ~25 s worst-case
        # and partial sums combine in fixed chunk order (deterministic)
        per_layer = len(wn) * max(model.od_model.catalog.n_lines, 1)
        lay_cap = max(1, int(_MAX_OD_EVALS_PER_CALL // per_layer))
        lay_splits = list(range(0, nlay, lay_cap)) + [nlay]

        def od_call(l0, l1):
            eng, lor_lay = None, ()
            if lay_ok is not None:
                sub = lay_ok[l0:l1]
                if sub.all():
                    eng = "lorentz-xla"
                elif sub.any():
                    eng = "hybrid"
                    lor_lay = tuple(np.nonzero(sub)[0].tolist())
            key = (nmol, eng, lor_lay, l1 - l0 if lay_cap < nlay
                   else None)
            if key not in jit_cache:
                jit_cache[key] = _od_fn(model, keep_full=netcdf,
                                        engine=eng,
                                        lor_layers=lor_lay)
            if l0 == 0 and l1 == nlay:
                return jit_cache[key](state_d, ox, oclw)
            sl = lambda x, ax: (None if x is None else
                                jax.lax.slice_in_dim(x, l0, l1,
                                                     axis=ax))
            st_c = LayerState(
                p=sl(state_d.p, -1), t=sl(state_d.t, -1),
                tz=jax.lax.slice_in_dim(state_d.tz, l0, l1 + 1,
                                        axis=-1),
                wkl=sl(state_d.wkl, -2),
                wbrodl=sl(state_d.wbrodl, -1),
                clw=sl(state_d.clw, -1))
            return jit_cache[key](st_c, sl(ox, -2), sl(oclw, -2))

        with timer.stage("device-dispatch"):
            if len(lay_splits) <= 2:
                odt, red, odfull = od_call(0, nlay)
            else:
                chunks = [od_call(l0, l1) for l0, l1 in
                          zip(lay_splits[:-1], lay_splits[1:])
                          if l1 > l0]
                odt = jnp.concatenate([c[0] for c in chunks],
                                      axis=-1)
                red = chunks[0][1]
                for c in chunks[1:]:
                    red = jax.tree_util.tree_map(jnp.add, red, c[1])
                odfull = None
                if netcdf and chunks[0][2] is not None:
                    from monortm_tpu.models.od import ODResult
                    cat3 = lambda f, ax: jnp.concatenate(
                        [f(c[2]) for c in chunks], axis=ax)
                    odfull = ODResult(
                        od_total=cat3(lambda o: o.od_total, -1),
                        od_by_mol=cat3(lambda o: o.od_by_mol, -1),
                        oc={k: cat3(lambda o, k=k: o.oc[k], -2)
                            for k in chunks[0][2].oc},
                        od_clw=cat3(lambda o: o.od_clw, -2),
                        od_xsec=(cat3(lambda o: o.od_xsec, -2)
                                 if chunks[0][2].od_xsec
                                 is not None else None))
            parts = rt_fn_call(odt, state_d.t, state_d.tz)
        item.update(parts=parts, red=red, odt=odt, odfull=odfull,
                    tsfc=h["tsfc"])
        return item

    def finalize(item):
        """Stage C: synchronous device->host pull + the O(W) NumPy
        boundary combine + result storage."""
        with timer.stage("device->host"):
            parts_h = jax.tree_util.tree_map(pull, item["parts"])
            red_h = jax.tree_util.tree_map(pull, item["red"])
            odt_h = pull(item["odt"]) if keep_layers else None
            od_h = (jax.tree_util.tree_map(pull, item["odfull"])
                    if netcdf and item["odfull"] is not None else None)
        # O(W) boundary combine + Planck inversion on host: a single
        # NumPy program, so RAD/Tb/TMR cannot pick up sharding-
        # dependent fusion wobble (models/rt.py)
        rad_h, tb_h, tmr_h = combine_boundary_np(
            wn, parts_h.rup, parts_h.rdn, parts_h.trtot,
            parts_h.radtmr, item["tsfc"], emis, refl, item["irt"],
            dtype=npdt)
        full_h = None
        if od_h is not None:
            full_h = ForwardResult(
                rt=RTResult(rad=rad_h, tb=tb_h, rup=parts_h.rup,
                            rdn=parts_h.rdn, trtot=parts_h.trtot,
                            tmr=tmr_h),
                od=od_h, emis=emis, refl=refl)
        for bi, i in enumerate(item["chunk"]):
            results[i] = ProfileOutput(
                tb=tb_h[bi], tmr=tmr_h[bi], rad=rad_h[bi],
                trtot=parts_h.trtot[bi], rup=parts_h.rup[bi],
                rdn=parts_h.rdn[bi], emis=emis, refl=refl,
                otot=red_h["otot"][bi],
                by_mol=red_h["by_mol"][bi],
                oc={k: v[bi] for k, v in red_h["oc"].items()},
                odx=(red_h["odx"][bi] if "odx" in red_h else None),
                od_layers=(odt_h[bi] if odt_h is not None else None),
                full=(_slice_result(full_h, bi)
                      if full_h is not None else None))

    def rt_fn_call(odt, t, tz):
        return jit_cache["rt"](odt, t, tz)

    # ---- software pipeline over chunks: the producer thread layers +
    # preps chunk N+1 while the device executes chunk N, and the
    # synchronous pull of chunk N happens only after chunk N+1 has been
    # dispatched (the device queue stays non-empty).  Multi-controller
    # runs stay strictly serial: every process must enqueue the same
    # device programs in the same order, and a producer thread could
    # reorder collectives across processes.
    with profile_trace(profile_dir):
        if nprocs > 1:
            for item in produce():
                finalize(dispatch(item))
        else:
            import queue as _queue
            import threading
            q: Any = _queue.Queue(maxsize=2)
            stop = threading.Event()

            def _put(x):
                """Bounded put that gives up if the consumer died."""
                while not stop.is_set():
                    try:
                        q.put(x, timeout=1.0)
                        return
                    except _queue.Full:
                        continue

            def feeder():
                try:
                    for it in produce():
                        _put(it)
                        if stop.is_set():
                            return
                    _put(("done", None))
                except BaseException as e:    # re-raised in the consumer
                    _put(("err", e))

            th = threading.Thread(target=feeder, daemon=True)
            th.start()
            try:
                pending = None
                while True:
                    nxt = q.get()
                    if isinstance(nxt, tuple):
                        if nxt[0] == "err":
                            raise nxt[1]
                        break
                    dev = dispatch(nxt)
                    if pending is not None:
                        finalize(pending)
                    pending = dev
                if pending is not None:
                    finalize(pending)
            finally:
                # unblock + retire the producer even when dispatch or
                # finalize raised (otherwise it would sit on a full
                # queue for the life of the process)
                stop.set()
                th.join(timeout=30.0)

    nprof = len(prepped)
    results = [results[i] for i in range(len(prepped))]

    # ---- write outputs in input order --------------------------------
    with writer:
        for i, (pr, res) in enumerate(zip(prepped, results)):
            npr = i + 1
            st, meta = pr["st"], pr["meta"]
            with timer.stage("output"):
                writer.write_profile(npr, wn, res, st, meta, pr["pwv"],
                                     pr["clw_col"], pr["tbound"],
                                     meta.angle)
            if cfg.iod == 1 and is_main:
                writer.write_layer_ods(npr, wn, res.od_layers, outdir)
            if netcdf and is_main:  # USENETCDF (monortm_sub.F90:698-778)
                from monortm_tpu.io.output import write_netcdf
                write_netcdf(Path(outdir) / f"MONORTM.{npr:05d}.nc", npr,
                             wn, res.full, st, meta, pr["pwv"],
                             pr["clw_col"], pr["tbound"], meta.angle)

            out.tb.append(np.asarray(res.tb))
            out.rad.append(np.asarray(res.rad))
            out.results.append(res)
            log.write(f"PROFILE {npr:5d}: NLAYRS={st.t.shape[-1]:4d} "
                      f"ANGLE={meta.angle:8.3f} IRT={pr['irt']} "
                      f"PWV={pr['pwv']:8.4f} CLW={pr['clw_col']:8.4f}\n")
            if is_main:
                print(f"PROCESSING PROFILE NUMBER: {npr:5d}")
    # version-stamp tail (monortm.f90:591-619, format 1000): same layout,
    # our module identities in the A15 fields
    try:
        from monortm_tpu.io.tape3 import read_tape3_header
        hvrspec = read_tape3_header(hfile)[:15]
    except Exception:
        hvrspec = "(no TAPE3 hdr)"
    from monortm_tpu import __version__ as _v
    a15 = lambda s: f"{s[:15]:<15s}"
    log.write("\n--------------------------------------\n")
    log.write("Modules and versions used in this calculation:\n\n")
    log.write(a15("Release  5.6") + "\n\n")
    log.write(f"     spectral file :     {a15(hvrspec)}\n")
    log.write(f"     monortm.f     :     {a15('pipeline ' + _v)}          "
              f"modm.f           :      {a15('models.od ' + _v)}\n")
    log.write(f"     monortm_sub.f :     {a15('io.output ' + _v)}          "
              f"lblatm_monortm.f :      {a15('atmos ' + _v)}\n")
    log.write(f" HOST PULL: {host_bytes[0]} bytes device->host "
              f"(per-layer arrays pulled: {keep_layers})\n")
    log.write(timer.report())
    log.close()
    return out
