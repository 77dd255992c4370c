"""Cross-validation of the frozen goldens: the production f64 pipeline
vs the INDEPENDENT end-to-end NumPy reference (tests/reference_e2e.py).

The 7 golden files are frozen outputs of this framework's own f64 path
(true Fortran ground truth is unobtainable in this image — broken TAPE3
symlink, no Fortran compiler).  This test breaks that self-referential
loop for ALL SEVEN example cases (model atmosphere, upwelling IRT=1,
radiosonde layering, IATM=0 layer input, liquid cloud, PWV profile
scaling, SD-Voigt slant lidar): an independently-composed chain of the transliteration
oracles — LINES, MT_CKD, TIPS, TKC cloud, RAD_UP_DN/RTM/CALCTMR, the
record grammars — must reproduce the pipeline's Tb/TMR/RAD/TRANS/OD
columns to f64 tightness.  A consistent cross-component convention bug
(e.g. at the LINES -> RFT -> RTM hand-off, monortm.f90:557-573) would
fail here while passing every per-component oracle test.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

GOLD = Path(__file__).parent / "goldens"
REF_IN = Path("/root/reference/run/in")

# f64-vs-f64 budgets: the two chains follow the same arithmetic but not
# the same evaluation order (vectorized engine vs Fortran-walk loops);
# measured agreement is machine-roundoff level (|dTb| ~ 1e-13 K,
# relative OD ~ 1e-14 on case 4) — budgets leave two decades of
# headroom for longer chains / other CPU codegen, and any conventional
# hand-off bug (a misplaced RFT, a transposed layer axis, a wrong
# species attribution) is many orders above them.
TB_ATOL = 1e-9            # K
RTOL = 1e-10


def _run_production(tmp_path, filein, prof):
    import jax.numpy as jnp
    from monortm_tpu.pipeline import run

    shutil.copy(REF_IN / filein, tmp_path / "MONORTM.IN")
    if prof:
        shutil.copy(REF_IN / prof, tmp_path / "MONORTM_PROF.IN")
    return run(filein=tmp_path / "MONORTM.IN",
               fileprof=tmp_path / "MONORTM_PROF.IN",
               hfile=GOLD / "TAPE3_synthetic", fileout="MONORTM.OUT",
               outdir=tmp_path, dtype=jnp.float64)


def _reference_chain(filein, profin=None, layering_prof=None,
                     wn_idx=None):
    from monortm_tpu.io.tape3 import read_tape3
    from monortm_tpu.lines import group
    from tests.reference_e2e import (parse_profin, parse_tape5_min,
                                     reference_profile)

    cfg = parse_tape5_min(REF_IN / filein)
    wn = cfg["wn"]
    g = group(read_tape3(GOLD / "TAPE3_synthetic", float(wn[0]),
                         float(wn[-1])))
    if layering_prof is not None:
        profs = [layering_prof]
    else:
        profs = parse_profin(REF_IN / profin)
    return cfg, [reference_profile(g, wn, cfg["dvset"], p, cfg["tbound"],
                                   cfg["bndemi"], cfg["bndrfl"],
                                   wn_idx=wn_idx,
                                   nmol_scal=cfg["nmol_scal"],
                                   hmol_scal=cfg["hmol_scal"],
                                   xmol_scal=cfg["xmol_scal"])
                 for p in profs]


def _compare(res, ref, idx, nmol):
    """Production ProfileOutput vs independent-chain dict at wn[idx]."""
    sel = np.asarray(idx)
    np.testing.assert_allclose(np.asarray(res.tb)[sel], ref["tb"],
                               atol=TB_ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(res.tmr)[sel], ref["tmr"],
                               atol=TB_ATOL, rtol=0)
    np.testing.assert_allclose(np.asarray(res.rad)[sel], ref["rad"],
                               rtol=RTOL)
    np.testing.assert_allclose(np.asarray(res.trtot)[sel], ref["trtot"],
                               rtol=RTOL, atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.otot)[sel], ref["otot"],
                               rtol=RTOL, atol=1e-14)
    # per-molecule line OD columns + continuum attribution
    bm = np.asarray(res.by_mol)[sel]                     # [w, M]
    for im in range(min(nmol, bm.shape[1])):
        np.testing.assert_allclose(bm[:, im], ref["by_mol"][:, im],
                                   rtol=RTOL, atol=1e-14,
                                   err_msg=f"molecule {im + 1}")
    for sp in ("h2o", "co2", "o2", "n2", "rayleigh"):
        np.testing.assert_allclose(np.asarray(res.oc[sp])[sel],
                                   ref["oc_mol"][sp], rtol=RTOL,
                                   atol=1e-14, err_msg=sp)


@pytest.mark.parametrize("case,filein,profin", [
    (4, "MONORTM.IN_IATM0_dn", "MONORTM_PROF.IN_sav"),
    (5, "MONORTM.IN_IATM0_dn", "MONORTM_PROF.IN_liquid_cloud"),
])
def test_independent_chain_iatm0(case, filein, profin, tmp_path):
    out = _run_production(tmp_path, filein, profin)
    cfg, refs = _reference_chain(filein, profin=profin)
    assert len(out.results) == len(refs)
    idx = np.arange(len(cfg["wn"]))
    for res, ref in zip(out.results, refs):
        _compare(res, ref, idx, nmol=22)
    if case == 5:
        # the cloud layer actually contributes (non-vacuous TKC check)
        assert refs[0]["clw_col"] > 0


def test_independent_chain_iatm1_case1(tmp_path):
    """Case 1: model-atmosphere layering (independently oracled vs the
    _sav reference file and the TAPE7 round trip) feeds the chain; all
    physics downstream of layering is recomputed independently.  A
    wavenumber subset keeps the loop oracle affordable; every subset
    point runs the full chain."""
    filein = "MONORTM.IN_MDL_ATM_dn"
    out = _run_production(tmp_path, filein, None)

    from monortm_tpu.atmos.tape5_atm import profiles_from_tape5
    from monortm_tpu.io.tape5 import Tape5Reader
    rd = Tape5Reader(tmp_path / "MONORTM.IN")
    cfg5 = rd.read_block()
    profs = profiles_from_tape5(tmp_path / "MONORTM.IN", cfg5)
    st, meta = profs[0].state, profs[0].meta
    lay = dict(p=np.asarray(st.p), t=np.asarray(st.t),
               tz=np.asarray(st.tz), clw=np.asarray(st.clw),
               wkl=np.asarray(st.wkl)[:, :meta.nmol],
               wbrodl=np.asarray(st.wbrodl), nmol=meta.nmol,
               angle=meta.angle, irt=3)

    idx = [0, 17, 34, 50, 67, 83, 100]
    cfg, refs = _reference_chain(filein, layering_prof=lay, wn_idx=idx)
    _compare(out.results[0], refs[0], idx, nmol=meta.nmol)


@pytest.mark.parametrize("case,filein", [
    # case 2: upwelling — exercises the IRT=1 surface emission/
    # reflection combine hand-off (RTMmono.f90:138-139)
    (2, "MONORTM.IN_MDL_ATM_up"),
    # case 3: user radiosonde (MODEL=0) through the layering stack
    (3, "MONORTM.IN_NOSCALE_IATM1_dn"),
    # case 6: H2O PWV profile scaling (profil_scal_sub,
    # monortm_sub.F90:937) applied independently before the physics
    (6, "MONORTM.IN_SCALE_IATM1_MODEL0_HMOL1_dn"),
    # case 7: 6365 cm^-1 slant lidar — exercises the SD-Voigt regime,
    # the f64 line-centre arithmetic the two-float splits must match,
    # and the refracted-path layering output
    (7, "MONORTM.IN_IATM1_lidar_up"),
])
def test_independent_chain_iatm1_more(case, filein, tmp_path):
    out = _run_production(tmp_path, filein, None)

    from monortm_tpu.atmos.tape5_atm import profiles_from_tape5
    from monortm_tpu.io.tape5 import Tape5Reader
    rd = Tape5Reader(tmp_path / "MONORTM.IN")
    cfg5 = rd.read_block()
    profs = profiles_from_tape5(tmp_path / "MONORTM.IN", cfg5)
    st, meta = profs[0].state, profs[0].meta
    irt = 1 if meta.angle > 90.0 else (2 if meta.angle == 90.0 else 3)
    lay = dict(p=np.asarray(st.p), t=np.asarray(st.t),
               tz=np.asarray(st.tz), clw=np.asarray(st.clw),
               wkl=np.asarray(st.wkl)[:, :meta.nmol],
               wbrodl=np.asarray(st.wbrodl), nmol=meta.nmol,
               angle=meta.angle, irt=irt)

    cfg, refs = _reference_chain(filein, layering_prof=lay)
    idx = np.arange(len(cfg["wn"]))
    _compare(out.results[0], refs[0], idx, nmol=meta.nmol)
    if case == 7:
        assert refs[0]["otot"].max() > 0    # non-vacuous
