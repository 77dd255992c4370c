"""End-to-end pipeline test: case-4-style run (IATM=0, explicit wavenumber
list) against a synthetic TAPE3, validating the whole chain
parser -> catalog -> OD -> RT -> writer against an all-NumPy recomputation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monortm_tpu import constants as cst
from monortm_tpu.io.tape3 import write_tape3
from monortm_tpu.io.tape5 import Tape5Reader, count_profiles
from monortm_tpu.io.profin import read_profiles
from tests.test_lines import synthetic_raw

TAPE5 = """\
* comment header
$ Rundeck test
    1         1    0    1    0         0    0    0    0    0         0
-0.200E+00 8.800E+00 0.000E+00 0.100E-00 0.000E+00 0.000E+00 0.000E+00 0.000E+00    0      0.000E+00    0
4
0.789344
0.79828
1.043027
1.051763
     0.    1.0       0.000E+00 0.000E+00 0.000E+00 0.000E+00 0.000E+00
%%%%
"""

# two layers, NMOL=7, IFORM=1, downwelling (angle 0)
PROF = """\
 1  2    7  1.000000TEST    ATM          0.00        20.00         0.000      0
  9.7221090E+02    285.94              3   0.000 1013.00 288.20  0.700  931.64 283.65  0.030
  1.2207059E+22  5.6517653E+20  4.7120675E+16  5.4804989E+17  2.5390745E+17  2.9115142E+18  3.5794498E+23  1.3375841E+24
  8.9382500E+02    281.40              3                         1.400 855.746 279.10  0.000
  9.5935612E+21  5.2824106E+20  4.7150147E+16  5.1223340E+17  2.3170005E+17  2.7212402E+18  3.3455267E+23  1.2501701E+24
"""


@pytest.fixture(scope="module")
def rundir(tmp_path_factory):
    d = tmp_path_factory.mktemp("run")
    (d / "MONORTM.IN").write_text(TAPE5)
    (d / "MONORTM_PROF.IN").write_text(PROF)
    # physical variant: the -5 first-of-block quirk (tested for parity in
    # test_lines) yields unphysical OD -> nan Tb, useless end-to-end
    write_tape3(d / "TAPE3", synthetic_raw(with_minus5=False))
    return d


def test_tape5_parse(rundir):
    iatm, ixsect, nprof = count_profiles(rundir / "MONORTM.IN",
                                         rundir / "MONORTM_PROF.IN")
    assert iatm == 0 and ixsect == 0 and nprof == 1
    cfg = Tape5Reader(rundir / "MONORTM.IN").read_block()
    assert cfg.icntnm == 1 and cfg.iatm == 0
    np.testing.assert_allclose(cfg.wn,
                               [0.789344, 0.79828, 1.043027, 1.051763])
    assert cfg.dvset == 0.0
    assert cfg.tbound == 0.0
    assert cfg.bndemi[0] == 1.0 and cfg.bndrfl[0] == 0.0


def test_profin_parse(rundir):
    profs = read_profiles(rundir / "MONORTM_PROF.IN")
    assert len(profs) == 1
    st = profs[0].state
    assert st.t.shape == (2,)
    np.testing.assert_allclose(st.p, [972.2109, 893.825])
    np.testing.assert_allclose(st.t, [285.94, 281.40])
    np.testing.assert_allclose(st.tz, [288.20, 283.65, 279.10])
    np.testing.assert_allclose(st.clw, [0.030, 0.0])
    np.testing.assert_allclose(st.wkl[0, 0], 1.2207059e22)
    np.testing.assert_allclose(st.wkl[1, 6], 3.3455267e23)
    np.testing.assert_allclose(st.wbrodl, [1.3375841e24, 1.2501701e24])
    assert profs[0].meta.nmol == 7
    assert profs[0].meta.irt == 3


def test_full_run_matches_numpy(rundir):
    from monortm_tpu.pipeline import run
    res = run(filein=rundir / "MONORTM.IN",
              fileprof=rundir / "MONORTM_PROF.IN",
              hfile=rundir / "TAPE3", fileout="MONORTM.OUT",
              outdir=rundir, dtype=jnp.float64, wn_tile=4, line_tile=8)
    assert len(res.tb) == 1
    tb = res.tb[0]
    assert tb.shape == (4,)

    # independent recomputation: oracle line engine + transliterated
    # continuum + TKC cloud + reference RT loops
    from monortm_tpu.io.tape3 import read_tape3
    from monortm_tpu.lines import group
    from monortm_tpu.ops.tips import tips_scor_numpy
    from tests.reference_lines import lines_ref
    from tests.reference_continuum import continuum_ref
    from tests.test_rt import reference_rad_up_dn, bb
    from monortm_tpu.ops.cloud import od_clw

    profs = read_profiles(rundir / "MONORTM_PROF.IN")
    st = profs[0].state
    wn = res.wn
    g = group(read_tape3(rundir / "TAPE3", wn[0], wn[-1]))
    nlay = 2
    od = np.zeros((4, nlay))
    for il in range(nlay):
        scor = tips_scor_numpy(st.t[il])
        cont = continuum_ref(wn, 0.0, st.p[il], st.t[il], st.wkl[il],
                             st.wbrodl[il], 7)
        for iw, w in enumerate(wn):
            ol = lines_ref(g, w, st.t[il], st.p[il], st.wkl[il],
                           st.wbrodl[il], scor)
            od[iw, il] = ol.sum()
        od[:, il] += (cont["h2o"] + cont["co2"] + cont["o2"] + cont["n2"]
                      + cont["rayleigh"])
        od[:, il] += np.asarray(od_clw(jnp.asarray(wn),
                                       float(st.t[il]), float(st.clw[il])))

    rup, rdn, trtot = reference_rad_up_dn(od, st.t, st.tz, wn)
    rad_ref = rdn + trtot * bb(wn, cst.TSKY)
    tb_ref = cst.RADCN2 * wn / np.log(cst.RADCN1 * wn**3 / rad_ref + 1.0)

    assert np.isfinite(tb).all(), tb   # equal_nan must not mask a nan Tb
    np.testing.assert_allclose(tb, tb_ref, rtol=2e-6, atol=1e-4)

    # output file exists and has the expected structure
    out = (rundir / "MONORTM.OUT").read_text().splitlines()
    assert out[0] == "MONORTM RESULTS:"
    assert out[2].startswith("NWN :       4")
    row = out[4].split()
    assert int(row[0]) == 1
    # GHz column
    np.testing.assert_allclose(float(row[1]),
                               wn[0] * cst.CLIGHT / 1e9, rtol=1e-4)
    np.testing.assert_allclose(float(row[2]), tb[0], rtol=1e-4)


def test_ipunch_writes_tape7(tmp_path):
    from pathlib import Path
    """IPUNCH=1 on record 3.1 produces a TAPE7 usable as MONORTM_PROF.IN
    (lblatm.f90:1264-1340; README.md:52 checkpoint round-trip)."""
    import shutil
    import jax.numpy as jnp
    from monortm_tpu.io.profin import read_profiles
    from monortm_tpu.pipeline import run

    src = Path("/root/reference/run/in/MONORTM.IN_MDL_ATM_dn").read_text()
    lines = src.splitlines()
    # find record 3.1 (first record after 1.4 in the $ block) and set
    # IPUNCH (cols 31-35)
    for i, ln in enumerate(lines):
        f = ln.split()
        if len(f) >= 7 and f[0] in "0123456" and ln[:5].strip().isdigit():
            r = ln.ljust(40)
            lines[i] = r[:30] + "    1" + r[35:]
            break
    (tmp_path / "MONORTM.IN").write_text("\n".join(lines) + "\n")
    run(filein=tmp_path / "MONORTM.IN",
        hfile=Path(__file__).parent / "goldens" / "TAPE3_synthetic",
        outdir=tmp_path, dtype=jnp.float64)
    t7 = tmp_path / "TAPE7"
    assert t7.exists()
    profs = read_profiles(t7)
    assert len(profs) == 1
    assert profs[0].state.p.shape[0] > 5


def test_streamed_chunked_run_matches_monolithic(tmp_path, monkeypatch):
    """The streaming producer/consumer path with FORCED small chunks
    (multiple in-flight work items, deferred pulls, buffers flushing
    partial batches) writes the same MONORTM.OUT as a single-chunk run
    of the same stacked IATM=1 input."""
    import shutil
    from pathlib import Path
    import monortm_tpu.pipeline as pl
    from monortm_tpu.pipeline import run

    src = Path("/root/reference/run/in/MONORTM.IN_NOSCALE_IATM1_dn")
    text = src.read_text()
    block = text[text.index("$"):text.index("%")]
    (tmp_path / "MONORTM.IN").write_text(block * 5 + "%")
    shutil.copy(Path(__file__).parent / "goldens" / "TAPE3_synthetic",
                tmp_path / "TAPE3")

    (tmp_path / "one").mkdir()
    run(filein=tmp_path / "MONORTM.IN", hfile=tmp_path / "TAPE3",
        outdir=tmp_path / "one", mesh=None)

    monkeypatch.setattr(pl, "_max_batch", lambda *a, **k: 2)
    (tmp_path / "chunked").mkdir()
    res = run(filein=tmp_path / "MONORTM.IN", hfile=tmp_path / "TAPE3",
              outdir=tmp_path / "chunked", mesh=None)
    assert len(res.tb) == 5
    assert (tmp_path / "one" / "MONORTM.OUT").read_bytes() == \
        (tmp_path / "chunked" / "MONORTM.OUT").read_bytes()
