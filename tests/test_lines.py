"""Line engine end-to-end validation: synthetic TAPE3 -> read -> group ->
resolve -> pack -> device OD, vs the LINES transliteration oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from monortm_tpu.io.tape3 import RawLines, read_tape3, write_tape3
from monortm_tpu.lines import group, resolve, pack
from monortm_tpu.ops.lineshape import (LineConfig, catalog_to_device,
                                       line_od_block)
from monortm_tpu.ops.tips import tips_scor_numpy
from tests.reference_lines import lines_ref


def synthetic_raw(with_minus5: bool = True) -> RawLines:
    """A small but structurally rich line set:
    H2O lines (sdep, pshift, isotopes), O2 with -1 and -5 coupling
    (line+coeff rows), CO2 line, N2 line.

    with_minus5=False omits the -5 self+foreign coupled block.  The
    reference's LINES walk (modm.f90:339) reprocesses the first -5
    block's self row as a line whose "intensity" is a coupling
    coefficient (~1e-4, 21 orders too large), so any catalog whose
    first -5 block is reachable yields unphysical OD.  We replicate
    that walk bit-for-bit (parity tests keep the default), but
    end-to-end fixtures use the physical variant so Tb stays finite."""
    recs = []  # (vnu, sp, alfa, epp, mol_packed, hwhm, tmpalf, pshift, iflg, sdep)

    def line(vnu, sp, alfa, epp, mol, iso, hwhm, tmpalf, pshift, iflg=0,
             sdep=0.0):
        recs.append([vnu, sp, alfa, epp, mol + 100 * iso, hwhm, tmpalf,
                     pshift, iflg, sdep])

    def coeff(y200, y250, y296, y340, g200, g250, g296, g340, iflg):
        # coupling row: vnu=Y(200); alfa=Y(250); mol holds float bits Y(296);
        # tmpalf=Y(340); sp=G(200); epp=G(250); hwhm=G(296); pshift=G(340)
        mol_bits = int(np.float32(y296).view(np.int32))
        recs.append([y200, g200, y250, g250, mol_bits, g296, y340, g340,
                     iflg, 0.0])

    # H2O rotational-band-like lines near 0.74, 1.21, 2.5 cm^-1
    line(0.741721, 1.3e-27, 0.0782, 136.16, 1, 1, 0.43, 0.69, -0.01, sdep=0.1)
    line(1.205, 3.1e-28, 0.09, 300.4, 1, 2, 0.41, 0.64, 0.005)
    line(2.55, 2.0e-27, 0.085, 88.9, 1, 1, 0.44, 0.71, 0.0, sdep=0.05)
    # CO2 line
    line(3.3, 5.0e-29, 0.07, 50.0, 2, 1, 0.09, 0.7, 0.0)
    # O2 uncoupled line
    line(1.77, 8.0e-27, 0.047, 16.4, 7, 1, 0.046, 0.72, 0.0)
    # O2 line with -1 coupling (iflg=1 on the line, coeff row follows)
    line(1.9168, 6.5e-26, 0.0465, 2.1, 7, 1, 0.045, 0.73, 0.0, iflg=1)
    coeff(0.011, 0.008, 0.006, 0.004, -1e-4, -8e-5, -6e-5, -4e-5, -1)
    if with_minus5:
        # two O2 -5 coupled lines (line + foreign + self rows each);
        # the first exercises the reference's first-of-block quirk
        line(2.0027, 5.1e-26, 0.044, 4.2, 7, 1, 0.0435, 0.74, 0.0, iflg=5)
        coeff(0.009, 0.007, 0.0055, 0.0035, -9e-5, -7e-5, -5e-5, -3e-5, -5)
        coeff(0.012, 0.010, 0.0075, 0.0045,
              -9.5e-5, -7.5e-5, -5.5e-5, -3.5e-5, -5)
        line(2.0847, 4.9e-26, 0.0438, 6.9, 7, 1, 0.0432, 0.74, 0.0, iflg=5)
        coeff(0.008, 0.006, 0.005, 0.003, -8e-5, -6e-5, -4e-5, -2e-5, -5)
        coeff(0.011, 0.009, 0.007, 0.004, -9e-5, -7e-5, -5e-5, -2.5e-5, -5)
    else:
        # a second -1 coupled O2 line instead (realistic MW fast-TAPE3
        # shape: the 0-band uses foreign-only coupling)
        line(2.0027, 5.1e-26, 0.044, 4.2, 7, 1, 0.0435, 0.74, 0.0, iflg=1)
        coeff(0.009, 0.007, 0.0055, 0.0035, -9e-5, -7e-5, -5e-5, -3e-5, -1)
    # N2 line (tests the N2 width correction path)
    line(4.1, 1.0e-30, 0.05, 30.0, 22, 1, 0.048, 0.7, 0.0)
    # far line outside the 25 cm^-1 window of the test grid
    line(60.0, 9.0e-26, 0.08, 100.0, 1, 1, 0.4, 0.7, 0.0)

    a = np.asarray(recs, dtype=object)
    n = len(recs)
    return RawLines(
        vnu=np.asarray([r[0] for r in recs], np.float64),
        sp=np.asarray([r[1] for r in recs], np.float32),
        alfa=np.asarray([r[2] for r in recs], np.float32),
        epp=np.asarray([r[3] for r in recs], np.float32),
        mol=np.asarray([r[4] for r in recs], np.int32),
        hwhm=np.asarray([r[5] for r in recs], np.float32),
        tmpalf=np.asarray([r[6] for r in recs], np.float32),
        pshift=np.asarray([r[7] for r in recs], np.float32),
        iflg=np.asarray([r[8] for r in recs], np.int32),
        brd_mol_flg=np.zeros((n, 7), np.int32),
        brd_mol_hw=np.zeros((n, 7), np.float32),
        brd_mol_tmp=np.zeros((n, 7), np.float32),
        brd_mol_shft=np.zeros((n, 7), np.float32),
        speed_dep=np.asarray([r[9] for r in recs], np.float32),
    )


@pytest.fixture(scope="module")
def catalog(tmp_path_factory):
    raw = synthetic_raw()
    path = tmp_path_factory.mktemp("t3") / "TAPE3"
    write_tape3(path, raw)
    rd = read_tape3(path, 0.1, 10.0)
    return rd


def test_tape3_roundtrip(catalog):
    raw = synthetic_raw()
    assert len(catalog) == len(raw)
    np.testing.assert_allclose(catalog.vnu, raw.vnu)
    np.testing.assert_allclose(catalog.sp, raw.sp)
    np.testing.assert_array_equal(catalog.iflg, raw.iflg)
    np.testing.assert_array_equal(catalog.mol, raw.mol)


def test_grouping(catalog):
    g = group(catalog)
    # H2O: 4 lines (incl. the far one); O2: 4 lines + 5 coeff rows;
    # CO2: 1; N2: 1
    assert g.nblm[0] == 4
    assert g.nblm[6] == 9
    assert g.nblm[1] == 1
    assert g.nblm[21] == 1
    # O2 air-width correction applied to lines but not coeff rows
    o2_iflg_pos = catalog.iflg[np.abs(catalog.mol) % 100 == 0]  # unused


def test_resolve_walk(catalog):
    r = resolve(group(catalog))
    # Fortran J/JJ walk on [uncpl, -1line, -1row, lineA, forA, selfA,
    # lineB, forB, selfB]: lineA (first of a -5 block) consumes only forA
    # (XG(J-1) quirk); selfA is then reprocessed as a "line" consuming
    # lineB+forB as its coefficient rows; selfB likewise with
    # out-of-range (zero) rows.  Behavioural parity with modm.f90:324-354.
    o2 = r.mol == 7
    assert o2.sum() == 5
    xg_o2 = r.xg[o2]
    assert (xg_o2 == -1).sum() == 1
    assert (xg_o2 == -5).sum() == 3   # lineA, selfA-quirk, selfB-quirk
    assert r.self_mix[o2].sum() == 1  # only selfA mixes real rows


def test_device_od_matches_oracle(catalog):
    g = group(catalog)
    cat = pack(resolve(g), tile=8)
    dev = catalog_to_device(cat, jnp.float64)
    cfg = LineConfig()

    wn = np.asarray([0.5, 0.741721, 1.0, 1.9168, 2.1, 3.0, 8.5])
    layers = [
        (1013.0, 288.2),
        (550.0, 250.0),
        (120.0, 216.0),
    ]
    wk = np.zeros(39)
    wk[0] = 5.0e21
    wk[1] = 6.0e20
    wk[6] = 4.0e23
    wk[21] = 1.5e24
    wbrod = 2.0e22

    for p, t in layers:
        scor = tips_scor_numpy(t)
        got = np.asarray(line_od_block(
            dev, jnp.asarray(wn), None, jnp.float64(p), jnp.float64(t),
            jnp.asarray(wk), jnp.float64(wbrod),
            jnp.asarray(scor.reshape(-1)), cfg, n_mol=39,
            dtype=jnp.float64))
        assert got.shape == (len(wn), 39)
        for iw, w in enumerate(wn):
            want = lines_ref(g, w, t, p, wk, wbrod, scor)
            # rtol 2e-7: axon-TPU f64 emulation accuracy for exp/pow chains;
            # atol 1e-14: pedestal-subtraction cancellation noise floor on
            # optical depths (machine-level, physically negligible)
            np.testing.assert_allclose(
                got[iw], want, rtol=2e-7, atol=1e-14,
                err_msg=f"p={p} t={t} wn={w}")


def test_device_od_batched_layers(catalog):
    cat = pack(resolve(group(catalog)), tile=8)
    dev = catalog_to_device(cat, jnp.float64)
    wn = np.asarray([0.7, 2.0])
    wk = np.zeros(39)
    wk[0] = 5.0e21
    wk[6] = 4.0e23
    ps = jnp.asarray([1013.0, 500.0])
    ts = jnp.asarray([288.0, 240.0])
    wks = jnp.broadcast_to(jnp.asarray(wk), (2, 39))
    from monortm_tpu.ops.tips import tips_scor
    scor = tips_scor(ts, dtype=jnp.float64).reshape(2, -1)
    out = line_od_block(dev, jnp.asarray(wn), None, ps, ts, wks,
                        jnp.asarray([2.0e22, 1.0e22]), scor,
                        LineConfig(), n_mol=39, dtype=jnp.float64)
    assert out.shape == (2, 2, 39)


def test_device_od_ibrd_matches_oracle(tmp_path):
    """Species-specific broadening (IBRD=1): SBS halfwidth + shift."""
    raw = synthetic_raw()
    # give the first H2O line broadening data for H2O/CO2/O2 partners
    raw.brd_mol_flg[0, [0, 1, 6]] = 1
    raw.brd_mol_hw[0, [0, 1, 6]] = [0.45, 0.11, 0.05]
    raw.brd_mol_tmp[0, [0, 1, 6]] = [0.7, 0.6, 0.75]
    raw.brd_mol_shft[0, [0, 1, 6]] = [-0.012, 0.002, 0.001]
    path = tmp_path / "TAPE3"
    write_tape3(path, raw)
    rd = read_tape3(path, 0.1, 10.0)
    g = group(rd)
    cat = pack(resolve(g), tile=8)
    dev = catalog_to_device(cat, jnp.float64)
    cfg = LineConfig(ibrd=1)

    wn = np.asarray([0.6, 0.741721, 0.9])
    p, t = 950.0, 282.0
    wk = np.zeros(39)
    wk[0] = 5.0e21
    wk[1] = 6.0e20
    wk[6] = 4.0e23
    wbrod = 2.0e22
    from monortm_tpu.ops.tips import tips_scor_numpy
    from tests.reference_lines import lines_ref
    scor = tips_scor_numpy(t)
    got = np.asarray(line_od_block(
        dev, jnp.asarray(wn), None, jnp.float64(p), jnp.float64(t),
        jnp.asarray(wk), jnp.float64(wbrod), jnp.asarray(scor.reshape(-1)),
        cfg, n_mol=39, dtype=jnp.float64))
    for iw, w in enumerate(wn):
        want = lines_ref(g, w, t, p, wk, wbrod, scor, ibrd=1)
        np.testing.assert_allclose(got[iw], want, rtol=2e-7, atol=1e-15,
                                   err_msg=f"wn={w}")
    # and the H2O OD actually changes vs ibrd=0
    got0 = np.asarray(line_od_block(
        dev, jnp.asarray(wn), None, jnp.float64(p), jnp.float64(t),
        jnp.asarray(wk), jnp.float64(wbrod), jnp.asarray(scor.reshape(-1)),
        LineConfig(ibrd=0), n_mol=39, dtype=jnp.float64))
    assert not np.allclose(got[1, 0], got0[1, 0], rtol=1e-6)
