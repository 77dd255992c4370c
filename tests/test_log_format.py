"""MONORTM.LOG format parity vs the reference format statements.

Column-by-column checks of the LOG sections against monortm_sub.F90's
IFORM=1 formats (974/980/985/976, :1195-1207) and the version-stamp
tail (monortm.f90 format 1000, :611-617).  One documented deviation:
the molecules-8+ mixing-ratio block uses the per-layer dry-air density
(the reference divides by a stale WDRAIR, monortm_sub.F90:1160-1185).
"""

import re

import numpy as np
import pytest

from monortm_tpu.pipeline import _HMOLC8, _log_layer_table


class _Buf(list):
    def write(self, s):
        self.extend(s.split("\n")[:-1] if s.endswith("\n")
                    else s.split("\n"))


@pytest.fixture(scope="module")
def table():
    buf = _Buf()
    p = np.asarray([972.2109, 893.825])
    t = np.asarray([285.94, 281.40])
    wkl = np.zeros((2, 39))
    wkl[:, :9] = np.abs(np.linspace(1e22, 1e14, 18).reshape(2, 9))
    wbrodl = np.asarray([1.3375841e24, 1.2501701e24])
    _log_layer_table(buf, p, t, wkl, wbrodl, nmol=9)
    return list(buf)


def test_hmolc8_match_reference_data():
    # spot-check the hand-centred DATA strings (lblatm.f90:179-188)
    assert _HMOLC8[0] == "  H2O   "
    assert _HMOLC8[6] == "   O2   "
    assert _HMOLC8[11] == " HNO3   "
    assert _HMOLC8[34] == " ClONO2 "
    assert _HMOLC8[35] == "   NO+  "
    assert all(len(s) == 8 for s in _HMOLC8)


def test_format_974_header(table):
    # '0',53X,'MOLECULAR AMOUNTS (MOL/CM**2) BY LAYER '
    assert table[0] == ("0" + " " * 53
                        + "MOLECULAR AMOUNTS (MOL/CM**2) BY LAYER ")
    # 13X,'P(MB)',6X,'T(K)',5X,8(A10,5X)
    hdr = table[1]
    assert hdr[:13] == " " * 13
    assert hdr[13:18] == "P(MB)"
    assert hdr[24:28] == "T(K)"
    assert hdr[33:43] == "  " + _HMOLC8[0]          # A10 of CHARACTER*8
    assert hdr[48:58] == "  " + _HMOLC8[1]


def test_format_980_rows(table):
    # '0',I3,F15.7,F9.2,2X,1P,8E15.7
    row = table[2]
    assert row[0] == "0"
    assert row[1:4] == "  1"
    assert row[4:19] == f"{972.2109:15.7f}"
    assert row[19:28] == f"{285.94:9.2f}"
    assert row[28:30] == "  "
    vals = row[30:]
    assert len(vals) == 8 * 15
    for k in range(8):
        fld = vals[k * 15:(k + 1) * 15]
        assert re.fullmatch(r" [ -]\d\.\d{7}E[+-]\d\d", fld), fld


def test_format_985_total(table):
    # '0',54X,'ACCUMULATED MOLECULAR AMOUNTS FOR TOTAL PATH'
    ln = [x for x in table if "ACCUMULATED" in x][0]
    assert ln == ("0" + " " * 54
                  + "ACCUMULATED MOLECULAR AMOUNTS FOR TOTAL PATH")


def test_format_976_mixing_header(table):
    i = table.index("1" + " " * 54 + "-" * 34)
    assert table[i + 1] == "0" + " " * 60 + "MIXING RATIOS BY LAYER "
    hdr = table[i + 2]
    assert hdr[:10] == " " * 10
    assert hdr[10:15] == "P(MB)"
    assert hdr[21:25] == "T(K)"


def test_molecules_8plus_block(table):
    # nmol=9 -> a second 974 block for mols 8-9 after format 970 (////)
    hdrs = [i for i, x in enumerate(table)
            if "MOLECULAR AMOUNTS (MOL/CM**2)" in x]
    assert len(hdrs) == 2
    blk = table[hdrs[1] + 1]
    assert blk[33:43] == "  " + _HMOLC8[7]           # '   NO   '
    assert blk[48:58] == "  " + _HMOLC8[8]           # '  SO2   '
