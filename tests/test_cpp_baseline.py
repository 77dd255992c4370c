"""Correctness of the C++ scalar baseline (tools/baseline/ref_scalar.cpp)
against the NumPy LINES oracle (tests/reference_lines.py).

The C++ program provides the *measured* single-core denominator for
bench.py's vs_baseline ratio; this test proves it computes the same
per-molecule ODs as the oracle (which is itself parity-tested against
the device engines), so the measured rate is a rate for the right
computation.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).parent.parent
BASE = ROOT / "tools" / "baseline"

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no g++")


@pytest.fixture(scope="module")
def binary(tmp_path_factory):
    d = tmp_path_factory.mktemp("cppbase")
    exe = d / "ref_scalar"
    subprocess.run(["g++", "-O3", "-std=c++17", "-o", str(exe),
                    str(BASE / "ref_scalar.cpp"), "-lm"], check=True)
    return exe


def test_cpp_matches_numpy_oracle(binary, tmp_path):
    sys.path.insert(0, str(BASE))
    import gen_input
    from tests.reference_lines import lines_ref

    g, wn, p, t, wk, wbrod, scor = gen_input.workload("--tiny")
    inp = tmp_path / "in.bin"
    out = tmp_path / "out.bin"
    gen_input.dump(str(inp), g, wn, p, t, wk, wbrod, scor)
    res = subprocess.run([str(binary), str(inp), str(out)], check=True,
                         capture_output=True, text=True)
    assert '"evals_per_s"' in res.stdout

    nlay, nwn = len(p), len(wn)
    got = np.fromfile(out, np.float64).reshape(nlay, nwn, 39)
    for k in range(nlay):
        sc = scor[k].reshape(39, 9)
        for iw in range(nwn):
            want = lines_ref(g, float(wn[iw]), float(t[k]), float(p[k]),
                             wk[k], float(wbrod[k]), sc)
            np.testing.assert_allclose(got[k, iw], want, rtol=1e-12,
                                       atol=1e-300,
                                       err_msg=f"layer {k} wn {wn[iw]}")
