"""ctypes bindings for the native host kernels (libmonortm_native.so).

Falls back silently to the pure-Python implementations when the library is
unavailable (set MONORTM_TPU_NATIVE=0 to force the fallback).  Build with
`make -C monortm_tpu/native`; the loader also attempts an on-demand build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB = None


class _RawLinesC(ctypes.Structure):
    _fields_ = [
        ("vnu", ctypes.c_void_p), ("sp", ctypes.c_void_p),
        ("alfa", ctypes.c_void_p), ("epp", ctypes.c_void_p),
        ("mol", ctypes.c_void_p), ("hwhm", ctypes.c_void_p),
        ("tmpalf", ctypes.c_void_p), ("pshift", ctypes.c_void_p),
        ("iflg", ctypes.c_void_p), ("speed_dep", ctypes.c_void_p),
        ("n", ctypes.c_int64),
    ]


class _ResolvedC(ctypes.Structure):
    _fields_ = [(name, ctypes.c_void_p) for name in (
        "mol", "nu0", "s0", "e", "alpf", "alps", "tdep", "pshift", "iso",
        "sdep", "xg", "a1", "b1", "a2", "b2", "self_mix")]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if os.environ.get("MONORTM_TPU_NATIVE", "1") == "0":
        _LIB = False
        return False
    so = _DIR / "libmonortm_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_DIR)], check=True,
                           capture_output=True)
        except Exception:
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _LIB = False
        return False
    lib.group_resolve_lines.restype = ctypes.c_int64
    lib.group_resolve_lines.argtypes = [ctypes.POINTER(_RawLinesC),
                                        ctypes.POINTER(_ResolvedC)]
    lib.alayer_integrate.restype = ctypes.c_double
    lib.alayer_integrate.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    try:
        lib.rfpath_integrate.restype = None
        lib.rfpath_integrate.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
    except AttributeError:     # stale .so without the symbol
        pass
    try:
        lib.amerge_walk.restype = ctypes.c_int64
        lib.amerge_walk.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
    except AttributeError:     # stale .so without the symbol
        pass
    _LIB = lib
    return lib


def available() -> bool:
    return bool(_load())


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def group_resolve_lines(raw):
    """Native GET_LNFL + LINES-walk; returns a ResolvedLines or None."""
    lib = _load()
    if not lib:
        return None
    from monortm_tpu.lines import ResolvedLines

    n = len(raw)
    c = lambda a, dt: np.ascontiguousarray(a, dtype=dt)
    vnu = c(raw.vnu, np.float64)
    sp = c(raw.sp, np.float32)
    alfa = c(raw.alfa, np.float32)
    epp = c(raw.epp, np.float32)
    mol = c(raw.mol, np.int32)
    hwhm = c(raw.hwhm, np.float32)
    tmpalf = c(raw.tmpalf, np.float32)
    pshift = c(raw.pshift, np.float32)
    iflg = c(raw.iflg, np.int32)
    sdep = c(raw.speed_dep, np.float32)

    rc = _RawLinesC(_ptr(vnu).value, _ptr(sp).value, _ptr(alfa).value,
                    _ptr(epp).value, _ptr(mol).value, _ptr(hwhm).value,
                    _ptr(tmpalf).value, _ptr(pshift).value,
                    _ptr(iflg).value, _ptr(sdep).value, n)

    o = {k: np.zeros(n, np.float64) for k in
         ("nu0", "s0", "e", "alpf", "alps", "tdep", "pshift", "sdep", "xg")}
    o["mol"] = np.zeros(n, np.int64)
    o["iso"] = np.zeros(n, np.int64)
    for k in ("a1", "b1", "a2", "b2"):
        o[k] = np.zeros((n, 4), np.float64)
    o["self_mix"] = np.zeros(n, np.uint8)

    res = _ResolvedC(*[_ptr(o[f]).value for f, _ in _ResolvedC._fields_])
    cnt = lib.group_resolve_lines(ctypes.byref(rc), ctypes.byref(res))
    if cnt < 0:
        raise ValueError("unrecognised line-coupling flag in TAPE3")
    cnt = int(cnt)
    return ResolvedLines(
        mol=o["mol"][:cnt], nu0=o["nu0"][:cnt], s0=o["s0"][:cnt],
        e=o["e"][:cnt], alpf=o["alpf"][:cnt], alps=o["alps"][:cnt],
        tdep=o["tdep"][:cnt], pshift=o["pshift"][:cnt],
        iso=o["iso"][:cnt], sdep=o["sdep"][:cnt], xg=o["xg"][:cnt],
        a1=o["a1"][:cnt], b1=o["b1"][:cnt], a2=o["a2"][:cnt],
        b2=o["b2"][:cnt], self_mix=o["self_mix"][:cnt].astype(bool),
        brd_flg=np.zeros((cnt, 7), np.int64),
        brd_hw=np.zeros((cnt, 7)), brd_tmp=np.zeros((cnt, 7)),
        brd_shft=np.zeros((cnt, 7)),
    )


def alayer_integrate(z1, z2, pa, pb, ta, tb, dena, denb, nmol, sinai,
                     cosai, cpath, sh, gamma, re, deltas, gcair, iamt,
                     sums, j):
    """Native ALAYER for one interval; updates sums in place.

    Returns (sinai, cosai, s, bend) or None when unavailable.
    """
    lib = _load()
    if not lib:
        return None
    sin_io = ctypes.c_double(sinai)
    cos_io = ctypes.c_double(cosai)
    bend = ctypes.c_double(0.0)
    pps = ctypes.c_double(sums["ppsum"][j])
    tps = ctypes.c_double(sums["tpsum"][j])
    rps = ctypes.c_double(sums["rhopsm"][j])
    amtp = np.ascontiguousarray(sums["amtp"][:nmol, j], np.float64)
    dena = np.ascontiguousarray(dena[:nmol], np.float64)
    denb = np.ascontiguousarray(denb[:nmol], np.float64)
    s = lib.alayer_integrate(
        z1, z2, pa, pb, ta, tb, _ptr(dena), _ptr(denb), nmol,
        ctypes.byref(sin_io), ctypes.byref(cos_io), cpath, sh, gamma, re,
        deltas, gcair, iamt,
        ctypes.byref(pps), ctypes.byref(tps), ctypes.byref(rps),
        _ptr(amtp), ctypes.byref(bend))
    sums["ppsum"][j] = pps.value
    sums["tpsum"][j] = tps.value
    sums["rhopsm"][j] = rps.value
    sums["amtp"][:nmol, j] = amtp
    return sin_io.value, cos_io.value, s, bend.value


def rfpath_integrate(zpth, pp, tp, rfndx, denp, nmol, sinai, cosai, cpath,
                     re, deltas, gcair, iamt, theta, len1, iphmid):
    """Native full-path RFPATH loop; returns (sums dict, scalars dict)
    or None when the library (or symbol) is unavailable.

    denp: [MXMOL, ipmax]; only the first nmol rows are integrated.
    """
    lib = _load()
    if not lib or not hasattr(lib, "rfpath_integrate"):
        return None
    zpth = np.ascontiguousarray(zpth, np.float64)
    pp = np.ascontiguousarray(pp, np.float64)
    tp = np.ascontiguousarray(tp, np.float64)
    rfndx = np.ascontiguousarray(rfndx, np.float64)
    ipmax = len(zpth)
    denp_t = np.ascontiguousarray(denp[:nmol, :ipmax].T, np.float64)
    ppsum = np.zeros(ipmax - 1)
    tpsum = np.zeros(ipmax - 1)
    rhopsm = np.zeros(ipmax - 1)
    sp = np.zeros(ipmax - 1)
    amtp_t = np.zeros((ipmax - 1, nmol))
    out = np.zeros(6)
    lib.rfpath_integrate(
        _ptr(zpth), _ptr(pp), _ptr(tp), _ptr(rfndx), _ptr(denp_t),
        nmol, ipmax, sinai, cosai, cpath, re, deltas, gcair, iamt,
        theta, len1, iphmid,
        _ptr(ppsum), _ptr(tpsum), _ptr(rhopsm), _ptr(amtp_t), _ptr(sp),
        _ptr(out))
    sums = {"ppsum": ppsum, "tpsum": tpsum, "rhopsm": rhopsm, "sp": sp}
    sums["amtp_nmol"] = amtp_t.T
    return sums, {"s": out[0], "beta": out[1], "bendng": out[2],
                  "phi_j": out[3], "sinai": out[4], "cosai": out[5]}


def amerge_walk(zmdl, pm, tm, rfndx, zout, hmin, hmid, tol):
    """Native AMERGE merge walk (lblatm.f90:5190-5285).

    Returns (zpth, pp, tp, rf, src_im, src_jm, src_a, iphmid, hmid) or
    None when the library (or symbol) is unavailable; raises ValueError
    when the profile does not extend up to hmin.  src_im[i] is the model
    level index of path point i, or -1 for interpolated points, whose
    (jm, a) are in src_jm/src_a — the caller gathers density columns
    from these, exactly like the Python walk.
    """
    lib = _load()
    if not lib or not hasattr(lib, "amerge_walk"):
        return None
    zmdl = np.ascontiguousarray(zmdl, np.float64)
    pm = np.ascontiguousarray(pm, np.float64)
    tm = np.ascontiguousarray(tm, np.float64)
    rfndx = np.ascontiguousarray(rfndx, np.float64)
    zout = np.ascontiguousarray(zout, np.float64)
    immax = len(zmdl)
    cap = immax + len(zout) + 2
    zpth = np.empty(cap)
    pp = np.empty(cap)
    tp = np.empty(cap)
    rf = np.empty(cap)
    src_im = np.empty(cap, np.int64)
    src_jm = np.empty(cap, np.int64)
    src_a = np.empty(cap)
    scal = np.array([0.0, hmid])
    n = lib.amerge_walk(
        _ptr(zmdl), _ptr(pm), _ptr(tm), _ptr(rfndx), immax,
        _ptr(zout), len(zout), hmin, tol,
        _ptr(zpth), _ptr(pp), _ptr(tp), _ptr(rf),
        _ptr(src_im), _ptr(src_jm), _ptr(src_a), _ptr(scal))
    if n == -2:
        # fail-loud parity with the Python fallback's IndexError when the
        # model grid exhausts below remaining zout points
        raise IndexError("AMERGE: model grid exhausted below path top")
    if n < 0:
        raise ValueError("AMERGE: profile does not extend up to HMIN")
    n = int(n)
    return (zpth[:n], pp[:n], tp[:n], rf[:n], src_im[:n], src_jm[:n],
            src_a[:n], int(scal[0]), scal[1])
