#!/usr/bin/env python
"""Extract numeric DATA tables from the reference Fortran into .npz files.

This pulls *data* (continuum coefficient tables, TIPS partition-function
tables, isotope masses) out of /root/reference/src so the TPU framework can
load them as device constants.  No code is translated here — only numbers.

Outputs (monortm_tpu/data/tables/):
  mt_ckd.npz    continuum coefficient tables (contnm.f90 BLOCK DATA)
  tips.npz      TIPS 2003 partition-function tables (tips_2003.f90)
  isotopes.npz  isotope counts and masses (isotope.incl)

Run:  python tools/extract_tables.py [--ref /root/reference/src] [--out DIR]
"""

from __future__ import annotations

import argparse
import re
from pathlib import Path

import numpy as np

NUM_RE = re.compile(r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][-+]?\d+)?")


def _strip_comments(line: str) -> str:
    # These files never contain '!' inside meaningful numeric DATA payloads.
    i = line.find("!")
    return line if i < 0 else line[:i]


def join_statements(src: str) -> list[str]:
    """Join free-form Fortran continuation lines into whole statements."""
    out: list[str] = []
    buf = ""
    for raw in src.splitlines():
        line = _strip_comments(raw).rstrip()
        if not line.strip():
            continue
        seg = line.strip()
        if seg.startswith("&"):
            seg = seg[1:]
        if buf:
            buf += " " + seg
        else:
            buf = seg
        if buf.endswith("&"):
            buf = buf[:-1]
        else:
            out.append(buf)
            buf = ""
    if buf:
        out.append(buf)
    return out


def parse_value_list(text: str) -> list[float]:
    vals: list[float] = []
    for tok in text.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if "*" in tok:  # repeat count: e.g. 7*0.0
            cnt_s, val_s = tok.split("*", 1)
            try:
                cnt = int(cnt_s)
            except ValueError:
                continue  # symbolic repeat (e.g. MXZ50*0.0) — zero padding
            vals.extend([_tofloat(val_s)] * cnt)
        else:
            vals.append(_tofloat(tok))
    return vals


def _tofloat(tok: str) -> float:
    return float(tok.strip().replace("d", "e").replace("D", "E"))


def parse_data_statements(statements: list[str]) -> dict[str, list[float]]:
    """Collect DATA statements into {target_name: concatenated values}.

    Handles: DATA name/.../, DATA a,b,c,d/.../, DATA (X(I),I=a,b)/.../
    Multiple targets in one DATA (comma separated groups) are supported.
    """
    tables: dict[str, list[float]] = {}
    for st in statements:
        if not re.match(r"(?i)^\s*data\b", st):
            continue
        if "'" in st or '"' in st:
            continue  # character DATA (names, version strings) — not needed
        body = re.sub(r"(?i)^\s*data\b", "", st).strip()
        # split into spec/values/ groups at top level
        groups = re.findall(r"([^/]+)/([^/]*)/\s*,?", body)
        for spec, values in groups:
            spec = spec.strip().rstrip(",").strip()
            vals = parse_value_list(values)
            m = re.match(r"(?i)^\(\s*([a-z_]\w*)\s*\(", spec)
            if m:  # implied-do: (X(I),I=a,b) or (QofT( 1,J),J=1,119)
                name = m.group(1).lower()
            else:
                names = [s.strip().lower() for s in spec.split(",")]
                if len(names) > 1:
                    # scalar list: DATA V1,V2,DV,NPT / .../
                    for n, v in zip(names, vals):
                        tables[n] = [v]
                    continue
                name = re.match(r"(?i)^([a-z_]\w*)", names[0]).group(1).lower()
            tables.setdefault(name, []).extend(vals)
    return tables


def extract_block_data(src: str, name: str) -> dict[str, list[float]]:
    m = re.search(rf"(?ism)^[ \t]*BLOCK DATA\s+{name}\b(.*?)(?:end block data|\n[ \t]*END[ \t]*\n)",
                  src)
    if not m:
        raise KeyError(f"BLOCK DATA {name} not found")
    return parse_data_statements(join_statements(m.group(1)))


def common_member_order(src: str, name: str, common: str) -> list[str]:
    """Ordered member names of COMMON /common/ inside BLOCK DATA `name`."""
    m = re.search(rf"(?ism)^[ \t]*BLOCK DATA\s+{name}\b(.*?)end block data", src)
    stmts = join_statements(m.group(1))
    for st in stmts:
        cm = re.match(rf"(?i)^\s*COMMON\s*/\s*{common}\s*/\s*(.*)$", st)
        if cm:
            members = []
            for part in re.split(r",(?![^()]*\))", cm.group(1)):
                part = part.strip()
                if part:
                    members.append(re.match(r"(?i)^([a-z_]\w*)", part).group(1).lower())
            return members
    raise KeyError(f"COMMON /{common}/ not in BLOCK DATA {name}")


def flat_common_values(src: str, block: str, common: str,
                       skip_scalars: int = 4) -> tuple[list[float], list[float]]:
    """(grid scalars, concatenated array values) for one table common block."""
    tabs = extract_block_data(src, block)
    order = common_member_order(src, block, common)
    scalars = []
    values: list[float] = []
    for i, member in enumerate(order):
        if member not in tabs:
            raise KeyError(f"{block}: member {member} has no DATA")
        if i < skip_scalars:
            scalars.extend(tabs[member])
        else:
            values.extend(tabs[member])
    return scalars, values


def extract_contnm(ref: Path) -> dict[str, np.ndarray]:
    src = (ref / "contnm.f90").read_text(errors="replace")
    out: dict[str, np.ndarray] = {}

    def grab(key, block, common, shapes):
        scalars, values = flat_common_values(src, block, common)
        v1, v2, dv, npt = scalars[:4]
        total = int(sum(shapes))
        assert len(values) == total, (key, len(values), total)
        out[f"{key}_v1"] = np.float64(v1)
        out[f"{key}_v2"] = np.float64(v2)
        out[f"{key}_dv"] = np.float64(dv)
        out[f"{key}_npt"] = np.int64(npt)
        off = 0
        arrs = []
        for s in shapes:
            arrs.append(np.asarray(values[off:off + s], dtype=np.float64))
            off += s
        if len(arrs) == 1:
            out[key] = arrs[0]
        else:
            for j, a in enumerate(arrs):
                out[f"{key}_{j}"] = a

    grab("h2o_self_296", "BS296", "SH2O", [2003])
    grab("h2o_self_260", "BS260", "S260", [2003])
    grab("h2o_frgn_296", "BFH2O", "FH2O", [2003])
    grab("co2_frgn", "BFCO2", "FCO2", [5003])
    grab("n2_rt_296", "BN2T296", "N2RT296", [73, 73])     # c_296, sf_296
    grab("n2_rt_220", "BN2T220", "N2RT220", [73, 73])     # c_220, sf_220
    grab("n2_fund", "bn2f", "n2_f", [228, 228, 228])      # xn2_272, xn2_228, a_h2o
    grab("n2_overtone", "bn2f1", "n2_f1", [191])
    grab("o3_chap", "O3CH", "O3CHAP", [3150, 3150, 3150])  # x, y, z
    grab("o3_hh0", "BO3HH0", "O3HH0", [2687])
    grab("o3_hh1", "BO3HH1", "O3HH1", [2687])
    grab("o3_hh2", "BO3HH2", "O3HH2", [2687])
    grab("o3_huv", "BO3HUV", "O3HUV", [133])
    grab("o2_fund", "bo2f", "o2_f", [103, 103])            # xo2, xo2t
    grab("o2_inf1", "bo2inf1", "o2inf1_mate", [483])
    grab("o2_inf3", "bo2inf3", "o2inf3_aband", [261])
    grab("o2_vis", "bo2in_vis", "o2_o2_vis", [1474])
    grab("o2_fuv", "bo2in_fuv", "o2_fuv", [1512])

    # in-procedure DATA tables (CONTNM body + FRNCO2)
    stmts = join_statements(src)
    tabs = parse_data_statements(stmts)
    out["xfac_co2"] = np.asarray(tabs["xfacco2"], dtype=np.float64)
    assert out["xfac_co2"].shape == (500,)
    out["xfac_rhu"] = np.asarray(tabs["xfac_rhu"], dtype=np.float64)  # idx -1..61
    assert out["xfac_rhu"].shape == (63,)
    out["xfacrev"] = np.asarray(tabs["xfacrev"], dtype=np.float64)    # idx 0..14
    out["co2_tdep_bandhead"] = np.asarray(tabs["tdep_bandhead"], dtype=np.float64)
    assert out["co2_tdep_bandhead"].shape == (25,)  # table idx 1196..1220
    out["co2_t_eff"] = np.float64(tabs["t_eff"][0])
    return out


def extract_tips(ref: Path) -> dict[str, np.ndarray]:
    src = (ref / "tips_2003.f90").read_text(errors="replace")
    out: dict[str, np.ndarray] = {}
    stmts_all = join_statements(src)
    tdat = parse_data_statements(stmts_all)["tdat"]
    out["tdat"] = np.asarray(tdat, dtype=np.float64)
    assert out["tdat"].shape == (119,)

    # molecule name per HITRAN index handled in python; here only tables.
    subs = re.findall(
        r"(?is)Subroutine\s+(QT_\w+)\s*\((.*?)\n\s*end\b", src)
    for name, body in subs:
        stmts = join_statements(body)
        tabs = parse_data_statements(stmts)
        if "qoft" not in tabs:
            continue
        q = np.asarray(tabs["qoft"], dtype=np.float64)
        niso = q.size // 119
        assert q.size == niso * 119, name
        key = name.lower().replace("qt_", "")
        out[f"q_{key}"] = q.reshape(niso, 119)
        out[f"gj_{key}"] = np.asarray(tabs["xgj"], dtype=np.float64)
    return out


def extract_isotopes(ref: Path) -> dict[str, np.ndarray]:
    src = (ref / "isotope.incl").read_text(errors="replace")
    # fixed-form file: comments start with '!' mid-line; continuation via '&'
    stmts = join_statements(src)
    tabs = parse_data_statements(stmts)
    iso_max = np.asarray(tabs["iso_max"], dtype=np.int64)
    assert iso_max.shape == (39,)
    smass = np.zeros((39, 9), dtype=np.float64)
    vals = tabs["smass"]
    off = 0
    for m in range(39):
        n = iso_max[m]
        smass[m, :n] = vals[off:off + n]
        off += n
    assert off == len(vals), (off, len(vals))
    out = {"iso_max": iso_max, "smass": smass}
    out["iso_82"] = np.asarray(tabs["iso_82"], dtype=np.int64)
    return out


def extract_mlatm(ref: Path) -> dict[str, np.ndarray]:
    """Built-in model atmospheres + trace-gas profiles (lblatm.f90 BLOCK
    DATA MLATMB, :1809-2914) and the cross-section default profiles
    (BLOCK DATA XMLATM)."""
    src = (ref / "lblatm.f90").read_text(errors="replace")
    tabs = extract_block_data(src, "MLATMB")

    def a50(name):
        v = np.asarray(tabs[name][:50], dtype=np.float64)
        assert v.shape == (50,), (name, v.shape)
        return v

    out: dict[str, np.ndarray] = {"alt": a50("alt")}
    out["pmdl"] = np.stack([a50(f"p{m}") for m in range(1, 7)])
    out["tmdl"] = np.stack([a50(f"t{m}") for m in range(1, 7)])
    # amol[model, gas 1..8, level]; gas 8 is total air density
    out["amol"] = np.stack([
        np.stack([a50(f"amol{m}{k}") for k in range(1, 9)])
        for m in range(1, 7)])
    trac_names = ["ano", "so2", "ano2", "anh3", "hno3", "oh", "hf", "hcl",
                  "hbr", "hi", "clo", "ocs", "h2co", "hocl", "an2", "hcn",
                  "ch3cl", "h2o2", "c2h2", "c2h6", "ph3"]
    out["trac"] = np.stack([a50(n) for n in trac_names])

    # XMLATM: default cross-section molecule profiles (ppmv), members
    # amol1..amol38 on the altx grid (lblatm.f90:7082+)
    m = re.search(r"(?ism)^[ \t]*BLOCK DATA\s+XMLATM\b(.*?)\n[ \t]*END[ \t]*\n", src)
    if m:
        xt = parse_data_statements(join_statements(m.group(1)))
        nz = 50
        out["altx"] = np.asarray(xt["altx"][:nz], dtype=np.float64)
        amolx = [np.asarray(xt[f"amol{i}"][:nz], dtype=np.float64)
                 for i in range(1, 39) if f"amol{i}" in xt]
        out["amolx"] = np.stack(amolx)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference/src", type=Path)
    ap.add_argument("--out", default=Path(__file__).resolve().parent.parent
                    / "monortm_tpu" / "data" / "tables", type=Path)
    args = ap.parse_args()
    args.out.mkdir(parents=True, exist_ok=True)

    np.savez_compressed(args.out / "mt_ckd.npz", **extract_contnm(args.ref))
    np.savez_compressed(args.out / "tips.npz", **extract_tips(args.ref))
    np.savez_compressed(args.out / "isotopes.npz", **extract_isotopes(args.ref))
    np.savez_compressed(args.out / "mlatm.npz", **extract_mlatm(args.ref))
    for f in ("mt_ckd", "tips", "isotopes", "mlatm"):
        d = np.load(args.out / f"{f}.npz")
        print(f, len(d.files), "arrays")


if __name__ == "__main__":
    main()
