"""Compare the multibin radiation-field model between the reference
(radfield.out from a MULTIBIN_RADFIELD_MODEL_ON build; write_to_file,
radfield.cc:611-660) and artis_tpu (plasma/radfield.py fits, written
per timestep by the driver).

Both sides bin J/nuJ estimators in log-nu and fit per-bin (W, T_R)
dilute-Planck parameters, but with different bin counts/ranges, so the
contract is the bin-integrated mean intensity J re-binned onto common
log-nu bands per timestep, plus the fitted T_R compared
J-weighted over the overlap range.

Usage:
  python tools/compare_radfield.py refbuild/run/nebular300k_ext \
      refbuild/run/tpu_nebular300k_ext [--report out.json]
"""

import argparse
import json
import os
import sys

import numpy as np


def parse_ref(path):
    """reference radfield_0000.out: ts mgi bin nu_lower nu_upper nuJ J
    J_nu_avg ncontrib T_R W (bin -1 = fullspec fit row)."""
    rows = np.loadtxt(path, skiprows=1)
    out = {}
    for r in rows:
        ts, mgi, b = int(r[0]), int(r[1]), int(r[2])
        if b < 0:
            continue
        out.setdefault((ts, mgi), []).append(
            (r[3], r[4], r[6], r[9], r[10]))  # nu_lo, nu_hi, J, TR, W
    return {k: np.asarray(v) for k, v in out.items()}


def parse_tpu(path):
    """artis_tpu radfield.out: ts tdays mgi bin nu_lower nu_upper W
    T_R [J]."""
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            v = line.split()
            ts, mgi = int(v[0]), int(v[2])
            nu_lo, nu_hi = float(v[4]), float(v[5])
            W, TR = float(v[6]), float(v[7])
            J = float(v[8]) if len(v) > 8 else np.nan
            out.setdefault((ts, mgi), []).append(
                (nu_lo, nu_hi, J, TR, W))
    return {k: np.asarray(v) for k, v in out.items()}


def rebin_J(bins, band_edges):
    """Bin-integrated J -> common bands (proportional overlap)."""
    out = np.zeros(len(band_edges) - 1)
    for nu_lo, nu_hi, J, _, _ in bins:
        if not np.isfinite(J) or nu_hi <= nu_lo:
            continue
        lo = np.searchsorted(band_edges, nu_lo, "right") - 1
        hi = np.searchsorted(band_edges, nu_hi, "left")
        for b in range(max(lo, 0), min(hi, len(out))):
            o_lo = max(nu_lo, band_edges[b])
            o_hi = min(nu_hi, band_edges[b + 1])
            if o_hi > o_lo:
                out[b] += J * (o_hi - o_lo) / (nu_hi - nu_lo)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("tpu_dir")
    ap.add_argument("--report", default=None)
    ap.add_argument("--rtol-J", type=float, default=0.30)
    ap.add_argument("--rtol-TR", type=float, default=0.15)
    ap.add_argument("--nbands", type=int, default=12)
    args = ap.parse_args()

    ref = parse_ref(os.path.join(args.ref_dir, "radfield_0000.out"))
    tpu = parse_tpu(os.path.join(args.tpu_dir, "radfield.out"))
    common = sorted(set(ref) & set(tpu))
    if not common:
        print(f"no common (ts, cell) keys: ref {sorted(ref)[:5]} "
              f"tpu {sorted(tpu)[:5]}")
        sys.exit(2)

    relJ, relTR, rows = [], [], []
    for key in common:
        rb, tb = ref[key], tpu[key]
        # overlap frequency range covered by both models
        lo = max(rb[:, 0].min(), tb[:, 0].min())
        hi = min(rb[:, 1].max(), tb[:, 1].max())
        if hi <= lo:
            continue
        edges = np.geomspace(lo, hi, args.nbands + 1)
        Jr = rebin_J(rb, edges)
        Jt = rebin_J(tb, edges)
        ok = (Jr > 0.01 * Jr.max()) & (Jt > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.abs(Jt - Jr) / np.maximum(Jr, 1e-300)
        relJ.extend(rel[ok].tolist())
        # J-weighted mean fitted T_R over the overlap range
        def wmean_TR(bins):
            m = ((bins[:, 0] >= lo) & (bins[:, 1] <= hi)
                 & np.isfinite(bins[:, 2]) & (bins[:, 2] > 0)
                 & (bins[:, 3] > 0) & (bins[:, 3] < 2.4e5))
            if not m.any():
                return np.nan
            return float(np.average(bins[m, 3], weights=bins[m, 2]))
        tr_r, tr_t = wmean_TR(rb), wmean_TR(tb)
        if np.isfinite(tr_r) and np.isfinite(tr_t):
            relTR.append(abs(tr_t - tr_r) / tr_r)
        rows.append({"ts": key[0], "cell": key[1],
                     "J_tot_ref": float(Jr.sum()),
                     "J_tot_tpu": float(Jt.sum()),
                     "TR_wmean_ref": tr_r, "TR_wmean_tpu": tr_t})

    relJ = np.asarray(relJ)
    relTR = np.asarray(relTR)
    res = {
        "radfield.J_band": {
            "median_rel_err": float(np.median(relJ)),
            "p90_rel_err": float(np.percentile(relJ, 90)),
            "n": int(len(relJ)),
            "pass": bool(np.median(relJ) < args.rtol_J)},
        "radfield.T_R_wmean": {
            "median_rel_err": float(np.median(relTR)),
            "max_rel_err": float(relTR.max()),
            "n": int(len(relTR)),
            "pass": bool(np.median(relTR) < args.rtol_TR)},
        "rows": rows,
    }
    for name in ("radfield.J_band", "radfield.T_R_wmean"):
        r = res[name]
        print(f"[{'PASS' if r['pass'] else 'FAIL'}] {name:22s} "
              f"median={r['median_rel_err']:.4f} (n={r['n']})")
    ok = res["radfield.J_band"]["pass"] and \
        res["radfield.T_R_wmean"]["pass"]
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"pass": ok, "results": res}, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
