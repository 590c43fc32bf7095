#!/usr/bin/env python
"""Compare an artis_tpu run against a reference ARTIS run on the same
inputs: per-cell grid state (TR/Te/W/nne) per timestep, the deposition
curve, and the bolometric light curve.

Reference output formats parsed here:
  estimators_0000.out   update_grid.cc:51-56 header rows
  deposition.out        sn3d.cc:86-188 (column names in header line)
  light_curve.out       light_curve.cc:14-32 (tmid_d, lum_Lsun, lum_cmf)
  spec.out              spectrum.cc:144-212 (first row = tmid days,
                        then nu rows: nu, Fnu per time column)

artis_tpu output formats: the same (estimators/light_curve/spec are
written in the reference layout), plus deposition.json.

Usage:
  python tools/compare_reference.py REF_DIR TPU_DIR [--report OUT.json]

Exit code 0 iff every comparison passes its tolerance.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

LSUN = 3.826e33


# ---------------------------------------------------------------------------
# parsers
# ---------------------------------------------------------------------------

_EST_RE = re.compile(
    r"timestep (\d+) modelgridindex (\d+) titeration \d+ "
    r"TR ([\d.eE+-]+) Te ([\d.eE+-]+) W ([\d.eE+-]+) TJ ([\d.eE+-]+) "
    r"grey_depth ([\d.eE+-]+) thick (\d+) nne ([\d.eE+-]+)")


def parse_estimators(path: str) -> dict[str, np.ndarray]:
    """-> dict of [nts, ncells] arrays TR/Te/W/TJ/grey_depth/thick/nne.
    Cells re-run after a job-step resume keep the last value written."""
    rows: dict[tuple[int, int], tuple] = {}
    ncells = 0
    nts = 0
    with open(path) as f:
        for line in f:
            m = _EST_RE.match(line)
            if not m:
                continue
            ts, mgi = int(m.group(1)), int(m.group(2))
            rows[(ts, mgi)] = tuple(float(m.group(k)) for k in range(3, 10))
            ncells = max(ncells, mgi + 1)
            nts = max(nts, ts + 1)
    out = {k: np.full((nts, ncells), np.nan) for k in
           ("TR", "Te", "W", "TJ", "grey_depth", "thick", "nne")}
    for (ts, mgi), v in rows.items():
        for i, k in enumerate(("TR", "Te", "W", "TJ", "grey_depth",
                               "thick", "nne")):
            out[k][ts, mgi] = v[i]
    return out


def parse_deposition(path: str) -> dict[str, np.ndarray]:
    """Reference deposition.out -> {tmid_days, total_dep, gamma_dep}
    [Lsun]."""
    with open(path) as f:
        header = f.read(4096).splitlines()[0]
    cols = header.lstrip("#").split()
    data = np.loadtxt(path, skiprows=1, ndmin=2)
    get = lambda name: data[:, cols.index(name)]
    return {
        "tmid_days": get("tmid_days"),
        "total_dep": get("total_dep_Lsun"),
        "gamma_dep": get("gammadep_Lsun"),
        # the reference's alternative path-integral gamma-deposition
        # estimator (gammadeppathint, deposition.out col 6): the two
        # reference estimates differ by ~40% at CI packet counts, so
        # the contract accepts agreement with either
        "gamma_dep_alt": (get("gammadeppathint_Lsun")
                          if "gammadeppathint_Lsun" in cols
                          else get("gammadep_Lsun")),
    }


def parse_deposition_tpu(path: str) -> dict[str, np.ndarray]:
    """artis_tpu deposition.json -> same keys as parse_deposition."""
    with open(path) as f:
        log = json.load(f)
    return {
        "tmid_days": np.array([d["tmid_days"] for d in log]),
        "total_dep": np.array([d["gamma_dep_Lsun"]
                               + d["positron_dep_Lsun"]
                               + d["electron_dep_Lsun"]
                               + d["alpha_dep_Lsun"] for d in log]),
        "gamma_dep": np.array([d["gamma_dep_Lsun"] for d in log]),
    }


def parse_light_curve(path: str) -> dict[str, np.ndarray]:
    """First block only: the file repeats the time grid with a second
    gamma-deposition block (light_curve.cc:23-29)."""
    data = np.loadtxt(path, ndmin=2)
    t = data[:, 0]
    n = len(t)
    for i in range(1, len(t)):
        if t[i] < t[i - 1]:  # time restarts -> second block
            n = i
            break
    return {"tmid_days": data[:n, 0], "lum_Lsun": data[:n, 1]}


def parse_spec(path: str) -> dict[str, np.ndarray]:
    """spec.out: row 0 = '0 tmid...' times, then rows nu F(nu, t)."""
    data = np.loadtxt(path, ndmin=2)
    return {"tmid_days": data[0, 1:], "nu": data[1:, 0],
            "Fnu": data[1:, 1:]}


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

def _finite_mask(*arrays):
    m = np.isfinite(arrays[0])
    for a in arrays[1:]:
        m &= np.isfinite(a)
    return m


def compare_fields(ref: dict, tpu: dict, results: list,
                   rtol_T: float = 0.10, first_ts: int = 2):
    """Per-(ts, cell) relative agreement of TR/Te (MC-noise limited:
    both runs carry ~15k-packet sampling noise, so the tolerance is a
    statistical bound on the *median* relative error, plus a looser
    max-error guard)."""
    nts = min(ref["TR"].shape[0], tpu["TR"].shape[0])
    nc = min(ref["TR"].shape[1], tpu["TR"].shape[1])
    # cells where the reference solver sits at its own MINTEMP/MAXTEMP
    # bounds carry no solution information (the classic-mode synthetic-
    # dataset runs clamp ~20% of entries); when clamping is pervasive
    # the p90 guard applies to the unclamped subset and the clamped
    # share is reported
    Tlo = np.nanmin(ref["Te"])
    Thi = np.nanmax(ref["Te"])
    # estimator-starved rows: a fitted T_R pinned at the MINTEMP
    # floor on either side means that cell saw essentially no packet
    # flux that timestep — the other side's T_R is then the colour of
    # a HANDFUL of photons (nubar is scale-invariant, so one UV
    # photon sets T_R with W ~ 1e-5; get_T_R clamping,
    # radfield.cc:1070-1135) — not a measurable contract. Skipped
    # from the T_R rows; the deposition/light-curve/spectrum
    # contracts still cover the energetics of those timesteps.
    nts_s = min(ref["TR"].shape[0], tpu["TR"].shape[0])
    starved = np.zeros((nts_s, nc), bool)
    for side in (ref, tpu):
        TRs = side["TR"][:nts_s, :nc]
        lo = np.nanmin(TRs)
        at_lo = np.abs(TRs - lo) < 1.0
        # only a clamp PLATEAU counts (>= 3 rows pinned at the same
        # minimum); a unique smallest fitted value is a legitimate
        # solution, not starvation
        if at_lo.sum() >= 3:
            starved |= at_lo
    for key, rtol in (("TR", rtol_T), ("Te", rtol_T)):
        a = ref[key][first_ts:nts, :nc]
        b = tpu[key][first_ts:nts, :nc]
        m = _finite_mask(a, b) & (a > 0) & (b > 0)
        if key == "TR" and starved.shape[0] >= nts:
            m &= ~starved[first_ts:nts, :nc]
        rel = np.abs(b[m] - a[m]) / a[m]
        ref_clamped = (np.abs(a - Tlo) < 1.0) | (a > 0.95 * Thi)
        mu = m & ~ref_clamped
        clamp_frac = 1.0 - mu.sum() / max(m.sum(), 1)
        relu = (np.abs(b[mu] - a[mu]) / a[mu]) if mu.any() else rel
        # the unclamped-subset guard needs enough entries to be a
        # percentile statement
        p90_guard = (np.percentile(relu, 90) < 3 * rtol
                     if (clamp_frac > 0.05 and mu.sum() >= 10)
                     else np.percentile(rel, 90) < 3 * rtol)
        results.append({
            "name": f"grid.{key}",
            "median_rel_err": float(np.median(rel)),
            "p90_rel_err": float(np.percentile(rel, 90)),
            "max_rel_err": float(np.max(rel)),
            "n": int(m.sum()),
            "ref_clamped_frac": round(float(clamp_frac), 3),
            "median_unclamped": float(np.median(relu)),
            "p90_unclamped": float(np.percentile(relu, 90)),
            "pass": bool(np.median(rel) < rtol and p90_guard),
        })


def compare_series(name: str, t_ref, y_ref, t_tpu, y_tpu, results: list,
                   rtol: float = 0.10, rel_floor: float = 0.02):
    """Compare two time series on the overlap of their time grids,
    normalising by the peak so empty bins don't dominate."""
    y_tpu_i = np.interp(t_ref, t_tpu, y_tpu)
    peak = max(np.max(np.abs(y_ref)), 1e-300)
    m = np.abs(y_ref) > rel_floor * peak
    rel = np.abs(y_tpu_i[m] - y_ref[m]) / np.maximum(np.abs(y_ref[m]),
                                                     rel_floor * peak)
    results.append({
        "name": name,
        "median_rel_err": float(np.median(rel)),
        "p90_rel_err": float(np.percentile(rel, 90)),
        "max_rel_err": float(np.max(rel)),
        "n": int(m.sum()),
        "pass": bool(np.median(rel) < rtol),
    })


def compare_spectrum(ref: dict, tpu: dict, results: list,
                     rtol: float = 0.25, nbands: int = 24):
    """Time-integrated spectrum compared two ways on the reference
    grid: per fine bin (MC-noise-dominated at CI packet counts — a
    diagnostic, not the contract) and by band energy over ``nbands``
    coarse log-nu bands, which averages the per-bin sampling noise
    (the BASELINE allclose contract)."""
    Lnu_ref = ref["Fnu"].sum(axis=1)
    Lnu_tpu = np.interp(ref["nu"], tpu["nu"], tpu["Fnu"].sum(axis=1))
    peak = Lnu_ref.max()
    m = Lnu_ref > 0.05 * peak
    rel = np.abs(Lnu_tpu[m] - Lnu_ref[m]) / Lnu_ref[m]
    results.append({
        "name": "spec.per_fine_bin (diagnostic)",
        "median_rel_err": float(np.median(rel)),
        "p90_rel_err": float(np.percentile(rel, 90)),
        "max_rel_err": float(np.max(rel)),
        "n": int(m.sum()),
        "pass": True,  # informational; the band contract decides
    })

    nu = ref["nu"]
    dnu = np.gradient(nu)
    er = Lnu_ref * dnu
    et = Lnu_tpu * dnu
    edges = np.logspace(np.log10(nu[0]), np.log10(nu[-1]), nbands + 1)
    ib = np.clip(np.digitize(nu, edges) - 1, 0, nbands - 1)
    br = np.bincount(ib, weights=er, minlength=nbands)
    bt = np.bincount(ib, weights=et, minlength=nbands)
    keep = br > 0.01 * br.sum()  # bands carrying >=1% of the energy
    relb = np.abs(bt[keep] - br[keep]) / br[keep]
    results.append({
        "name": "spec.band_energy",
        "median_rel_err": float(np.median(relb)),
        "p90_rel_err": float(np.percentile(relb, 90)),
        "max_rel_err": float(np.max(relb)),
        "n": int(keep.sum()),
        "pass": bool(np.median(relb) < rtol),
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("tpu_dir")
    ap.add_argument("--report", default=None)
    ap.add_argument("--rtol-T", type=float, default=0.10)
    ap.add_argument("--rtol-dep", type=float, default=0.10)
    ap.add_argument("--rtol-lc", type=float, default=0.15)
    ap.add_argument("--rtol-spec", type=float, default=0.25)
    ap.add_argument("--waive", action="append", default=[],
                    metavar="CONTRACT:REASON",
                    help="mark a contract as superseded: it is "
                         "excluded from the overall pass and carries "
                         "the reason in the report (e.g. "
                         "'grid.Te:settled by the NO_LUT pair ...')")
    args = ap.parse_args()
    waivers = dict(w.split(":", 1) for w in args.waive)

    results: list[dict] = []

    ref_est = parse_estimators(os.path.join(args.ref_dir,
                                            "estimators_0000.out"))
    tpu_est = parse_estimators(os.path.join(args.tpu_dir,
                                            "estimators_0000.out"))
    compare_fields(ref_est, tpu_est, results, rtol_T=args.rtol_T)

    ref_dep = parse_deposition(os.path.join(args.ref_dir,
                                            "deposition.out"))
    tpu_dep_path = os.path.join(args.tpu_dir, "deposition.json")
    if os.path.exists(tpu_dep_path):
        tpu_dep = parse_deposition_tpu(tpu_dep_path)
    else:
        tpu_dep = parse_deposition(os.path.join(args.tpu_dir,
                                                "deposition.out"))
    n = min(len(ref_dep["tmid_days"]), len(tpu_dep["tmid_days"]))
    compare_series("deposition.total", ref_dep["tmid_days"][:n],
                   ref_dep["total_dep"][:n], tpu_dep["tmid_days"][:n],
                   tpu_dep["total_dep"][:n], results,
                   rtol=args.rtol_dep)
    # gamma deposition: rel err vs the nearer of the reference's two
    # estimators (discrete-event vs path-integral) per timestep
    gref = ref_dep["gamma_dep"][:n]
    galt = ref_dep.get("gamma_dep_alt", gref)[:n]
    gtpu = tpu_dep["gamma_dep"][:n]
    mok = np.maximum(gref, galt) > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        r1 = np.abs(gtpu - gref) / np.maximum(gref, 1e-300)
        r2 = np.abs(gtpu - galt) / np.maximum(galt, 1e-300)
    relg = np.minimum(r1, r2)[mok]
    results.append({
        "name": "deposition.gamma",
        "median_rel_err": float(np.median(relg)),
        "p90_rel_err": float(np.percentile(relg, 90)),
        "max_rel_err": float(np.max(relg)),
        "n": int(mok.sum()),
        "pass": bool(np.median(relg) < 3 * args.rtol_dep),
    })

    ref_lc = parse_light_curve(os.path.join(args.ref_dir,
                                            "light_curve.out"))
    tpu_lc = parse_light_curve(os.path.join(args.tpu_dir,
                                            "light_curve.out"))
    compare_series("light_curve.bolometric", ref_lc["tmid_days"],
                   ref_lc["lum_Lsun"], tpu_lc["tmid_days"],
                   tpu_lc["lum_Lsun"], results, rtol=args.rtol_lc)

    ref_spec_p = os.path.join(args.ref_dir, "spec.out")
    tpu_spec_p = os.path.join(args.tpu_dir, "spec.out")
    if os.path.exists(ref_spec_p) and os.path.exists(tpu_spec_p):
        compare_spectrum(parse_spec(ref_spec_p), parse_spec(tpu_spec_p),
                         results, rtol=args.rtol_spec)

    for r in results:
        if r["name"] in waivers:
            r["superseded"] = waivers[r["name"]]
    ok = all(r["pass"] for r in results if "superseded" not in r)
    for r in results:
        flag = ("WAIVED" if "superseded" in r
                else "PASS" if r["pass"] else "FAIL")
        print(f"[{flag}] {r['name']:26s} median={r['median_rel_err']:.4f} "
              f"p90={r['p90_rel_err']:.4f} max={r['max_rel_err']:.4f} "
              f"(n={r['n']})")
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"pass": ok, "results": results}, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
