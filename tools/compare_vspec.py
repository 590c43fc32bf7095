"""Compare observer virtual-packet spectra (vspecpol) between the
reference (VPKT_ON build, vpkt.cc:445-560 output format) and artis_tpu
(deterministic peel-off estimators, spectra.write_vspec).

The two codes bin on different grids (reference: VMTBINS=30 log-time
bins over the vpkt.txt window x VMNUBINS=2500 log-nu bins; artis_tpu:
the simulation timestep grid x cfg.vpkt_nnubins), so the contract is
band-integrated energy: both spectra are integrated over common
wavelength bands x common arrival-time windows and compared as
energies [erg/cm^2 at 1 Mpc].  This quantifies the bias of the
binned-expansion-opacity observer tau used by the TPU peel-off against
the reference's exact per-ray line walk (rlc_emiss_vpkt + check_tau,
vpkt.cc:76-441) on identical inputs.

Usage:
  python tools/compare_vspec.py refbuild/run/classic_sph_vpkt \
      refbuild/run/tpu_classic_vpkt [--report out.json]
"""

import argparse
import json
import os
import sys

import numpy as np

CLIGHT = 2.99792458e10


def parse_ref_vspecpol(path):
    """Reference vspecpol_0-0.out: header row '0' + 3x VMTBINS time
    midpoints [days]; data rows: nu_mid then I[VMTBINS], Q[.], U[.]
    (write_vspecpol, vpkt.cc:445-482). One block per (obs, spectrum);
    only the first block is read."""
    with open(path) as f:
        header = np.fromstring(f.readline(), sep=" ")
        ncols = len(header)
        nt = (ncols - 1) // 3
        tmid = header[1:1 + nt]
        rows = []
        for line in f:
            v = np.fromstring(line, sep=" ")
            if len(v) != ncols:
                break  # next observer block header
            rows.append(v)
    d = np.asarray(rows)
    return {"tmid_days": tmid, "nu": d[:, 0],
            "I": d[:, 1:1 + nt], "Q": d[:, 1 + nt:1 + 2 * nt],
            "U": d[:, 1 + 2 * nt:1 + 3 * nt]}


def parse_tpu_vspec(path):
    """artis_tpu vspecpol.out: '#observer o stokes X' blocks; header
    '0.0' + timestep midpoints [days]; rows nu_mid + flux per ts."""
    blocks = {}
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith("#observer"):
                toks = line.split()
                cur = (int(toks[1]), toks[3])
                blocks[cur] = []
                continue
            blocks[cur].append(np.fromstring(line, sep=" "))
    out = {}
    for (o, name), rows in blocks.items():
        if o != 0:
            continue
        head = rows[0]
        d = np.asarray(rows[1:])
        out["tmid_days"] = head[1:]
        out["nu"] = d[:, 0]
        out[name] = d[:, 1:]
    return out


def band_energy(nu, tmid_days, flux, nu_lo, nu_hi, t_lo_d, t_hi_d):
    """Integrate flux [erg/s/cm^2/Hz] over a (nu, t) window using the
    log-bin widths implied by the midpoint grids -> erg/cm^2."""
    # bin widths from midpoints (both grids are log-uniform)
    dlognu = np.median(np.diff(np.log(nu)))
    dnu = nu * (np.exp(dlognu / 2) - np.exp(-dlognu / 2))
    t = tmid_days * 86400.0
    dlogt = np.median(np.diff(np.log(tmid_days)))
    dt = t * (np.exp(dlogt / 2) - np.exp(-dlogt / 2))
    msel = (nu >= nu_lo) & (nu < nu_hi)
    tsel = (tmid_days >= t_lo_d) & (tmid_days < t_hi_d)
    if not msel.any() or not tsel.any():
        return 0.0
    f = flux[np.ix_(msel, tsel)]
    return float(np.einsum("ij,i,j->", f, dnu[msel], dt[tsel]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("tpu_dir")
    ap.add_argument("--report", default=None)
    ap.add_argument("--rtol", type=float, default=0.25)
    ap.add_argument("--nbands", type=int, default=6)
    ap.add_argument("--lambda-range", type=float, nargs=2,
                    default=[3500.0, 10000.0])
    ap.add_argument("--time-windows", type=float, nargs="*",
                    default=[10.0, 14.0, 19.0, 26.0])
    args = ap.parse_args()

    ref = parse_ref_vspecpol(os.path.join(args.ref_dir,
                                          "vspecpol_0-0.out"))
    tpu = parse_tpu_vspec(os.path.join(args.tpu_dir, "vspecpol.out"))

    lam_edges = np.geomspace(args.lambda_range[0],
                             args.lambda_range[1], args.nbands + 1)
    nu_edges = (CLIGHT / (lam_edges[::-1] * 1e-8))
    tw = args.time_windows

    results = []
    rels = []
    for it in range(len(tw) - 1):
        for ib in range(args.nbands):
            e_ref = band_energy(ref["nu"], ref["tmid_days"], ref["I"],
                                nu_edges[ib], nu_edges[ib + 1],
                                tw[it], tw[it + 1])
            e_tpu = band_energy(tpu["nu"], tpu["tmid_days"], tpu["I"],
                                nu_edges[ib], nu_edges[ib + 1],
                                tw[it], tw[it + 1])
            if e_ref <= 0 and e_tpu <= 0:
                continue
            rel = abs(e_tpu - e_ref) / max(e_ref, 1e-300)
            rels.append(rel)
            lam_lo = CLIGHT / nu_edges[ib + 1] * 1e8
            lam_hi = CLIGHT / nu_edges[ib] * 1e8
            results.append({
                "band_aa": [round(lam_lo), round(lam_hi)],
                "t_days": [tw[it], tw[it + 1]],
                "E_ref": e_ref, "E_tpu": e_tpu,
                "rel_err": round(rel, 4)})

    rels = np.asarray(rels)
    # total window energy (normalisation contract)
    tot_ref = band_energy(ref["nu"], ref["tmid_days"], ref["I"],
                          nu_edges[0], nu_edges[-1], tw[0], tw[-1])
    tot_tpu = band_energy(tpu["nu"], tpu["tmid_days"], tpu["I"],
                          nu_edges[0], nu_edges[-1], tw[0], tw[-1])
    tot_rel = abs(tot_tpu - tot_ref) / max(tot_ref, 1e-300)

    # polarisation sanity: Q/U energy is a small fraction of I on both
    # sides (spherical 1D model -> net polarisation ~ 0 + MC noise)
    pol = {}
    for name in ("Q", "U"):
        pr = band_energy(ref["nu"], ref["tmid_days"],
                         np.abs(ref[name]), nu_edges[0], nu_edges[-1],
                         tw[0], tw[-1]) / max(tot_ref, 1e-300)
        pt = band_energy(tpu["nu"], tpu["tmid_days"],
                         np.abs(tpu[name]), nu_edges[0], nu_edges[-1],
                         tw[0], tw[-1]) / max(tot_tpu, 1e-300)
        pol[name] = {"ref_absfrac": round(pr, 4),
                     "tpu_absfrac": round(pt, 4)}

    summary = {
        "vspec.total_I": {"median_rel_err": tot_rel,
                          "pass": bool(tot_rel < args.rtol)},
        "vspec.band_I": {
            "median_rel_err": float(np.median(rels)),
            "p90_rel_err": float(np.percentile(rels, 90)),
            "max_rel_err": float(np.max(rels)),
            "n": int(len(rels)),
            "pass": bool(np.median(rels) < args.rtol)},
        "vspec.polarisation": pol,
    }
    ok = summary["vspec.total_I"]["pass"] and \
        summary["vspec.band_I"]["pass"]
    print(f"[{'PASS' if summary['vspec.total_I']['pass'] else 'FAIL'}]"
          f" vspec total I   rel={tot_rel:.4f} "
          f"(E_ref={tot_ref:.4e}, E_tpu={tot_tpu:.4e} erg/cm^2@1Mpc)")
    print(f"[{'PASS' if summary['vspec.band_I']['pass'] else 'FAIL'}]"
          f" vspec band I    median={np.median(rels):.4f} "
          f"p90={np.percentile(rels, 90):.4f} "
          f"max={rels.max():.4f} (n={len(rels)})")
    print(f"       |Q|/I: ref {pol['Q']['ref_absfrac']:.4f} "
          f"tpu {pol['Q']['tpu_absfrac']:.4f}; "
          f"|U|/I: ref {pol['U']['ref_absfrac']:.4f} "
          f"tpu {pol['U']['tpu_absfrac']:.4f}")
    if args.report:
        with open(args.report, "w") as f:
            json.dump({"pass": ok, "summary": summary,
                       "bands": results}, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
