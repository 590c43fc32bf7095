"""Rank the top line contributions to emission and absorption within a
wavelength x arrival-time window — the analogue of the reference's
TRACE_EMISSION_ABSORPTION_REGION_ON exspec diagnostic
(printout_tracemission_stats, spectrum.cc:11-136,390-455).

Reads a run directory's packets00_0000.out (artis_tpu column layout,
output.write_packets_file) plus the atomic dataset, and prints two
ranked tables: line emission energy and line absorption energy inside
the window, with the flux-weighted mean radial velocity of the last
emission (|em_pos|/em_time; equal to the reference's
trueemissionvelocity for packets that did not electron-scatter after
their last real emission).

Usage:
  python tools/trace_emission.py RUNDIR [--lambda 1000 25000]
      [--time 320 340] [--top 25]
"""

import argparse
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

CLIGHT = 2.99792458e10
DAY = 86400.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--lambda", dest="lam", type=float, nargs=2,
                    default=[1000.0, 25000.0], help="window [AA]")
    ap.add_argument("--time", type=float, nargs=2,
                    default=[320.0, 340.0], help="window [days]")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--data", default=None,
                    help="directory with the atomic dataset "
                         "(default: RUNDIR)")
    args = ap.parse_args()

    from artis_tpu.atomic import read_atomic_data

    ad = read_atomic_data(args.data or args.rundir)
    p = np.genfromtxt(os.path.join(args.rundir, "packets00_0000.out"),
                      names=True)
    esc = p["type_id"] == 32
    rp = esc & (p["escape_type_id"] == 11)
    # arrival time: escape_time - pos.dir/c (vectors.h:146-156)
    posdot = (p["posx"] * p["dirx"] + p["posy"] * p["diry"]
              + p["posz"] * p["dirz"])
    t_arr = (p["escape_time"] - posdot / CLIGHT) / DAY
    nu_lo = 1e8 * CLIGHT / args.lam[1]
    nu_hi = 1e8 * CLIGHT / args.lam[0]
    win = (rp & (t_arr >= args.time[0]) & (t_arr <= args.time[1])
           & (p["nu_rf"] >= nu_lo) & (p["nu_rf"] <= nu_hi))

    ion_of_level = np.repeat(np.arange(ad.nions_total),
                             np.diff(ad.ion_level_start))
    vrad = np.zeros(len(p))
    has_em = p["em_time"] > 0
    em_r = np.sqrt(p["em_posx"]**2 + p["em_posy"]**2 + p["em_posz"]**2)
    vrad[has_em] = em_r[has_em] / p["em_time"][has_em] / 1e5  # km/s

    for mode, typecol in (("emission", "emissiontype"),
                          ("absorption", "absorptiontype")):
        et = p[typecol].astype(int)
        sel = win & (et >= 0) & (et < ad.nlines)
        if mode == "absorption":
            # bin by the rest-frame frequency at absorption
            nu_ab = p["absorption_nu"]
            sel = (rp & (t_arr >= args.time[0])
                   & (t_arr <= args.time[1]) & (et >= 0)
                   & (et < ad.nlines)
                   & (nu_ab >= nu_lo) & (nu_ab <= nu_hi))
        e = p["e_rf"][sel]
        lines = et[sel]
        tot = e.sum()
        en = np.zeros(ad.nlines)
        wv = np.zeros(ad.nlines)
        np.add.at(en, lines, e)
        np.add.at(wv, lines, e * vrad[sel])
        order = np.argsort(-en)[:args.top]
        print(f"\nTop line {mode} contributions, lambda "
              f"[{args.lam[0]:.0f}, {args.lam[1]:.0f}] AA, time "
              f"[{args.time[0]:.1f}, {args.time[1]:.1f}] d "
              f"({tot:.4e} erg, {sel.sum()} packets)")
        print(f"{'frac':>7s} {'energy':>11s} {'Z':>3s} {'ion':>4s} "
              f"{'lower':>6s} {'upper':>6s} {'lambda':>9s} "
              f"{'A':>10s} {'<v_rad>':>9s}")
        for li in order:
            if en[li] <= 0:
                break
            ion = ion_of_level[ad.line_lower[li]]
            z = int(ad.elem_z[ad.ion_element[ion]])
            stage = int(ad.ion_stage[ion])
            lam = 1e8 * CLIGHT / ad.line_nu[li]
            lo_rel = int(ad.line_lower[li] - ad.ion_level_start[ion])
            up_rel = int(ad.line_upper[li] - ad.ion_level_start[ion])
            print(f"{en[li] / max(tot, 1e-300):7.4f} {en[li]:11.4e} "
                  f"{z:3d} {stage:4d} {lo_rel:6d} {up_rel:6d} "
                  f"{lam:9.1f} {ad.line_A[li]:10.3e} "
                  f"{wv[li] / en[li]:9.1f}")


if __name__ == "__main__":
    main()
