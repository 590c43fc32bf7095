#!/usr/bin/env python
"""Standalone exspec: rebuild spectra/light curves from packet dumps.

The reference ships a second binary, ``exspec``, that re-reads every
rank's escaped-packet files and bins them into spectra and light
curves (exspec.cc:36-298). Here the same post-processing runs from the
text packet dumps (`output.write_packets_file`) of a finished run:

    python tools/exspec.py RUNDIR [--nnubins 1000] [--angle-bins]

writes spec.out / light_curve.out (and per-direction-bin
light_curve_res_XX.out with --angle-bins) into RUNDIR.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

# spectrum binning is pure host work: force the CPU platform before
# any jax computation (artis_tpu imports jax) so this CLI never
# touches — or wedges on — the TPU tunnel while a run is active
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")


def read_packets_file(path: str) -> dict:
    """Read a text packet dump written by output.write_packets_file
    (the packets00_XXXX.out analogue, packet.cc:211-294)."""
    cols = np.loadtxt(path, ndmin=2)
    out = {
        "cell": cols[:, 1].astype(np.int64),
        "ptype": cols[:, 2].astype(np.int64),
        "pos": cols[:, 3:6],
        "dirvec": cols[:, 6:9],
        "e_cmf": cols[:, 9],
        "e_rf": cols[:, 10],
        "nu_cmf": cols[:, 11],
        "nu_rf": cols[:, 12],
        "escape_type": cols[:, 13].astype(np.int64),
        "escape_time": cols[:, 14],
        "nscatterings": cols[:, 15].astype(np.int64),
    }
    if cols.shape[1] >= 21:
        out["stokes_q"] = cols[:, 16]
        out["stokes_u"] = cols[:, 17]
        out["emissiontype"] = cols[:, 18].astype(np.int64)
        out["absorptiontype"] = cols[:, 19].astype(np.int64)
        out["absorption_nu"] = cols[:, 20]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--nnubins", type=int, default=1000)
    ap.add_argument("--nu-min", type=float, default=1e14)
    ap.add_argument("--nu-max", type=float, default=5e15)
    ap.add_argument("--tmin-days", type=float, default=None)
    ap.add_argument("--tmax-days", type=float, default=None)
    ap.add_argument("--ntimesteps", type=int, default=50)
    ap.add_argument("--angle-bins", action="store_true",
                    help="also write the 100 direction-binned light "
                         "curves (exspec.cc:142)")
    args = ap.parse_args()

    from artis_tpu import spectra as spectra_mod
    from artis_tpu.config import SimConfig
    from artis_tpu.constants import CLIGHT_PROP
    from artis_tpu.packets import TYPE_RPKT
    from artis_tpu.timesteps import build_timesteps

    # per-rank/shard packet dumps (CGS) are disjoint populations and
    # are all concatenated (exspec.cc reads every rank's file)
    dumps = sorted(f for f in os.listdir(args.rundir)
                   if f.startswith("packets") and f.endswith(".out"))
    if not dumps:
        sys.exit(f"no packets*.out files in {args.rundir}")
    arrays = [read_packets_file(os.path.join(args.rundir, f))
              for f in dumps]
    packs = {k: np.concatenate([np.asarray(a[k]) for a in arrays])
             for k in arrays[0]}

    # default window from observer ARRIVAL times (escape_time minus the
    # pos.dir/c projection, get_arrive_time vectors.h:146-152) — these
    # are earlier than escape times, so deriving the window from escape
    # times would silently drop the light-curve rise
    esc_mask = packs["escape_time"] > 0
    t_arrive = (packs["escape_time"]
                - np.sum(packs["pos"] * packs["dirvec"], axis=1)
                / CLIGHT_PROP)[esc_mask]
    tmin_d = (args.tmin_days if args.tmin_days is not None
              else max(t_arrive.min() / 86400.0, 1e-3))
    tmax_d = (args.tmax_days if args.tmax_days is not None
              else t_arrive.max() / 86400.0 * 1.001)
    cfg = SimConfig(ntimesteps=args.ntimesteps, tmin_days=tmin_d,
                    tmax_days=tmax_d)
    ts = build_timesteps(cfg)

    esc = spectra_mod.select_escaped(packs, TYPE_RPKT)
    spec = spectra_mod.build_spectra(esc, ts, args.nu_min, args.nu_max,
                                     args.nnubins)
    spectra_mod.write_spectrum(os.path.join(args.rundir, "spec.out"),
                               spec)
    spectra_mod.write_light_curve(
        os.path.join(args.rundir, "light_curve.out"), spec)
    print(f"exspec: {len(esc['e_rf'])} escaped r-packets -> spec.out, "
          f"light_curve.out")

    # Stokes spectra from the real escaped packets (write_specpol,
    # spectrum.cc:214-305)
    if "stokes_q" in esc:
        I, Q, U = spectra_mod.build_specpol(esc, ts, args.nu_min,
                                            args.nu_max, args.nnubins)
        spectra_mod.write_specpol(
            os.path.join(args.rundir, "specpol.out"), ts, I, Q, U,
            args.nu_min, args.nu_max)
        print("exspec: wrote specpol.out")

    # escaped gamma packets (exspec.cc:190-196, 214)
    from artis_tpu.packets import TYPE_GAMMA
    gesc = spectra_mod.select_escaped(packs, TYPE_GAMMA)
    if len(gesc["e_rf"]):
        gspec = spectra_mod.build_spectra(gesc, ts, args.nu_min * 10,
                                          args.nu_max * 1e5,
                                          args.nnubins)
        spectra_mod.write_spectrum(
            os.path.join(args.rundir, "gamma_spec.out"), gspec)
        spectra_mod.write_light_curve(
            os.path.join(args.rundir, "gamma_light_curve.out"), gspec)
        print(f"exspec: {len(gesc['e_rf'])} escaped gamma packets")

    if args.angle_bins:
        # direction-binned spectra / light curves / Stokes spectra
        # (exspec.cc:142-250: spec_res_XX, light_curve_res_XX,
        # specpol_res_XX for the 10x10 escape-direction bins)
        for a in range(100):
            s = spectra_mod.build_spectra(esc, ts, args.nu_min,
                                          args.nu_max, args.nnubins,
                                          abin=a)
            spectra_mod.write_light_curve(
                os.path.join(args.rundir,
                             f"light_curve_res_{a:02d}.out"), s)
            spectra_mod.write_spectrum(
                os.path.join(args.rundir, f"spec_res_{a:02d}.out"), s)
            if "stokes_q" in esc:
                I, Q, U = spectra_mod.build_specpol(
                    esc, ts, args.nu_min, args.nu_max, args.nnubins,
                    abin=a)
                spectra_mod.write_specpol(
                    os.path.join(args.rundir,
                                 f"specpol_res_{a:02d}.out"),
                    ts, I, Q, U, args.nu_min, args.nu_max)
        print("exspec: wrote 100 direction-binned spectra, light "
              "curves" + (" and Stokes spectra"
                          if "stokes_q" in esc else ""))


if __name__ == "__main__":
    main()
