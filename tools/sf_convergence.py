"""Spencer-Fano energy-grid convergence study + batched-solver timing.

The reference runs SFPTS=4096 (artisoptions_nltenebular.h); artis_tpu
defaults to cfg.sf_points=384.  This tool quantifies what that grid
choice costs in accuracy: it solves the same Fe-rich plasma state (the
classicmode fixture's synthetic atomic dataset + the reference's
collion.txt/Auger tables) on a ladder of grids and reports the
deposition fractions and NT ionisation rates relative to the
sfpts=4096 solution.  It also times the batched multi-cell solve
(VERDICT round-2 item 8: the round-2 implementation looped cells in
Python with a dense LU per cell; the solver now assembles the matrix
batched over cells and back-substitutes the exactly-upper-triangular
system).

Usage: python tools/sf_convergence.py [--cells N] > SF_CONVERGENCE.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from artis_tpu.atomic import read_atomic_data  # noqa: E402
from artis_tpu.plasma import lte  # noqa: E402
from artis_tpu.plasma.nonthermal import (SpencerFanoSolver,  # noqa: E402
                                         read_collion, read_auger_data)

DATA_DIR = os.path.join(HERE, "refbuild", "run", "classic_sph")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=96,
                    help="cell count for the batched-timing case")
    ap.add_argument("--grids", type=int, nargs="*",
                    default=[256, 384, 512, 1024, 2048, 4096])
    args = ap.parse_args()

    ad = read_atomic_data(DATA_DIR)
    rows = read_collion(DATA_DIR)
    n_aug = read_auger_data(DATA_DIR, rows)

    # nebular-epoch-like Fe-rich state (one zone)
    nd = np.zeros((1, ad.nelements))
    zrow = {int(z): e for e, z in enumerate(ad.elem_z)}
    nd[0, :] = 1e4
    if 26 in zrow:
        nd[0, zrow[26]] = 5e6  # Fe-dominated
    if 27 in zrow:
        nd[0, zrow[27]] = 5e5
    T = np.array([6500.0])
    pops = lte.solve_lte_populations(ad, nd, T)
    nl = lte.level_populations(ad, pops, T)
    nne = np.maximum(pops.nne, 1e5)

    results = {"data_dir": os.path.relpath(DATA_DIR, HERE),
               "n_collion_shells": len(rows),
               "n_auger_shells": n_aug,
               "state": {"T_K": float(T[0]), "nne": float(nne[0]),
                         "ntot": float(nd.sum())},
               "grids": []}
    ref = None
    for n in args.grids:
        s = SpencerFanoSolver(ad, sfpts=n, colliondata=rows)
        t0 = time.time()
        sol = s.solve(nne, nl, pops.ion_numberdens)
        dt = time.time() - t0
        populated = pops.ion_numberdens[0] > 1e-6 * \
            pops.ion_numberdens[0].max()
        entry = {"sfpts": n, "wall_s": round(dt, 3),
                 "frac_heating": float(sol.frac_heating[0]),
                 "frac_ionization": float(sol.frac_ionization[0]),
                 "frac_excitation": float(sol.frac_excitation[0]),
                 "ion_rate_populated": sol.ion_rate_per_dep[
                     0, populated].tolist()}
        results["grids"].append(entry)
        ref = entry
    # relative errors vs the finest grid
    for e in results["grids"]:
        e["rel_err_heating_vs_finest"] = round(
            abs(e["frac_heating"] / ref["frac_heating"] - 1), 5)
        e["rel_err_ionization_vs_finest"] = round(
            abs(e["frac_ionization"] / ref["frac_ionization"] - 1), 5)
        ir = np.asarray(e["ion_rate_populated"])
        ir_ref = np.asarray(ref["ion_rate_populated"])
        with np.errstate(divide="ignore", invalid="ignore"):
            rel = np.abs(ir / np.where(ir_ref != 0, ir_ref, np.nan) - 1)
        e["ion_rate_max_rel_err_vs_finest"] = (
            round(float(np.nanmax(rel)), 5) if np.isfinite(rel).any()
            else None)
        del e["ion_rate_populated"]

    # batched multi-cell timing at the production default grid:
    # perturbed copies of the state so no cell hits the reuse policy
    B = args.cells
    rng = np.random.default_rng(0)
    Tb = 6500.0 * rng.uniform(0.7, 1.4, B)
    ndb = np.tile(nd, (B, 1)) * rng.uniform(0.5, 2.0, (B, 1))
    popsb = lte.solve_lte_populations(ad, ndb, Tb)
    nlb = lte.level_populations(ad, popsb, Tb)
    nneb = np.maximum(popsb.nne, 1e5)
    for n in (512, 4096):
        s = SpencerFanoSolver(ad, sfpts=n, colliondata=rows)
        t0 = time.time()
        s.solve(nneb, nlb, popsb.ion_numberdens)
        dt = time.time() - t0
        results[f"batched_{B}cells_sfpts{n}_wall_s"] = round(dt, 3)
        results[f"batched_{B}cells_sfpts{n}_ms_per_cell"] = round(
            dt / B * 1e3, 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
