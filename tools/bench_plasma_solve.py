"""Benchmark the per-timestep plasma solves at production cell counts.

Times the host-side grid-solve components (the analogue of the
reference's update_grid pass, which distributes cells over MPI ranks,
grid.cc:1931-1998 / sn3d.cc:951-964) on a synthetic nebular-like state
replicated to --ncells cells using the real nebular atomic dataset:

  * LTE Saha populations (ltepop.cc)
  * NLTE statistical-equilibrium solve (nltepop.cc:392-417)
  * Spencer-Fano build+solve (nonthermal.cc:2282-2713) — the matrix
    assembly is batched over cells with the per-ion kernels applied in
    one GEMM; the triangular solves are batched LAPACK
  * thermal-balance Te bisection (thermalbalance.cc:141)

Writes PLASMA_SOLVE.json at the repo root:
    python tools/bench_plasma_solve.py [--ncells 96] [--sfpts 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ncells", type=int, default=96)
    ap.add_argument("--sfpts", type=int, default=512)
    ap.add_argument("--data", default=None,
                    help="reference-format data dir (default: "
                         "refbuild/run/nebular)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = args.data or os.path.join(here, "refbuild", "run", "nebular")

    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data
    from artis_tpu.plasma import lte
    from artis_tpu.plasma.nonthermal import SpencerFanoSolver

    ad = read_atomic_data(d)
    ph = read_phixs_data(d, ad)
    C = args.ncells
    nd = np.full((C, ad.nelements), 1e7) \
        * (1 + 0.01 * np.arange(C))[:, None]
    T = np.full(C, 8000.0)

    res = {"ncells": C, "sfpts": args.sfpts, "nlines": int(ad.nlines),
           "nlevels": int(ad.nlevels_total)}

    t0 = time.time()
    pops = lte.solve_lte_populations(ad, nd, T)
    nl = lte.level_populations(ad, pops, T)
    res["lte_s"] = round(time.time() - t0, 3)

    ion_nd = np.zeros((C, ad.nions_total))
    for i in range(ad.nions_total):
        l0, l1 = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        ion_nd[:, i] = nl[:, l0:l1].sum(axis=1)
    nne = nd.sum(axis=1) * 1.5

    # Spencer-Fano: cold (builds the per-ion kernel cache) then warm
    sfs = SpencerFanoSolver(ad, sfpts=args.sfpts)
    t0 = time.time()
    sfs.solve(nne, nl, ion_nd)
    res["sf_cold_s"] = round(time.time() - t0, 3)
    t0 = time.time()
    sol = sfs.solve(nne, nl, ion_nd)
    res["sf_warm_s"] = round(time.time() - t0, 3)
    res["sf_warm_ms_per_cell"] = round(1e3 * res["sf_warm_s"] / C, 2)

    # NLTE statistical equilibrium
    from artis_tpu.plasma.nltepop import solve_nlte_pops
    W = np.ones(C)
    t0 = time.time()
    out = solve_nlte_pops(ad, None, None, nl, nd, T, T, W, nne,
                          t_mid=10.0 * 86400.0)
    res["nlte_s"] = round(time.time() - t0, 3)
    res["nlte_ms_per_cell"] = round(1e3 * res["nlte_s"] / C, 2)
    assert np.isfinite(out).all()

    res["total_warm_s"] = round(
        res["lte_s"] + res["sf_warm_s"] + res["nlte_s"], 3)
    res["note"] = ("host-side batched solves over all cells; the "
                   "reference distributes the same work over MPI "
                   "ranks (sn3d.cc:951-964)")
    out_path = args.out or os.path.join(here, "PLASMA_SOLVE.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
