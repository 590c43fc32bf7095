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

    # concurrent range execution (plasma.sharded.run_ranges): the
    # single-host analogue of the reference's one-rank-per-range MPI
    # split — measures real wall speedup of threads over the serial
    # full-batch solve on the same cells
    from artis_tpu.plasma import sharded as sh
    workers = min(os.cpu_count() or 1, 8)
    starts = tuple(int(b) for b in
                   np.linspace(0, C, workers + 1).astype(int))
    kw = dict(radfield=None, nt_ion_rate_ion=None,
              nt_auger_prob=None, jb_lu=None)
    t0 = time.time()
    conc = sh.solve_nlte_pops_sharded(
        starts, ad, None, None, nl, nd, T, T, W, nne,
        10.0 * 86400.0, workers=workers, **kw)
    res["nlte_concurrent_s"] = round(time.time() - t0, 3)
    # at 512 cells the batched LAPACK/GEMM reduction order differs
    # between range sizes -> agreement to numerical noise, not bitwise
    np.testing.assert_allclose(conc, out, rtol=1e-8, atol=1e-30)
    sfs2 = SpencerFanoSolver(ad, sfpts=args.sfpts)
    sfs2.solve(nne[:1], nl[:1], ion_nd[:1])  # warm the kernel cache
    t0 = time.time()
    sol_c = sh.solve_sf_sharded(sfs2, starts, nne, nl, ion_nd,
                                workers=workers)
    res["sf_concurrent_s"] = round(time.time() - t0, 3)
    np.testing.assert_allclose(sol_c.frac_heating, sol.frac_heating,
                               rtol=1e-10)
    res["plasma_workers"] = workers
    res["nlte_concurrent_speedup"] = round(
        res["nlte_s"] / max(res["nlte_concurrent_s"], 1e-9), 2)
    res["sf_concurrent_speedup"] = round(
        res["sf_warm_s"] / max(res["sf_concurrent_s"], 1e-9), 2)
    res["note"] = ("host-side batched solves over all cells; "
                   "*_concurrent_s rows run the same cells split "
                   "into one range per worker thread "
                   "(plasma.sharded.run_ranges), the single-host "
                   "analogue of the reference's MPI rank split "
                   "(sn3d.cc:951-964)")
    out_path = args.out or os.path.join(here, "PLASMA_SOLVE.json")
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
