"""Microbenchmark the transport event-step on the current device.

Times the jitted chunked event loop (`Simulation._step_fn`) directly at
a fixed iteration count with all lanes active, isolating the
per-iteration cost of the kernel body from driver/solve overheads.
This is the measurement tool behind the round-3 kernel optimisation
(VERDICT.md Next #1): events/s = lanes * iters / wall only when every
lane is active, so the per-iteration wall time at a given batch size is
the kernel's speed-of-light number.

Usage:
    python tools/microbench_step.py [npkts] [iters] [--grey] [--cpu]
Prints one JSON line per (npkts, iters) measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    npkts = int(args[0]) if args else 131_072
    iters = int(args[1]) if len(args) > 1 else 64
    grey = "--grey" in sys.argv

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from artis_tpu import (SimConfig, Simulation, make_toy_1d_model,
                           read_input_txt, read_1d_model,
                           read_abundances)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inputdir = os.path.join(here, "refbuild", "run", "classic_sph")
    if grey or not os.path.exists(os.path.join(inputdir, "adata.txt")):
        cfg = SimConfig(npkts=npkts, ntimesteps=12, tmin_days=3.0,
                        tmax_days=30.0, ftstep=12, opacity_case=0,
                        seed=5)
        model = make_toy_1d_model(nshells=24, tmin=cfg.tmin)
        sim = Simulation(model, cfg)
        mode = "grey"
    else:
        from artis_tpu.atomic import read_atomic_data
        from artis_tpu.phixs import read_phixs_data
        cfg = read_input_txt(os.path.join(inputdir, "input-newrun.txt"))
        cfg.npkts = npkts
        cfg.mintemp, cfg.maxtemp = 3500.0, 140_000.0
        model = read_1d_model(os.path.join(inputdir, "model.txt"),
                              tmin=cfg.tmin, data_path=inputdir)
        model.elem_abund = read_abundances(
            os.path.join(inputdir, "abundances.txt"), model.ncells)
        ad = read_atomic_data(inputdir)
        ph = read_phixs_data(inputdir, ad)
        sim = Simulation(model, cfg, atomic_data=ad, phixs_data=ph)
        mode = "detailed"

    # assemble the per-timestep inputs the way advance_one_timestep does
    from artis_tpu.transport.kernel import zero_estimators
    nts = cfg.itstep
    tmid = float(sim.ts.mid[nts])
    tables = sim._place_tables(sim._tables(tmid))
    t2 = jnp.float32(sim.units.time_to_sim(sim.ts.end(nts)))
    est = zero_estimators(sim.grid.nmodel, sim._rf_nbins(),
                          sim._vp_shape(),
                          nlines_stat=sim._nlines_stat(),
                          ion_stats_nions=sim._ion_stats_nions(),
                          syn_emiss_bins=sim._syn_emiss_bins(),
                          vgrid_shape=sim._vgrid_shape(),
                          n_bfcont=sim._n_bfcont())
    pk = sim.packets

    t0 = time.time()
    pk1, est1, n_act = sim._step_fn(pk, est, tables, sim.params, t2,
                                    True, sim.base_key,
                                    jnp.int32(4))
    jax.block_until_ready(n_act)
    t_compile = time.time() - t0
    print(f"compile+4 iters: {t_compile:.1f}s  n_act={int(n_act)}",
          file=sys.stderr, flush=True)

    # timed run from the fresh state: `iters` iterations
    t0 = time.time()
    pk2, est2, n_act2 = sim._step_fn(pk, est, tables, sim.params, t2,
                                     True, sim.base_key,
                                     jnp.int32(iters))
    jax.block_until_ready(n_act2)
    wall = time.time() - t0
    e = {k: float(est2[k]) for k in ("escounter", "cellcrossings",
                                     "interactions", "pellet_decays",
                                     "iterations")}
    events = (e["escounter"] + e["cellcrossings"] + e["interactions"]
              + e["pellet_decays"])
    print(json.dumps({
        "mode": mode, "npkts": npkts, "iters": iters,
        "wall_s": round(wall, 3),
        "ms_per_iter": round(1e3 * wall / max(e["iterations"], 1), 3),
        "events": int(events),
        "events_per_s": round(events / wall, 1),
        "n_active_end": int(n_act2),
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
