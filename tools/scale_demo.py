"""HBM-scale demonstration: a detailed (opacity_case 4) timestep with a
reference-scale synthetic linelist on one chip.

Targets the SURVEY.md §7.3 scale concern: >= 1e5 lines x >= 500 cells
must fit one chip's HBM with the per-(cell,line) macro-atom /
k-packet tables, and the device-side table build must stay a small
fraction of the timestep (plasma/macroatom_device.py).

Usage:  python tools/scale_demo.py [nlev_per_ion] [ncells] [npkts]
Prints one JSON line with the achieved scale and timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    nlev = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ncells = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    npkts = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    from artis_tpu import SimConfig, Simulation, make_toy_1d_model
    from artis_tpu.atomic import make_synthetic_atomic_data

    # ~4 elements x 3 ions x nlev levels; the generator connects
    # permitted downward transitions, so nlines grows ~ nlev^2
    ad = make_synthetic_atomic_data(
        elements=((14, 2, nlev), (26, 3, nlev), (27, 3, nlev),
                  (28, 3, nlev)))
    print(f"synthetic dataset: {ad.nlines} lines, "
          f"{ad.nlevels_total} levels", file=sys.stderr)

    cfg = SimConfig(npkts=npkts, ntimesteps=4, tmin_days=8.0,
                    tmax_days=30.0, ftstep=1, opacity_case=4,
                    seed=11, compact_min_size=4096)
    model = make_toy_1d_model(nshells=ncells, vmax=2.5e9,
                              mtot_msun=1.3, mni56_msun=0.55,
                              tmin=cfg.tmin)
    sim = Simulation(model, cfg, atomic_data=ad)

    t0 = time.time()
    sim.advance_one_timestep(checkpoint=False, verbose=True)
    wall = time.time() - t0
    d = sim.dep_log[-1]
    events = (d["escounter"] + d["cellcrossings"] + d["interactions"]
              + d["pellet_decays"])
    table_bytes = 5 * ncells * ad.nlines * 4  # the dense f32 rows
    print(json.dumps({
        "nlines": int(ad.nlines), "ncells": ncells, "npkts": npkts,
        "events": int(events),
        "timestep_wall_s": round(wall, 2),
        "table_build_s": round(getattr(sim, "_t_tables_ma", -1.0), 2),
        "dense_tables_gb": round(table_bytes / 1e9, 3),
        "events_per_s": round(events / max(wall, 1e-9), 1),
        **_hbm_stats(),
        **{f"t_{k}": v for k, v in
           getattr(sim, "_t_phase", {}).items()},
    }))

    # a second timestep separates steady-state cost from compilation
    t0 = time.time()
    sim.advance_one_timestep(checkpoint=False, verbose=True)
    wall = time.time() - t0
    d = sim.dep_log[-1]
    events = (d["escounter"] + d["cellcrossings"] + d["interactions"]
              + d["pellet_decays"])
    print(json.dumps({
        "ts": 1, "nlines": int(ad.nlines), "ncells": ncells,
        "npkts": npkts, "events": int(events),
        "timestep_wall_s": round(wall, 2),
        "table_build_s": round(getattr(sim, "_t_tables_ma", -1.0), 2),
        "events_per_s": round(events / max(wall, 1e-9), 1),
        **_hbm_stats(),
        **{f"t_{k}": round(v, 2) for k, v in
           getattr(sim, "_t_phase", {}).items()},
        **{f"tsub_{k}": round(v, 2) for k, v in
           getattr(sim, "_t_tables_sub", {}).items()},
    }))


def _hbm_stats():
    import jax
    try:
        ms = jax.devices()[0].memory_stats() or {}
        return {"hbm_in_use_gb": round(ms.get("bytes_in_use", 0) / 1e9,
                                       3),
                "hbm_peak_gb": round(ms.get("peak_bytes_in_use", 0)
                                     / 1e9, 3),
                "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 1e9,
                                      3)}
    except Exception:
        return {}


if __name__ == "__main__":
    main()
