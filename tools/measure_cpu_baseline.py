"""Measure the host-CPU events/s baseline used by bench.py's
vs_baseline field.

Run with: JAX_PLATFORMS=cpu python tools/measure_cpu_baseline.py
Uses the same workload shape as bench.py (scaled-down packet count for
CPU) and reports events/s; multiply by (bench npkts / this npkts) only
if throughput is linear — it is, so we report events/s directly.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

# jax may be pre-imported in this environment; env vars alone are too
# late then — update the live config as well
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    from artis_tpu import SimConfig, Simulation, make_toy_1d_model

    npkts = int(os.environ.get("BENCH_NPKTS", 200_000))
    cfg = SimConfig(npkts=npkts, ntimesteps=12, tmin_days=3.0,
                    tmax_days=30.0, ftstep=12, opacity_case=0, seed=5)
    model = make_toy_1d_model(nshells=24, tmin=cfg.tmin)
    sim = Simulation(model, cfg)

    sim.advance_one_timestep(checkpoint=False, verbose=False)
    t0 = time.time()
    events = 0
    for _ in range(3):
        sim.advance_one_timestep(checkpoint=False, verbose=False)
        d = sim.dep_log[-1]
        events += (d["escounter"] + d["cellcrossings"]
                   + d["interactions"] + d["pellet_decays"])
    elapsed = time.time() - t0
    print(json.dumps({"cpu_events_per_s": events / elapsed,
                      "events": events, "elapsed_s": elapsed,
                      "npkts": npkts}))


if __name__ == "__main__":
    main()
