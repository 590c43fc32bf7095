"""Benchmark: packet-events/s/chip on the classicmode workload.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

"Events" counts transport-kernel work the same way the reference's
stats counters do (stats.h:48-84): electron scatters + cell crossings +
interactions + pellet decays.

vs_baseline compares against the REFERENCE binary measured on this
host (refbuild/ spherical classicmode run, 15000 packets; counters
parsed from its own per-timestep log by tools/measure_reference.py):
  events_per_s_optimistic   = 1.386e6  (update_packets wall time only)
  events_per_s_conservative = 7.623e5  (incl. grid solve + output)
The artis_tpu number measured here includes the grid solve + table
build, so the conservative figure is the apples-to-apples baseline.

BENCH_CONFIG=grey selects the round-1 grey benchmark (baseline: the
same engine on the host CPU, tools/measure_cpu_baseline.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np

# reference sn3d (refbuild classic_sph run, this host, 2026-08-17):
# 60,983,488 events over 36 timesteps; tools/measure_reference.py
REF_EVENTS_PER_S = 7.623e5  # conservative (total wall time)
REF_EVENTS_PER_S_OPTIMISTIC = 1.386e6

# host-CPU baseline for the grey config (round 1, 4-vCPU host,
# npkts=200k, 24 shells; tools/measure_cpu_baseline.py)
BENCH_BASELINE_CPU_EVENTS_PER_S = 4.936e5

CLASSIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "refbuild", "run", "classic_sph")


def _events(d):
    return (d["escounter"] + d["cellcrossings"] + d["interactions"]
            + d["pellet_decays"])


def run_bench_classic():
    """Detailed-mode classicmode: the reference fixture model +
    synthetic atomic dataset, full opacity_case 4 kernel."""
    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data

    npkts = int(os.environ.get("BENCH_NPKTS", 500_000))
    cfg = read_input_txt(os.path.join(CLASSIC_DIR, "input-newrun.txt"))
    cfg.npkts = npkts
    cfg.mintemp, cfg.maxtemp = 3500.0, 140_000.0
    model = read_1d_model(os.path.join(CLASSIC_DIR, "model.txt"),
                          tmin=cfg.tmin, data_path=CLASSIC_DIR)
    model.elem_abund = read_abundances(
        os.path.join(CLASSIC_DIR, "abundances.txt"), model.ncells)
    atomic = read_atomic_data(CLASSIC_DIR)
    phixs = read_phixs_data(CLASSIC_DIR, atomic)
    sim = Simulation(model, cfg, atomic_data=atomic, phixs_data=phixs)

    # timestep 0 includes compilation
    sim.advance_one_timestep(checkpoint=False, verbose=False)
    t0 = time.time()
    events = 0
    for _ in range(3):
        sim.advance_one_timestep(checkpoint=False, verbose=False)
        events += _events(sim.dep_log[-1])
    eps = events / (time.time() - t0)
    return {
        "metric": ("packet-events/s/chip (classicmode detailed loop, "
                   f"{npkts} packets, vs reference sn3d on host)"),
        "value": round(eps, 1),
        "unit": "events/s",
        "vs_baseline": round(eps / REF_EVENTS_PER_S, 3),
    }


def run_bench_grey():
    from artis_tpu import SimConfig, Simulation, make_toy_1d_model

    npkts = int(os.environ.get("BENCH_NPKTS", 500_000))
    cfg = SimConfig(npkts=npkts, ntimesteps=12, tmin_days=3.0,
                    tmax_days=30.0, ftstep=12, opacity_case=0, seed=5)
    model = make_toy_1d_model(nshells=24, tmin=cfg.tmin)
    sim = Simulation(model, cfg)
    sim.advance_one_timestep(checkpoint=False, verbose=False)
    t0 = time.time()
    events = 0
    for _ in range(3):
        sim.advance_one_timestep(checkpoint=False, verbose=False)
        events += _events(sim.dep_log[-1])
    eps = events / (time.time() - t0)
    return {
        "metric": "packet-events/s/chip (grey rpkt+gamma loop)",
        "value": round(eps, 1),
        "unit": "events/s",
        "vs_baseline": round(eps / BENCH_BASELINE_CPU_EVENTS_PER_S, 3),
    }


def run_bench():
    mode = os.environ.get("BENCH_CONFIG", "classic")
    if mode == "grey" or not os.path.exists(
            os.path.join(CLASSIC_DIR, "adata.txt")):
        return run_bench_grey()
    return run_bench_classic()


def main():
    # the tunneled TPU occasionally wedges; retry with backoff and a
    # shrinking problem size so a result is always produced
    npkts_env = os.environ.get("BENCH_NPKTS")
    sizes = ([int(npkts_env)] * 3 if npkts_env
             else [500_000, 250_000, 100_000])
    last_err = None
    for attempt, npkts in enumerate(sizes):
        os.environ["BENCH_NPKTS"] = str(npkts)
        try:
            out = run_bench()
            print(json.dumps(out))
            return
        except Exception as e:  # noqa: BLE001
            last_err = e
            sys.stderr.write(f"bench attempt {attempt} (npkts={npkts}) "
                             f"failed: {e}\n")
            time.sleep(120)
    # TPU unreachable: fall back to the host CPU so the round still
    # records a real measurement (clearly labeled as the fallback)
    try:
        jax.config.update("jax_platforms", "cpu")
        os.environ["BENCH_NPKTS"] = "100000"
        out = run_bench()
        out["metric"] = "CPU-FALLBACK (TPU tunnel down) " + out["metric"]
        out["error"] = str(last_err)[:200]
        print(json.dumps(out))
        return
    except Exception as e2:  # noqa: BLE001
        last_err = e2
    print(json.dumps({
        "metric": "packet-events/s/chip (classicmode detailed loop)",
        "value": 0.0, "unit": "events/s", "vs_baseline": 0.0,
        "error": str(last_err)[:200],
    }))


if __name__ == "__main__":
    main()
