"""Profile the transport kernel: per-event-step wall time vs active
lanes, on the current default device (TPU chip or CPU).

Runs a classicmode-style detailed timestep and reports how the chunked
event loop spends its time — iterations, lanes after compaction, and
events/s — plus an optional jax.profiler trace for xprof/tensorboard.

Usage:
    python tools/profile_kernel.py [npkts] [--trace DIR]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    npkts = int(args[0]) if args else 100_000
    trace_dir = None
    if "--trace" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--trace") + 1]

    import jax
    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inputdir = os.path.join(here, "refbuild", "run", "classic_sph")
    cfg = read_input_txt(os.path.join(inputdir, "input-newrun.txt"))
    cfg.npkts = npkts
    cfg.mintemp, cfg.maxtemp = 3500.0, 140_000.0
    cfg.multibin_radfield_on = True
    cfg.radfield_nbins = 64
    cfg.data_path = inputdir
    model = read_1d_model(os.path.join(inputdir, "model.txt"),
                          tmin=cfg.tmin, data_path=inputdir)
    model.elem_abund = read_abundances(
        os.path.join(inputdir, "abundances.txt"), model.ncells)
    ad = read_atomic_data(inputdir)
    ph = read_phixs_data(inputdir, ad)
    sim = Simulation(model, cfg, atomic_data=ad, phixs_data=ph)

    print(f"device: {jax.devices()[0]}  npkts={npkts}  "
          f"lines={ad.nlines}", file=sys.stderr)

    # warm up (compile) with one timestep
    t0 = time.time()
    sim.advance_one_timestep(checkpoint=False, verbose=True)
    print(f"ts0 (incl. compile): {time.time() - t0:.1f}s",
          file=sys.stderr)

    ctx = (jax.profiler.trace(trace_dir) if trace_dir
           else _nullcontext())
    t0 = time.time()
    with ctx:
        sim.advance_one_timestep(checkpoint=False, verbose=True)
    wall = time.time() - t0
    d = sim.dep_log[-1]
    events = (d["escounter"] + d["cellcrossings"] + d["interactions"]
              + d["pellet_decays"])
    print(f"ts1: {wall:.2f}s  iters={d['iterations']}  "
          f"events={events}  events/s={events / wall:,.0f}")
    if trace_dir:
        print(f"trace written to {trace_dir}", file=sys.stderr)


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
