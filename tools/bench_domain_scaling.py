"""Domain-decomposition scaling curve on the virtual CPU mesh.

Runs the detailed classicmode fixture through the REAL driver with
grid domain decomposition (domain.py: per-cell tables sharded over the
'dd' mesh axis, sorted capacity-bounded all-to-all migration) at 1, 2,
4 and 8 virtual devices and records per-timestep events/s and the
migration round count.

Caveat recorded in the JSON: virtual devices share one host CPU, so
absolute events/s does NOT measure ICI scaling — the meaningful
quantities are the migration ROUND counts (communication efficiency of
the all-to-all protocol) and the exactness already pinned by
tests/test_domain.py. Real multi-chip hardware is unavailable in this
environment (BASELINE.md).

Usage (the driver forces the virtual mesh itself):
    python tools/bench_domain_scaling.py [--npkts 20000] [--nsteps 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_one(ndev: int, npkts: int, nsteps: int) -> dict:
    import numpy as np
    from artis_tpu import (Simulation, read_input_txt, read_1d_model,
                           read_abundances)
    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = os.path.join(here, "refbuild", "run", "classic_sph")
    cfg = read_input_txt(os.path.join(d, "input-newrun.txt"))
    cfg.npkts = npkts
    cfg.mintemp, cfg.maxtemp = 3500.0, 140_000.0
    model = read_1d_model(os.path.join(d, "model.txt"), tmin=cfg.tmin,
                          data_path=d)
    model.elem_abund = read_abundances(
        os.path.join(d, "abundances.txt"), model.ncells)
    ad = read_atomic_data(d)
    ph = read_phixs_data(d, ad)
    sim = Simulation(model, cfg, atomic_data=ad, phixs_data=ph,
                     n_devices=ndev, domain_decomp=(ndev > 1))
    # compile + first timestep
    t0 = time.time()
    sim.advance_one_timestep(checkpoint=False, verbose=False)
    t_first = time.time() - t0
    rounds = [int(getattr(sim, "_dd_rounds", 0))]
    stats = [dict(getattr(sim, "_dd_stats", {}))]
    events = 0
    t0 = time.time()
    for _ in range(nsteps):
        sim.advance_one_timestep(checkpoint=False, verbose=False)
        rounds.append(int(getattr(sim, "_dd_rounds", 0)))
        stats.append(dict(getattr(sim, "_dd_stats", {})))
        dlog = sim.dep_log[-1]
        events += (dlog["escounter"] + dlog["cellcrossings"]
                   + dlog["interactions"] + dlog["pellet_decays"])
    wall = time.time() - t0
    return {"ndev": ndev, "npkts": npkts,
            "timesteps_measured": nsteps,
            "first_ts_s": round(t_first, 1),
            "wall_s": round(wall, 1),
            "events": int(events),
            "events_per_s": round(events / wall, 1),
            "migration_rounds_per_ts": rounds[1:],
            "rounds_ts0": rounds[0],
            "migration_stats_per_ts": stats[1:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npkts", type=int, default=20_000)
    ap.add_argument("--nsteps", type=int, default=2)
    ap.add_argument("--ndev", type=int, nargs="*",
                    default=[1, 2, 4, 8])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # each mesh size needs its own device count; re-exec per size
    if "BENCH_DD_CHILD" in os.environ:
        ndev = int(os.environ["BENCH_DD_CHILD"])
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps(run_one(ndev, args.npkts, args.nsteps)),
              flush=True)
        return

    import subprocess
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.out or os.path.join(here, "DD_SCALING.json")
    out = {
        "config": "classicmode detailed (refbuild classic_sph)",
        "note": ("virtual CPU devices share one host: events/s is an "
                 "upper bound on protocol overhead only, NOT an ICI "
                 "scaling measurement (no multi-chip hardware, "
                 "BASELINE.md); migration rounds per timestep are the "
                 "hardware-independent communication-cost metric"),
        "results": [],
    }
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            out["results"] = [r for r in prev.get("results", [])
                              if r.get("ndev") not in args.ndev]
        except (json.JSONDecodeError, OSError):
            pass
    for ndev in args.ndev:
        env = dict(os.environ)
        env["BENCH_DD_CHILD"] = str(ndev)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                            f" --xla_force_host_platform_device_count="
                            f"{ndev}")
        try:
            res = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--npkts", str(args.npkts), "--nsteps",
                 str(args.nsteps)],
                capture_output=True, text=True, env=env,
                timeout=int(os.environ.get("BENCH_DD_TIMEOUT", 5400)))
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"ndev={ndev}: timed out\n")
            continue
        line = [ln for ln in res.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            sys.stderr.write(f"ndev={ndev} failed:\n"
                             + (res.stderr or "")[-500:] + "\n")
            continue
        r = json.loads(line[-1])
        out["results"].append(r)
        print(json.dumps(r), flush=True)
        # write incrementally: a later size timing out must not lose
        # the completed measurements
        out["results"].sort(key=lambda r: r["ndev"])
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
