"""Run the kilonova configuration from reference-format inputs.

The reference's kilonova test (tests/setup_kilonova.sh +
artisoptions_kilonova_lte.h): 1D SFHo neutron-star-merger ejecta at
0.4-10 days, LTE populations with full Sobolev line transport
(opacity_case 4), relativistic Doppler, model initial-energy packets
(USE_MODEL_INITIAL_ENERGY) and non-instant alpha/beta particle
deposition (INSTANT_PARTICLE_DEPOSITION = false).

Usage:
    python examples/kilonova.py <inputdir> [outdir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    if os.environ.get("FORCE_CPU", "0") == "1":
        # must run before any jax computation (jax is pre-imported
        # with the TPU platform in this environment)
        import jax
        jax.config.update("jax_platforms", "cpu")
    inputdir = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "out_kilonova"

    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data

    path = os.path.join(inputdir, "input-newrun.txt")
    if not os.path.exists(path):
        path = os.path.join(inputdir, "input.txt")
    cfg = read_input_txt(path)
    # the reference CI runs MPKTS 40000 per rank (setup_kilonova.sh)
    cfg.npkts = int(os.environ.get("NPKTS", 40_000))
    if "FTSTEP" in os.environ:
        cfg.ftstep = int(os.environ["FTSTEP"])
    # kilonova_lte variant options at CI test scale
    # (tests/setup_kilonova.sh:21-27, artisoptions_kilonova_lte.h)
    cfg.mintemp = 1000.0
    cfg.maxtemp = 20_000.0
    cfg.use_relativistic_doppler = True
    # alpha/beta particles lose kinetic energy along their track
    # instead of depositing instantly (INSTANT_PARTICLE_DEPOSITION =
    # false; do_nonthermal_predeposit, update_packets.cc:16-69)
    cfg.instant_particle_deposition = False
    # the model's q column contributes initial thermal packets at tmin
    # (USE_MODEL_INITIAL_ENERGY; decay.cc:1383-1402)
    cfg.use_model_initial_energy = True
    # kilonova UVOIR frequency range (artisoptions_kilonova_lte.h)
    cfg.nu_min_r = 1e13
    cfg.nu_max_r = 5e16
    if cfg.data_path is None:
        cfg.data_path = inputdir
    # GRID_3D=1 propagates the 1D model on the uniform 3D Cartesian
    # grid — the reference's default kilonova mode
    # (GRID_TYPE=GRID_UNIFORM, map_1dmodeltogrid grid.cc:910)
    if os.environ.get("GRID_3D", "0") == "1":
        cfg.grid_force_uniform = True
        cfg.grid_ncoord = int(os.environ.get("GRID_NCOORD", 50))

    model = read_1d_model(os.path.join(inputdir, "model.txt"),
                          tmin=cfg.tmin, data_path=cfg.data_path)
    ab_path = os.path.join(inputdir, "abundances.txt")
    if os.path.exists(ab_path):
        model.elem_abund = read_abundances(ab_path, model.ncells)

    atomic = read_atomic_data(inputdir)
    phixs = read_phixs_data(inputdir, atomic)
    print(f"atomic dataset: {atomic.nlines} lines, "
          f"{phixs.ncont} continua")

    sim = Simulation(model, cfg, out_dir=outdir, atomic_data=atomic,
                     phixs_data=phixs)
    print(f"etot = {sim.etot:.4e} erg over "
          f"[{cfg.tmin_days}, {cfg.tmax_days}] d; "
          f"{model.ncells} shell(s); kilonova LTE mode")

    cps = sorted(
        (f for f in (os.listdir(outdir) if os.path.isdir(outdir) else ())
         if f.startswith("checkpoint_ts") and f.endswith(".npz")),
        key=lambda f: int(f[len("checkpoint_ts"):-len(".npz")]))
    if cps and os.environ.get("RESUME", "1") != "0":
        p = os.path.join(outdir, cps[-1])
        sim.load_checkpoint(p)
        print(f"resumed from {p} (next timestep {sim.nts_done})")

    # walltime-limited job-step mode (the reference's `sn3d -w hours`
    # + RESTART_NEEDED resubmit protocol, sn3d.cc:420-451, 1102-1106);
    # scripts/artis-tpu-slurm.sh resubmits on this marker
    wt_h = os.environ.get("WALLTIME_HOURS")
    done = sim.run(walltime_limit_s=(float(wt_h) * 3600.0
                                     if wt_h else None))
    if not done:
        print("RESTART_NEEDED to continue model")
        sys.exit(93)
    print(f"outputs written to {outdir}/")


if __name__ == "__main__":
    main()
