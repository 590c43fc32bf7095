"""Run the nebularonezone configuration from reference-format inputs.

The reference's nebular test (tests/setup_nebularonezone.sh +
artisoptions_nltenebular.h): one-zone ejecta at 170-230 days with full
NLTE populations, Spencer-Fano non-thermal deposition, multibin
radiation field and detailed bf estimators.

Usage:
    python examples/nebularonezone.py <inputdir> [outdir]
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
    outdir = sys.argv[2] if len(sys.argv) > 2 else "out_nebular"

    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import read_atomic_data
    from artis_tpu.phixs import read_phixs_data

    # prefer the pristine input-newrun.txt: after a reference run the
    # in-place input.txt has itstep rewritten for its OWN restart
    # (update_parameterfile, input.cc:2143), which would cold-start us
    # mid-run
    path = os.path.join(inputdir, "input-newrun.txt")
    if not os.path.exists(path):
        path = os.path.join(inputdir, "input.txt")
    cfg = read_input_txt(path)
    cfg.npkts = int(os.environ.get("NPKTS", 15_000))
    if "FTSTEP" in os.environ:
        cfg.ftstep = int(os.environ["FTSTEP"])
    # nltenebular variant options at CI test scale
    # (tests/setup_nebularonezone.sh:17-29); the multi-zone validation
    # pair widens the clamp range on both sides (refbuild
    # build_reference.sh MINTEMP/MAXTEMP overrides) so the Te/TR
    # contracts measure the solvers rather than the clamps
    cfg.mintemp = float(os.environ.get("MINTEMP", 2000.0))
    cfg.maxtemp = float(os.environ.get("MAXTEMP", 10_000.0))
    cfg.nonthermal_on = True
    cfg.nlte_pops_on = True
    cfg.multibin_radfield_on = True
    cfg.radfield_nbins = 64
    cfg.detailed_bf_estimators = True
    # the refbuild validation build lowers the NLTE-radfield activation
    # gates so the 10-timestep fixture exercises the multibin machinery
    # (build_reference.sh: FIRST_NLTE_RADFIELD_TIMESTEP=7,
    # DETAILED_BF_ESTIMATORS_USEFROMTIMESTEP=7; stock nltenebular
    # values are 12/13, artisoptions_nltenebular.h:99,119)
    cfg.first_nlte_radfield_ts = int(
        os.environ.get("FIRST_NLTE_RADFIELD_TS", 7))
    cfg.detailed_bfest_from_ts = int(
        os.environ.get("DETAILED_BFEST_FROM_TS", 7))
    cfg.sf_points = int(os.environ.get("SFPTS", 512))
    # the reference CI nebular test disables the Auger contribution
    # (setup_nebularonezone.sh: SF_AUGER_CONTRIBUTION_ON false)
    cfg.sf_auger_on = False
    # nltenebular defines NO_INITIAL_PACKETS: decays are sampled only
    # within [tmin, tmax] — no pre-tmin Lucy packets
    # (artisoptions_nltenebular.h:52; setup_radioactive_pellet,
    # decay.cc tdecaymin branch)
    cfg.initial_packets = False
    # nltenebular UVOIR frequency range (artisoptions_nltenebular.h:85)
    cfg.nu_min_r = 1e13
    cfg.nu_max_r = 5e15
    if cfg.data_path is None:
        cfg.data_path = inputdir

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
          f"{model.ncells} cell(s); NLTE+SF nebular mode")

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
