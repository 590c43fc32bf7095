"""Run a classicmode-style simulation from reference-format inputs.

Usage:
    python examples/classicmode.py <inputdir> [outdir]

``inputdir`` must contain input-newrun.txt, model.txt, abundances.txt (the
layout of the reference's tests/classicmode_inputfiles). If the
directory also contains the atomic dataset (adata.txt,
compositiondata.txt, transitiondata.txt, phixsdata_v2.txt) it is used;
otherwise the bundled synthetic atomic dataset stands in (the real
dataset is an external download in the reference's CI too).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    if os.environ.get("FORCE_CPU", "0") == "1":
        # must run before any jax computation (jax is pre-imported
        # with the TPU platform in this environment)
        import jax
        jax.config.update("jax_platforms", "cpu")
    inputdir = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "out_classicmode"

    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import make_synthetic_atomic_data, read_atomic_data

    # prefer the pristine input-newrun.txt: after a reference run the
    # in-place input.txt has itstep rewritten for its OWN restart
    # (update_parameterfile, input.cc:2143), which would cold-start us
    # mid-run
    path = os.path.join(inputdir, "input-newrun.txt")
    if not os.path.exists(path):
        path = os.path.join(inputdir, "input.txt")
    cfg = read_input_txt(path)
    # keep runs tractable out of the box; raise for production
    cfg.npkts = int(os.environ.get("NPKTS", 50_000))
    if "FTSTEP" in os.environ:
        cfg.ftstep = int(os.environ["FTSTEP"])
    # classic-variant temperature bounds (artisoptions_classic.h:57-58)
    cfg.mintemp = 3500.0
    cfg.maxtemp = 140_000.0
    # multibin radfield + raw-estimator rates: the analogue of the
    # reference's transport-accumulated LUT gamma/bfheating
    # estimators (rpkt.cc:557-621) — the photoionisation and
    # bf-heating integrals run over the measured binned J instead of
    # the fullspec Planck fit
    # MULTIBIN=0 selects the fullspec dilute-fit rate integrals
    # instead — the like-for-like partner of a reference
    # NO_LUT_PHOTOION/NO_LUT_BFHEATING build with
    # MULTIBIN_RADFIELD_MODEL_ON=false (ratecoeff.cc:1184,
    # thermalbalance.cc:141 over the fullspec W,T_R fit)
    cfg.multibin_radfield_on = os.environ.get("MULTIBIN", "1") != "0"
    cfg.radfield_nbins = int(os.environ.get("RADFIELD_NBINS", 64))
    # classic runs the LUT transport estimators from the first NLTE
    # timestep on; the multibin stand-in activates there too
    cfg.first_nlte_radfield_ts = cfg.num_lte_timesteps
    cfg.detailed_bfest_from_ts = cfg.num_lte_timesteps
    if cfg.data_path is None:
        cfg.data_path = inputdir  # collion/auger/decay data files

    # observer virtual-packet spectra: enabled when the run directory
    # provides a reference-format vpkt.txt (read_parameterfile_vpkt,
    # vpkt.cc:667; the reference gates this behind the VPKT_ON
    # compile-time option)
    vp = os.path.join(inputdir, "vpkt.txt")
    if os.path.exists(vp):
        from artis_tpu.config import read_vpkt_txt
        read_vpkt_txt(vp, cfg)
        cfg.polarization_on = True
        print(f"vpkt: {len(cfg.vpkt_obs)} observer(s), "
              f"tau_max={cfg.vpkt_tau_max}")

    model = read_1d_model(os.path.join(inputdir, "model.txt"),
                          tmin=cfg.tmin, data_path=cfg.data_path)
    ab_path = os.path.join(inputdir, "abundances.txt")
    if os.path.exists(ab_path):
        model.elem_abund = read_abundances(ab_path, model.ncells)

    atomic = None
    phixs = None
    if cfg.opacity_case >= 4:
        if os.path.exists(os.path.join(inputdir, "adata.txt")):
            atomic = read_atomic_data(inputdir)
            print(f"atomic dataset: {atomic.nlines} lines, "
                  f"{atomic.nlevels_total} levels")
            if os.path.exists(os.path.join(inputdir, "phixsdata_v2.txt")):
                from artis_tpu.phixs import read_phixs_data
                phixs = read_phixs_data(inputdir, atomic)
                print(f"phixs dataset: {phixs.ncont} continua")
        else:
            atomic = make_synthetic_atomic_data()
            print("using synthetic atomic dataset "
                  f"({atomic.nlines} lines)")

    sim = Simulation(model, cfg, out_dir=outdir, atomic_data=atomic,
                     phixs_data=phixs)
    print(f"etot = {sim.etot:.4e} erg over "
          f"[{cfg.tmin_days}, {cfg.tmax_days}] d; "
          f"{model.ncells} shells; opacity_case {cfg.opacity_case}")

    # job-step resume (the reference's gridsave/packets .tmp restart,
    # sn3d.cc:519-522): pick up from the latest checkpoint in outdir
    cps = sorted(
        (f for f in (os.listdir(outdir) if os.path.isdir(outdir) else ())
         if f.startswith("checkpoint_ts") and f.endswith(".npz")),
        key=lambda f: int(f[len("checkpoint_ts"):-len(".npz")]))
    if cps and os.environ.get("RESUME", "1") != "0":
        path = os.path.join(outdir, cps[-1])
        sim.load_checkpoint(path)
        print(f"resumed from {path} (next timestep {sim.nts_done})")

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
