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
    inputdir = sys.argv[1]
    outdir = sys.argv[2] if len(sys.argv) > 2 else "out_classicmode"

    from artis_tpu import (SimConfig, Simulation, read_input_txt,
                           read_1d_model, read_abundances)
    from artis_tpu.atomic import make_synthetic_atomic_data, read_atomic_data

    path = os.path.join(inputdir, "input.txt")
    if not os.path.exists(path):
        path = os.path.join(inputdir, "input-newrun.txt")
    cfg = read_input_txt(path)
    # keep runs tractable out of the box; raise for production
    cfg.npkts = int(os.environ.get("NPKTS", 50_000))
    if "FTSTEP" in os.environ:
        cfg.ftstep = int(os.environ["FTSTEP"])

    model = read_1d_model(os.path.join(inputdir, "model.txt"),
                          tmin=cfg.tmin, data_path=cfg.data_path)
    ab_path = os.path.join(inputdir, "abundances.txt")
    if os.path.exists(ab_path):
        model.elem_abund = read_abundances(ab_path, model.ncells)

    atomic = None
    if cfg.opacity_case >= 4:
        if os.path.exists(os.path.join(inputdir, "adata.txt")):
            atomic = read_atomic_data(inputdir)
            print(f"atomic dataset: {atomic.nlines} lines, "
                  f"{atomic.nlevels_total} levels")
        else:
            atomic = make_synthetic_atomic_data()
            print("using synthetic atomic dataset "
                  f"({atomic.nlines} lines)")

    sim = Simulation(model, cfg, out_dir=outdir, atomic_data=atomic)
    print(f"etot = {sim.etot:.4e} erg over "
          f"[{cfg.tmin_days}, {cfg.tmax_days}] d; "
          f"{model.ncells} shells; opacity_case {cfg.opacity_case}")
    sim.run()
    print(f"outputs written to {outdir}/")


if __name__ == "__main__":
    main()
