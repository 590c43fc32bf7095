#!/usr/bin/env python
"""Write an AtomicData/PhixsData pair out in the reference ARTIS input
file formats, so the reference binary (built by refbuild/) and
artis_tpu can be run on IDENTICAL physics inputs for validation.

File formats (reference readers):
  compositiondata.txt  input.cc:757-800  (nelements, T_preset,
                       homogeneous flag; per element: Z nions
                       lowermost uppermost nlevelsmax abundance mass)
  adata.txt            input.cc:830-852,335-392  (per ion: "Z ionstage
                       nlevels ionpot_ev" then rows "index energy_ev
                       g ntransitions"; energies relative to the ion's
                       ground state; 1-based level index)
  transitiondata.txt   input.cc:881-926,394-482  (per ion: "Z ionstage
                       ntrans" then rows "lower upper A coll_str
                       forbidden", 1-based level indices)
  phixsdata_v2.txt     input.cc:235-333  (NPHIXSPOINTS, NPHIXSNUINCREMENT,
                       then per table: "Z upperionstage upperlevel
                       lowerionstage lowerlevel threshold_ev" + one
                       sigma[Mbarn] per line)

Usage: python tools/make_refdata.py OUTDIR [--seed N]
"""
from __future__ import annotations

import os
import sys

import numpy as np

# dataset generation is pure host work: force the CPU platform before
# any jax computation so this tool can never touch (and wedge on) the
# TPU tunnel while a run is active
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from artis_tpu.atomic import AtomicData  # noqa: E402
from artis_tpu.phixs import PhixsData  # noqa: E402

EV = 1.6021772e-12


def write_reference_atomicdata(ad: AtomicData, ph: PhixsData,
                               outdir: str) -> None:
    os.makedirs(outdir, exist_ok=True)

    # ---- compositiondata.txt ----
    with open(os.path.join(outdir, "compositiondata.txt"), "w") as f:
        f.write(f"{ad.nelements}\n")
        f.write("0\n")  # T_preset (must be <= 0, input.cc:995)
        f.write("0\n")  # homogeneous_abundances off
        for e in range(ad.nelements):
            s, en = int(ad.elem_ion_start[e]), int(ad.elem_ion_start[e + 1])
            nions = en - s
            lo_stage = int(ad.ion_stage[s])
            up_stage = int(ad.ion_stage[en - 1])
            mass_amu = float(ad.elem_mass[e]) / 1.66054e-24
            f.write(f"{int(ad.elem_z[e])} {nions} {lo_stage} {up_stage} "
                    f"-1 0.0 {mass_amu:.6f}\n")

    # ---- adata.txt + transitiondata.txt ----
    fa = open(os.path.join(outdir, "adata.txt"), "w")
    ft = open(os.path.join(outdir, "transitiondata.txt"), "w")
    for e in range(ad.nelements):
        z = int(ad.elem_z[e])
        s, en = int(ad.elem_ion_start[e]), int(ad.elem_ion_start[e + 1])
        energyoffset = 0.0
        for i in range(s, en):
            stage = int(ad.ion_stage[i])
            ls, le = (int(ad.ion_level_start[i]),
                      int(ad.ion_level_start[i + 1]))
            nlev = le - ls
            ionpot_ev = float(ad.ion_ionpot[i]) / EV
            fa.write(f"{z} {stage} {nlev} {ionpot_ev:.8f}\n")
            for k in range(nlev):
                rel_ev = float(ad.level_energy[ls + k]) / EV - energyoffset
                g = float(ad.level_g[ls + k])
                fa.write(f"{k + 1} {rel_ev:.10f} {g:.3f} 0\n")
            fa.write("\n")
            energyoffset += ionpot_ev

            # transitions of this ion, sorted by (lower, upper)
            mask = ((ad.line_lower >= ls) & (ad.line_lower < le)
                    & (ad.line_upper >= ls) & (ad.line_upper < le))
            idx = np.nonzero(mask)[0]
            lo = ad.line_lower[idx] - ls
            up = ad.line_upper[idx] - ls
            order = np.lexsort((up, lo))
            ft.write(f"{z} {stage} {len(idx)}\n")
            for j in order:
                li = idx[j]
                forb = int(bool(ad.line_forbidden[li]))
                cs = float(ad.line_coll_str[li])
                ft.write(f"{int(lo[j]) + 1} {int(up[j]) + 1} "
                         f"{float(ad.line_A[li]):.8e} {cs:.4f} {forb}\n")
            ft.write("\n")
    fa.close()
    ft.close()

    # ---- phixsdata_v2.txt ----
    with open(os.path.join(outdir, "phixsdata_v2.txt"), "w") as f:
        f.write(f"{ph.nphixspoints}\n")
        f.write(f"{ph.nuincrement:g}\n")
        for c in range(ph.ncont):
            l = int(ph.cont_level[c])
            ion = int(np.searchsorted(ad.ion_level_start, l,
                                      side="right")) - 1
            z = int(ad.elem_z[ad.ion_element[ion]])
            lower_stage = int(ad.ion_stage[ion])
            upper_stage = lower_stage + 1
            lowerlevel_1b = l - int(ad.ion_level_start[ion]) + 1
            upper_ion = int(ph.cont_upperion[c])
            upperlevel_1b = (int(ph.cont_upperlevel[c])
                             - int(ad.ion_level_start[upper_ion]) + 1)
            thresh_ev = float(ph.cont_nu_edge[c]) * 6.6260755e-27 / EV
            f.write(f"{z} {upper_stage} {upperlevel_1b} {lower_stage} "
                    f"{lowerlevel_1b} {thresh_ev:.8f}\n")
            for sig in np.asarray(ph.cont_sigma[c]):
                f.write(f"{sig * 1e18:.8e}\n")  # cm^2 -> Mbarn


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("outdir")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nlev", type=int, default=0,
                   help="levels per ion for a production-scale "
                        "linelist (e.g. 192 -> ~1.2e5 lines, the "
                        "reference's real regime, input.cc:1053-1065);"
                        " 0 = the small CI-scale dataset (1699 lines)")
    args = p.parse_args()

    from artis_tpu.atomic import make_synthetic_atomic_data
    from artis_tpu.phixs import make_hydrogenic_phixs

    if args.nlev > 0:
        ad = make_synthetic_atomic_data(
            seed=args.seed,
            elements=((14, 2, args.nlev), (26, 3, args.nlev),
                      (27, 3, args.nlev), (28, 3, args.nlev)))
    else:
        ad = make_synthetic_atomic_data(seed=args.seed)
    ph = make_hydrogenic_phixs(ad)
    write_reference_atomicdata(ad, ph, args.outdir)
    print(f"wrote reference-format dataset to {args.outdir}: "
          f"{ad.nelements} elements, {ad.nions_total} ions, "
          f"{ad.nlines} lines, {ph.ncont} continua")


if __name__ == "__main__":
    main()
