"""Build a multi-zone variant of the nebularonezone fixture.

The reference's nebular CI fixture is a single-zone model
(tests/nebularonezone_inputfiles/model.txt), which makes the per-cell
Te/TR validation contracts near-vacuous: with one cell most entries sit
at the MINTEMP/MAXTEMP clamps on both sides (VERDICT r4 Weak #2). This
tool writes an N-shell 1D model with the SAME composition and epoch but
a density gradient, so the NLTE/SF/thermal solves produce a genuine
per-cell profile both codes must match.

Density: rho(v) ~ v^-3 (typical nebular-phase Ia profile), normalised
so the TOTAL mass equals the one-zone model's mass. Velocities span
[0.4, 1.25] x the one-zone outer velocity.

Usage:
  python tools/make_multizone_nebular.py SRC_RUNDIR DST_RUNDIR [N]

SRC_RUNDIR must hold the assembled one-zone run (model.txt,
abundances.txt + atomic/decay data); DST_RUNDIR gets copies of every
input with model.txt/abundances.txt replaced (reference model format:
read_1d_model, grid.cc:1228-1310).
"""

import os
import shutil
import sys

import numpy as np


def main():
    src = sys.argv[1]
    dst = sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    os.makedirs(dst, exist_ok=True)
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.isfile(p) and (f.endswith(".txt") or
                                  f.endswith(".dat")):
            shutil.copy(p, os.path.join(dst, f))

    with open(os.path.join(src, "model.txt")) as f:
        lines = f.read().splitlines()
    ncells_src = int(lines[0].split()[0])
    assert ncells_src == 1, "source must be the one-zone fixture"
    t_model_days = float(lines[1].split()[0])
    row = lines[2].split()
    v_outer = float(row[1])            # km/s
    logrho = float(row[2])             # log10 rho [g/cm^3] at t_model
    comps = row[3:]                    # X_Fegroup X_Ni56 X_Co56 ...

    rho0 = 10.0 ** logrho
    t_s = t_model_days * 86400.0
    r_out = v_outer * 1e5 * t_s
    m_tot = 4.0 / 3.0 * np.pi * r_out ** 3 * rho0

    v_edges = np.linspace(0.4 * v_outer, 1.25 * v_outer, n + 1)
    r_edges = v_edges * 1e5 * t_s
    vol = 4.0 / 3.0 * np.pi * np.diff(r_edges ** 3)
    v_mid = 0.5 * (v_edges[:-1] + v_edges[1:])
    w = v_mid ** -3.0
    # mass per shell ~ rho(v) * vol, normalised to the one-zone mass
    m_shell = w * vol
    m_shell *= m_tot / m_shell.sum()
    rho = m_shell / vol

    out = [str(n), f"{t_model_days:.9g}"]
    for i in range(n):
        out.append("  ".join(
            [f"{i + 1:4d}", f"{v_edges[i + 1]:.6e}",
             f"{np.log10(rho[i]):.6e}"] + comps))
    with open(os.path.join(dst, "model.txt"), "w") as f:
        f.write("\n".join(out) + "\n")

    with open(os.path.join(src, "abundances.txt")) as f:
        ab_row = f.readline().split()
    with open(os.path.join(dst, "abundances.txt"), "w") as f:
        for i in range(n):
            f.write("  ".join([f"{i + 1:4d}"] + ab_row[1:]) + "\n")

    shutil.copy(os.path.join(dst, "input-newrun.txt"),
                os.path.join(dst, "input.txt"))
    print(f"{dst}: {n} shells, v {v_edges[0]:.0f}-{v_edges[-1]:.0f} "
          f"km/s, log10 rho {np.log10(rho).min():.2f}"
          f"..{np.log10(rho).max():.2f}, total mass "
          f"{m_tot / 1.989e33:.3f} Msun (preserved)")


if __name__ == "__main__":
    main()
