"""Reference-format 2D/3D model.txt readers (grid.cc:1372-1601)."""

import numpy as np

from artis_tpu.constants import DAY
from artis_tpu.model import (model_2d_to_3d, read_2d_model,
                             read_3d_model)


def _write_3d(path, nc, t_days, vmax, rho, ni56, ye=None, zyx=False):
    xmax = vmax * t_days * DAY
    cw = 2 * xmax / nc
    with open(path, "w") as f:
        f.write(f"{nc ** 3}\n{t_days}\n{vmax:e}\n")
        if ye is not None:
            f.write("#inputcellid pos_x_min pos_y_min pos_z_min rho "
                    "X_Fegroup X_Ni56 X_Co56 X_Fe52 X_Cr48 X_Ni57 "
                    "X_Co57 cellYe\n")
        for mgi in range(nc ** 3):
            p = [-xmax + cw * ((mgi // nc ** ax) % nc) for ax in range(3)]
            if zyx:
                p = p[::-1]
            f.write(f"{mgi + 1} {p[0]:e} {p[1]:e} {p[2]:e} {rho[mgi]:e}\n")
            extra = f" {ye[mgi]}" if ye is not None else ""
            f.write(f"0.5 {ni56[mgi]} 0.1 0 0 0 0{extra}\n")


def test_read_3d_roundtrip(tmp_path):
    nc, t_days, vmax = 4, 2.0, 1.5e9
    rng = np.random.default_rng(0)
    rho = rng.uniform(0.1, 1.0, nc ** 3)
    ni56 = rng.uniform(0, 0.6, nc ** 3)
    p = str(tmp_path / "model.txt")
    _write_3d(p, nc, t_days, vmax, rho, ni56)
    tmin = 4.0 * DAY
    m = read_3d_model(p, tmin=tmin)
    assert m.ncoord3d == (nc, nc, nc)
    assert np.isclose(m.vmax, vmax)
    np.testing.assert_allclose(m.rho, rho * (t_days * DAY / tmin) ** 3,
                               rtol=1e-6)
    ni_idx = m.nuclide_table.index(28, 56)
    np.testing.assert_allclose(m.initradioabund[:, ni_idx], ni56,
                               rtol=1e-6)


def test_read_3d_zyx_and_ye(tmp_path):
    nc = 3
    rho = np.ones(nc ** 3)
    ni56 = np.zeros(nc ** 3)
    ye = np.linspace(0.05, 0.45, nc ** 3)
    p = str(tmp_path / "model.txt")
    _write_3d(p, nc, 1.0, 1e9, rho, ni56, ye=ye, zyx=True)
    m = read_3d_model(p, tmin=1.0 * DAY)
    assert m.init_ye is not None
    np.testing.assert_allclose(m.init_ye, ye, rtol=1e-6)


def test_read_2d_and_resample(tmp_path):
    nr, nz, t_days, vmax = 4, 8, 1.0, 2e9
    rho2d = np.zeros(nr * nz)
    ni2d = np.zeros(nr * nz)
    for iz in range(nz):
        for ir in range(nr):
            rho2d[iz * nr + ir] = 1.0 / (1 + ir + abs(iz - nz / 2))
            ni2d[iz * nr + ir] = 0.3
    p = str(tmp_path / "model.txt")
    with open(p, "w") as f:
        f.write(f"{nr} {nz}\n{t_days}\n{vmax:e}\n")
        t_model = t_days * DAY
        dr = vmax * t_model / nr
        dz = 2 * vmax * t_model / nz
        for iz in range(nz):
            for ir in range(nr):
                i = iz * nr + ir
                r = (ir + 0.5) * dr
                z = -vmax * t_model + (iz + 0.5) * dz
                f.write(f"{i + 1} {r:e} {z:e} {rho2d[i]:e}\n")
                f.write(f"0.4 {ni2d[i]} 0 0 0\n")
    m2 = read_2d_model(p, tmin=2.0 * DAY)
    assert m2.ncoord2d == (nr, nz)
    np.testing.assert_allclose(m2.rho, rho2d * (0.5) ** 3, rtol=1e-6)

    m3 = model_2d_to_3d(m2, ncoord=10)
    assert m3.ndim == 3 and m3.ncoord3d == (10, 10, 10)
    # axisymmetry: rho invariant under rotation about z (x<->y swap)
    r3 = m3.rho.reshape(10, 10, 10)  # z, y, x (x fastest)
    np.testing.assert_allclose(r3, r3.transpose(0, 2, 1))
    # total mass approximately conserved under resampling
    t_model = t_days * DAY
    vol2d = np.zeros(nr * nz)
    for iz in range(nz):
        for ir in range(nr):
            vol2d[iz * nr + ir] = (np.pi * ((ir + 1) ** 2 - ir ** 2)
                                   * dr ** 2 * dz)
    mass2d = np.sum(rho2d * (0.5) ** 3 * vol2d * 8)  # at tmin=2d: vol*2^3
    cell3 = (2 * vmax * 2.0 * DAY / 10) ** 3
    mass3d = np.sum(m3.rho * cell3)
    assert abs(mass3d / mass2d - 1) < 0.2


def test_2d_model_runs_e2e(tmp_path):
    """A 2D model fed straight to Simulation propagates on the mapped
    3D cube (build_grid auto-resamples; grid.cc GRID_CYLINDRICAL2D
    analogue)."""
    from artis_tpu import SimConfig, Simulation

    nr, nz, t_days, vmax = 3, 6, 0.9, 2.0e9
    p = str(tmp_path / "model.txt")
    t_model = t_days * DAY
    dr = vmax * t_model / nr
    dz = 2 * vmax * t_model / nz
    with open(p, "w") as f:
        f.write(f"{nr} {nz}\n{t_days}\n{vmax:e}\n")
        for iz in range(nz):
            for ir in range(nr):
                i = iz * nr + ir
                r = (ir + 0.5) * dr
                z = -vmax * t_model + (iz + 0.5) * dz
                f.write(f"{i + 1} {r:e} {z:e} 1e-12\n")
                f.write("0.9 0.4 0 0 0\n")
    m2 = read_2d_model(p, tmin=1.0 * DAY)
    cfg = SimConfig(npkts=500, ntimesteps=3, tmin_days=1.0,
                    tmax_days=6.0, ftstep=3, opacity_case=0,
                    grey_op=0.08, seed=5, compact_min_size=64)
    sim = Simulation(m2, cfg)
    assert sim.grid.ndim == 3
    sim.run(checkpoint=False, verbose=False)
    assert sum(d["pellet_decays"] for d in sim.dep_log) > 0


def test_ye_file_override(tmp_path):
    """Ye.txt overrides the per-cell initial electron fraction
    (read_possible_yefile, grid.cc:528-553) and drives the Tanaka
    opacity table in opacity_case 5."""
    import numpy as np
    from artis_tpu import SimConfig, make_toy_1d_model
    from artis_tpu.model import apply_ye_file, read_ye_file
    from artis_tpu.grid import build_grid

    cfg = SimConfig(npkts=10, ntimesteps=2, tmin_days=2.0,
                    tmax_days=4.0, ftstep=2, opacity_case=5)
    model = make_toy_1d_model(nshells=4, tmin=cfg.tmin)
    yef = tmp_path / "Ye.txt"
    # rows: cells 1 and 3 (1-based), plus an ignored out-of-range row
    yef.write_text("3\n1 0.05\n3 0.32\n99 0.5\n")
    ye = read_ye_file(str(yef), model.ncells)
    assert ye[0] == 0.05 and ye[2] == 0.32 and ye[1] == -1.0
    apply_ye_file(model, str(yef))
    g = build_grid(model, cfg)
    # Tanaka et al. 2020 table 1: Ye<=0.1 -> 19.5; 0.3<Ye<=0.35 -> 3.3
    assert g.kappagrey[0] == 19.5
    assert g.kappagrey[2] == 3.3


def test_gridcontributions_reader(tmp_path):
    from artis_tpu.model import read_gridcontributions
    f = tmp_path / "gridcontributions.txt"
    f.write_text(
        "particleid cellindex frac_of_cellmass "
        "frac_of_cellmass_includemissing\n"
        "124824 1 0.9073 0.9073\n130686 2 0.0004 0.0005\n")
    gc = read_gridcontributions(str(f))
    assert gc["particleid"].tolist() == [124824, 130686]
    assert gc["cellindex"].tolist() == [0, 1]  # converted to 0-based
    assert gc["frac_of_cellmass_includemissing"][1] == 0.0005
