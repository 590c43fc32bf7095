"""3D kilonova-style end-to-end test: uniform cubic grid, Ye-dependent
grey opacities (opacity_case 5), relativistic Doppler option — the
analogue of the reference's kilonova CI configuration
(tests/setup_kilonova.sh + artisoptions_kilonova_lte.h)."""

import numpy as np
import pytest

from artis_tpu import SimConfig, Simulation, make_toy_3d_model
from artis_tpu.packets import TYPE_ESCAPE, TYPE_GAMMA, TYPE_RPKT, to_numpy


@pytest.fixture(scope="module")
def sim_done():
    cfg = SimConfig(npkts=800, ntimesteps=5, tmin_days=1.0,
                    tmax_days=8.0, ftstep=5, opacity_case=5,
                    seed=77, use_relativistic_doppler=True,
                    compact_min_size=64)
    model = make_toy_3d_model(ncoord=10, vmax=6.0e9, mtot_msun=0.05,
                              mni56_msun=0.01, t_model_days=0.5,
                              tmin=cfg.tmin)
    sim = Simulation(model, cfg)
    sim.run(checkpoint=False, verbose=False)
    return sim


def test_completes(sim_done):
    arr = to_numpy(sim_done.packets)
    t_end = sim_done.units.time_to_sim(sim_done.ts.end(4))
    done = (arr["ptype"] == TYPE_ESCAPE) | (arr["prop_time"]
                                            >= t_end * (1 - 1e-5))
    assert np.all(done)
    for k in ("pos", "nu_cmf", "e_cmf", "e_rf"):
        assert np.all(np.isfinite(arr[k])), k


def test_ye_opacities_applied(sim_done):
    g = sim_done.grid
    nz = g.rho_init > 0
    # Tanaka et al. (2020) table values only
    allowed = {19.5, 32.2, 22.3, 5.6, 5.36, 3.3, 0.96}
    vals = set(np.round(np.unique(g.kappagrey[nz]), 2))
    assert vals.issubset({round(v, 2) for v in allowed})


def test_escapes_through_cube_grid(sim_done):
    arr = to_numpy(sim_done.packets)
    esc = arr["ptype"] == TYPE_ESCAPE
    assert esc.sum() > 0
    # escaped packets are outside (or at the edge of) the expanding cube
    pos = arr["pos"][esc]
    t_esc = arr["escape_time"][esc]
    rmax_t = float(np.asarray(sim_done.packets.pos).dtype.type(0))
    vmax_sim = sim_done.grid.vmax / 2.99792458e10
    outside = np.max(np.abs(pos), axis=1) >= 0.98 * vmax_sim * t_esc
    assert outside.mean() > 0.95


def test_empty_corner_cells_free_stream(sim_done):
    # corner cells of the cube are outside the ejecta sphere: empty.
    g = sim_done.grid
    assert np.sum(g.rho_init == 0) > 0
    # estimators in empty cells must be zero
    assert np.all(sim_done.est_prev["J"][:g.nmodel][g.rho_init == 0]
                  == 0.0)


def test_deposition_positive(sim_done):
    dep = sim_done.dep_log
    assert any(d["gamma_dep_Lsun"] > 0 for d in dep)
    assert sum(d["pellet_decays"] for d in dep) > 0.5 * 800


def test_1d_model_on_uniform_3d_grid():
    """A 1D shell model propagated on the uniform 3D Cartesian grid
    (cfg.grid_force_uniform; map_1dmodeltogrid, grid.cc:910-940)
    reproduces the spherical-grid run's energetics to geometric
    discretisation accuracy: same total pellet energy (volume
    discretisation only) and matching deposition history."""
    from artis_tpu import make_toy_1d_model

    common = dict(npkts=4000, ntimesteps=5, tmin_days=2.0,
                  tmax_days=10.0, ftstep=5, opacity_case=0, seed=3,
                  compact_min_size=64)
    cfg1 = SimConfig(**common)
    s1 = Simulation(make_toy_1d_model(nshells=12, tmin=cfg1.tmin), cfg1)
    s1.run(checkpoint=False, verbose=False)

    cfg3 = SimConfig(**common, grid_force_uniform=True, grid_ncoord=14)
    s3 = Simulation(make_toy_1d_model(nshells=12, tmin=cfg3.tmin), cfg3)
    g = s3.grid
    # geometry: 14^3 propagation cells, 12 model shells, kept cells
    # fill the ejecta sphere (pi/6 of the cube to discretisation)
    assert g.ngrid == 14 ** 3 and g.nmodel == 12
    frac = g.cell_keep.sum() / g.ngrid
    assert abs(frac - np.pi / 6) < 0.05
    # model-cell volumes are assoc_cells x cube volume
    # (vol_init_modelcell, grid.cc:93-108)
    widval = float(g.wid[0])
    assert np.allclose(g.vol_init / widval**3,
                       np.round(g.vol_init / widval**3))
    # total pellet energy within volume-discretisation error
    assert abs(s3.etot / s1.etot - 1) < 0.05

    # the kernel geometry must follow the PROPAGATION grid: round 3
    # selected it by model.ndim, so this mode ran the spherical
    # boundary code against cube coordinates — packets walked cell+1
    # with frozen clocks (268M bogus crossings/ts in the kilonova_3d
    # validation run)
    assert s3._grid_static[0] == "uniform"

    s3.run(checkpoint=False, verbose=False)
    d1 = np.array([d["gamma_dep_Lsun"] + d["positron_dep_Lsun"]
                   for d in s1.dep_log])
    d3 = np.array([d["gamma_dep_Lsun"] + d["positron_dep_Lsun"]
                   for d in s3.dep_log])
    assert np.all(np.abs(d3 / d1 - 1) < 0.15)
    # crossing-count sanity: a 14^3 grid transit is ~3*14 crossings;
    # the broken geometry walked hundreds of cells per packet per ts
    cross_per_pkt_ts = (sum(d["cellcrossings"] for d in s3.dep_log)
                        / (4000 * len(s3.dep_log)))
    assert cross_per_pkt_ts < 100, cross_per_pkt_ts
    # radiation field per shell matches the spherical run (MC noise at
    # 4000 packets; inner shells carry few propagation cells)
    J1 = np.asarray(s1.est_prev["J"][:12])
    J3 = np.asarray(s3.est_prev["J"][:12])
    m = J1 > 0.05 * J1.max()
    assert np.median(np.abs(J3[m] / J1[m] - 1)) < 0.25
    assert np.all(np.isfinite(s3.grid.Te))
