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
