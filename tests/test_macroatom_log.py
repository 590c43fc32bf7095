"""LOG_MACROATOM per-deactivation log (macroatom.cc:677-683, 905-918):
with cfg.log_macroatom, every radiative bb deactivation appends a row
to macroatom.out with the activation snapshot and jump count."""

import os

import numpy as np

from artis_tpu import SimConfig, Simulation, make_toy_1d_model
from artis_tpu.atomic import make_synthetic_atomic_data


def test_macroatom_log_rows(tmp_path):
    cfg = SimConfig(npkts=2000, ntimesteps=3, tmin_days=4.0,
                    tmax_days=12.0, ftstep=3, opacity_case=4,
                    seed=21, num_grey_timesteps=0, num_lte_timesteps=9,
                    log_macroatom=True, ma_log_cap=8192,
                    compact_min_size=64)
    model = make_toy_1d_model(nshells=6, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad, out_dir=str(tmp_path))
    sim.run(verbose=False, checkpoint=False)

    n_bb = sum(d.get("ma_deact_rad", 0) for d in sim.dep_log)
    path = tmp_path / "macroatom.out"
    assert path.exists()
    with open(path) as f:
        header = f.readline()
        rows = [ln.split() for ln in f if ln.strip()]
    assert header.startswith("timestep")
    # ma_deact_rad counts bb + fb; the log covers bb deactivations
    n_bb_only = sum(d.get("ma_deact_rad", 0) for d in sim.dep_log)
    assert 0 < len(rows) <= n_bb_only
    a = np.array(rows, dtype=float)
    assert a.shape[1] == 13
    # timestep, mgi, Z, ionstages, levels, jumps are sane
    assert np.all((a[:, 0] >= 0) & (a[:, 0] < 3))
    assert np.all((a[:, 1] >= 0) & (a[:, 1] < 6))
    assert np.all(a[:, 2] > 0)          # element Z
    assert np.all(a[:, 3] >= 1)         # ionstage_in
    assert np.all(a[:, 12] >= 0)        # jumps
    # frequencies positive; emission nu_rf consistent with nu_cmf to
    # the Doppler factor scale
    assert np.all(a[:, 8:12] > 0)
    assert np.all(np.abs(a[:, 9] / a[:, 11] - 1) < 0.2)


def test_macroatom_log_off_by_default(tmp_path):
    cfg = SimConfig(npkts=400, ntimesteps=2, tmin_days=4.0,
                    tmax_days=10.0, ftstep=2, opacity_case=4,
                    seed=5, num_grey_timesteps=0,
                    compact_min_size=64)
    model = make_toy_1d_model(nshells=4, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad, out_dir=str(tmp_path))
    sim.run(verbose=False, checkpoint=False)
    assert not (tmp_path / "macroatom.out").exists()
