"""Non-instant alpha/beta particle deposition
(INSTANT_PARTICLE_DEPOSITION = false; do_nonthermal_predeposit,
update_packets.cc:16-69) and model initial-energy packets
(USE_MODEL_INITIAL_ENERGY; decay.cc:1383-1402, grid.cc:1206-1208)."""

import os

import numpy as np
import pytest

from artis_tpu import SimConfig, Simulation, read_1d_model
from artis_tpu.packets import TYPE_PRE_KPKT, to_numpy


def _write_rprocess_fixture(tmpdir: str):
    """A 4-shell ejecta dominated by a slow beta-minus nuclide (Sr89,
    meanlife 50.6 d) plus a little Ni56, with a model initial-energy
    'q' column (reference format, grid.cc:1080-1215)."""
    model = os.path.join(tmpdir, "model.txt")
    with open(model, "w") as f:
        f.write("4\n0.25\n")
        f.write("#inputcellid velocity_outer logrho X_Fegroup X_Ni56 "
                "X_Co56 X_Fe52 X_Cr48 X_Ni57 X_Co57 X_Sr89 q\n")
        for i, (v, lr) in enumerate(zip(
                [4000.0, 8000.0, 12000.0, 16000.0],
                [-11.2, -11.8, -12.4, -13.1])):
            f.write(f"{i + 1} {v} {lr} 1.0 0.05 0.0 0.0 0.0 0.0 0.0 "
                    f"0.4 {2.0e16}\n")
    # betaminusdecays.txt: A Z Q[MeV] E_gamma[MeV] E_beta[MeV]
    # E_nu[MeV] meanlife[s] (nucdata._read_betaminus_file)
    with open(os.path.join(tmpdir, "betaminusdecays.txt"), "w") as f:
        f.write("# A Z Q Egamma Ebeta Eneutrino meanlife\n")
        f.write("89 38 1.497 0.0062 0.583 0.908 4368384\n")
    return tmpdir


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    return _write_rprocess_fixture(str(tmp_path_factory.mktemp("rproc")))


def _run(fixture_dir, instant: bool, initial_energy: bool = False,
         seed: int = 99):
    cfg = SimConfig(npkts=4000, ntimesteps=6, tmin_days=0.5,
                    tmax_days=12.0, ftstep=6, opacity_case=0,
                    grey_op=0.05, seed=seed,
                    instant_particle_deposition=instant,
                    use_model_initial_energy=initial_energy,
                    compact_min_size=64)
    model = read_1d_model(os.path.join(fixture_dir, "model.txt"),
                          tmin=cfg.tmin, data_path=fixture_dir)
    sim = Simulation(model, cfg)
    sim.run(checkpoint=False, verbose=False)
    return sim


@pytest.fixture(scope="module")
def sim_instant(fixture_dir):
    return _run(fixture_dir, instant=True)


@pytest.fixture(scope="module")
def sim_gradual(fixture_dir):
    return _run(fixture_dir, instant=False)


def test_electron_deposition_happens(sim_instant, sim_gradual):
    for sim in (sim_instant, sim_gradual):
        edep = sum(d["electron_dep_Lsun"] for d in sim.dep_log)
        assert edep > 0


def test_gradual_deposit_is_delayed(sim_instant, sim_gradual):
    """With endot = 4e10 MeV/s * rho and rho ~ 1e-13 g/cm3 at day 1,
    a 0.58 MeV electron takes ~ E/endot ~ days to thermalise: the
    non-instant mode must shift electron deposition to later
    timesteps (do_nonthermal_predeposit, update_packets.cc:32-47)."""
    LSUN = 3.826e33
    w_in = [sim_instant.ts.width[d["ts"]] for d in sim_instant.dep_log]
    w_gr = [sim_gradual.ts.width[d["ts"]] for d in sim_gradual.dep_log]
    ein = [d["electron_dep_Lsun"] * LSUN * w
           for d, w in zip(sim_instant.dep_log, w_in)]
    egr = [d["electron_dep_Lsun"] * LSUN * w
           for d, w in zip(sim_gradual.dep_log, w_gr)]
    # same decays happen; the instant run deposits more in the first
    # half, the gradual run spreads it later
    half = len(ein) // 2
    assert sum(egr[:half]) < sum(ein[:half])
    # gradual deposition cannot exceed the emitted particle energy
    eemit = sum(d["electron_emission"] for d in sim_gradual.dep_log)
    assert sum(egr) <= eemit * (1 + 1e-5)
    # but some of it does thermalise within the run
    assert sum(egr) > 0


def test_initial_energy_packets(fixture_dir):
    """USE_MODEL_INITIAL_ENERGY: the q column adds TYPE_PRE_KPKT
    packets at tmin and raises etot (decay.cc:1383-1402)."""
    sim_off = _run(fixture_dir, instant=True, initial_energy=False,
                   seed=7)
    sim_on = _run(fixture_dir, instant=True, initial_energy=True,
                  seed=7)
    assert sim_on.etot > sim_off.etot * 1.02
    # the q-energy fraction of packets starts as PRE_KPKT at tmin
    arr = to_numpy(sim_on.packets)
    # after the run none remain PRE_KPKT, but the initial-energy
    # packets fed the thermal pool: r-packet escapes outnumber the
    # q=0 run's at fixed seed scale
    assert np.all(arr["ptype"] != TYPE_PRE_KPKT)


def test_initial_temperature_includes_q(fixture_dir):
    from artis_tpu import decay as decay_mod
    from artis_tpu.grid import (build_grid, assign_initial_temperatures)
    cfg = SimConfig(npkts=100, ntimesteps=4, tmin_days=0.5,
                    tmax_days=8.0, opacity_case=0, grey_op=0.1,
                    use_model_initial_energy=True)
    model = read_1d_model(os.path.join(fixture_dir, "model.txt"),
                          tmin=cfg.tmin, data_path=fixture_dir)
    dm = decay_mod.DecayModel(model.nuclide_table, model.initradioabund,
                              t_model=model.t_model)
    g_on = build_grid(model, cfg)
    assert g_on.init_energyq is not None
    assign_initial_temperatures(g_on, dm, cfg.tmin * 1.05, cfg)
    cfg_off = SimConfig(npkts=100, ntimesteps=4, tmin_days=0.5,
                        tmax_days=8.0, opacity_case=0, grey_op=0.1,
                        use_model_initial_energy=False)
    g_off = build_grid(model, cfg_off)
    assign_initial_temperatures(g_off, dm, cfg.tmin * 1.05, cfg_off)
    assert np.all(g_on.Te >= g_off.Te)
    assert np.any(g_on.Te > g_off.Te)


def test_pre_tmin_lucy_reduction(fixture_dir):
    """Pellets decaying before tmin become PRE_KPKT packets with
    e_cmf scaled by tdecay/tmin (Lucy 2004; update_packets.cc:117-130)
    — and must NOT also take the normal decay branch (the overdue-
    pellet clamp must not erase the reduction)."""
    import jax.numpy as jnp
    from artis_tpu.transport.kernel import _event_step, zero_estimators
    from artis_tpu.packets import TYPE_RADIOACTIVE_PELLET, TYPE_RPKT

    cfg = SimConfig(npkts=2000, ntimesteps=4, tmin_days=2.0,
                    tmax_days=12.0, ftstep=4, opacity_case=0,
                    grey_op=0.05, seed=3, compact_min_size=64)
    model = read_1d_model(os.path.join(fixture_dir, "model.txt"),
                          tmin=cfg.tmin, data_path=fixture_dir)
    sim = Simulation(model, cfg)
    arr0 = to_numpy(sim.packets)
    pre = ((arr0["tdecay"] < 1.0)
           & (arr0["ptype"] == TYPE_RADIOACTIVE_PELLET))
    assert pre.sum() > 50, "fixture should produce pre-tmin decays"
    tables = sim._place_tables(sim._tables(float(sim.ts.mid[0])))
    t2 = jnp.float32(sim.units.time_to_sim(
        float(sim.ts.start[0] + sim.ts.width[0])))
    est = zero_estimators(sim.grid.nmodel, 0, None)
    pk_out, est_out = _event_step(
        sim.packets, est, tables, sim.params, t2, True,
        sim.base_key, "spherical", sim.grid.ncoordgrid[0], False,
        False)
    arr1 = to_numpy(pk_out)
    # converted to (PRE_KPKT ->) r-packets with the reduced energy
    conv = pre & (arr1["ptype"] == TYPE_RPKT)
    assert conv.sum() > 50
    np.testing.assert_allclose(arr1["e_cmf"][conv],
                               (arr0["e_cmf"] * arr0["tdecay"])[conv],
                               rtol=1e-5)
    # and they are not double-counted as in-window decays
    assert int(est_out["pellet_decays"]) == int(
        ((arr0["tdecay"] > 1.0)
         & (arr0["tdecay"] <= float(t2))
         & (arr0["ptype"] == TYPE_RADIOACTIVE_PELLET)).sum())
