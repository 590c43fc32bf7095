"""End-to-end detailed (opacity_case 4) simulation on the synthetic
atomic dataset: full chain pellet -> gamma -> deposition -> k-packet
cooling channels -> macro-atom line transfer -> escape."""

import numpy as np
import pytest

from artis_tpu import SimConfig, Simulation, make_toy_1d_model
from artis_tpu.atomic import make_synthetic_atomic_data
from artis_tpu.packets import TYPE_ESCAPE, TYPE_RPKT, to_numpy


@pytest.fixture(scope="module")
def sim_done():
    # num_grey_timesteps=2: the first two timesteps treat the (tau >>
    # 10) inner cells grey like reference classic runs do, so detailed
    # macro-atom transport is exercised at days ~8-13 where it is the
    # physically dominant regime (and the test stays fast)
    cfg = SimConfig(npkts=1500, ntimesteps=5, tmin_days=3.0,
                    tmax_days=14.0, ftstep=5, opacity_case=4,
                    grey_op=0.1, seed=23, num_grey_timesteps=2,
                    cell_is_optically_thick=8.0,
                    compact_min_size=64)
    model = make_toy_1d_model(nshells=8, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad)
    sim.run(checkpoint=False, verbose=False)
    return sim


def test_completes_and_processes_all(sim_done):
    arr = to_numpy(sim_done.packets)
    t_end = sim_done.units.time_to_sim(sim_done.ts.end(4))
    done = (arr["ptype"] == TYPE_ESCAPE) | (arr["prop_time"]
                                            >= t_end * (1 - 1e-5))
    assert np.all(done)
    for k in ("pos", "nu_cmf", "e_cmf"):
        assert np.all(np.isfinite(arr[k])), k


def test_macroatom_was_active(sim_done):
    total_act = sum(d["ma_activations"] for d in sim_done.dep_log)
    total_rad = sum(d["ma_deact_rad"] for d in sim_done.dep_log)
    assert total_act > 0
    assert total_rad > 0
    # deactivations cannot exceed activations + kpkt-sourced MAs
    assert total_rad <= total_act + sum(
        d["ma_deact_col"] + d["ma_jumps"] for d in sim_done.dep_log)


def test_nne_from_saha(sim_done):
    g = sim_done.grid
    assert np.all(g.nne[g.rho_init > 0] > 0)
    # free nne cannot exceed the total electron density
    assert np.all(g.nne <= g.nnetot * 1.001)


def test_rpkt_spectrum_produced(sim_done):
    spec = sim_done.build_spectra(TYPE_RPKT)
    assert spec.lum.max() > 0
    assert np.all(np.isfinite(spec.flux))


def test_emission_absorption_attribution(sim_done):
    """Every escaped r-packet's flux is attributed to an emission
    process; the per-process emission spectra sum back to the total
    spectrum (add_to_spec emission part, spectrum.cc:363-420)."""
    from artis_tpu import spectra as spectra_mod
    from artis_tpu.packets import EMTYPE_NOTSET

    esc = spectra_mod.select_escaped(sim_done.escaped_arrays_cgs(), 11)
    assert len(esc["e_rf"]) > 0
    # every escaped r-packet carries a concrete emission type
    assert np.all(esc["emissiontype"] != EMTYPE_NOTSET)

    cfg = sim_done.cfg
    em, ab, names = spectra_mod.build_emission_absorption(
        esc, sim_done.ts, cfg.nu_min_r, cfg.nu_max_r, 200,
        sim_done.atomic_data, sim_done.phixs)
    spec = spectra_mod.build_spectra(esc, sim_done.ts, cfg.nu_min_r,
                                     cfg.nu_max_r, 200,
                                     vmax=sim_done.grid.vmax)
    ad = sim_done.atomic_data
    assert len(names) == 2 * ad.nions_total + 2
    # nothing lands in the "other" bucket
    assert em[:, :, -1].sum() == 0.0
    np.testing.assert_allclose(em.sum(axis=2), spec.flux, rtol=1e-5,
                               atol=spec.flux.max() * 1e-8)
    # bound-bound absorption events were recorded
    assert np.any(esc["absorptiontype"] >= 0)
    assert ab.sum() > 0


def test_track_ion_stats():
    """TRACK_ION_STATS (stats.h:12-45): per-(cell, ion) energy-flow
    estimators accumulate during detailed transport; the filled
    in/out totals must be consistent with the MA event counters and
    the rows appear in estimators_0000.out."""
    import os
    from artis_tpu import SimConfig, Simulation, make_toy_1d_model
    from artis_tpu.atomic import make_synthetic_atomic_data

    cfg = SimConfig(npkts=800, ntimesteps=3, tmin_days=3.0,
                    tmax_days=10.0, ftstep=3, opacity_case=4, seed=17,
                    num_grey_timesteps=0, num_lte_timesteps=1,
                    track_ion_stats=True, compact_min_size=64)
    model = make_toy_1d_model(nshells=6, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    out = "/tmp/ionstats_out"
    import shutil
    shutil.rmtree(out, ignore_errors=True)
    sim = Simulation(model, cfg, atomic_data=ad, out_dir=out)
    sim.run(checkpoint=False, verbose=False)

    st = sim._ion_stats_prev  # [ncells+1, nions, 32]
    assert st.shape[1] == ad.nions_total and st.shape[2] == 32
    assert np.isfinite(st).all() and (st >= 0).all()
    tot_in = st[..., 28].sum()
    tot_out = st[..., 29].sum()
    assert tot_in > 0, "no macro-atom activations tracked"
    # every deactivation follows an activation of the same packet, so
    # summed energy out <= energy in (packets still active at the
    # timestep end hold the difference)
    assert tot_out <= tot_in * 1.001
    # bb activations energy == energyin_radexc by construction
    np.testing.assert_allclose(st[..., 4].sum(), st[..., 22].sum(),
                               rtol=1e-5)
    with open(os.path.join(out, "estimators_0000.out")) as f:
        txt = f.read()
    assert "ionstats timestep" in txt
