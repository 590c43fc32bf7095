"""kpkt diffusion-time smoothing (do_kpkt, kpkt.cc:505-515,821-846):
k-packets wait deltat = timescale * timestep-width before re-emitting;
a delay crossing the timestep boundary carries the k-packet into the
next timestep unconverted."""

import numpy as np

from artis_tpu import SimConfig, Simulation, make_toy_1d_model
from artis_tpu.packets import TYPE_KPKT, TYPE_ESCAPE, to_numpy


def _run(timescale, nsteps_diff, until=1):
    cfg = SimConfig(npkts=400, ntimesteps=4, tmin_days=2.0,
                    tmax_days=10.0, ftstep=4, opacity_case=0,
                    grey_op=0.3, seed=11,
                    kpktdiffusion_timescale=timescale,
                    n_kpktdiffusion_timesteps=nsteps_diff)
    model = make_toy_1d_model(nshells=8, mni56_msun=0.3, tmin=cfg.tmin)
    sim = Simulation(model, cfg)
    sim.run(until=until, verbose=False, checkpoint=False)
    return sim


def test_huge_delay_defers_kpkts():
    # a delay far longer than the timestep: every k-packet created in
    # ts 0 must still be a k-packet at its end, parked at t2
    sim = _run(timescale=1e3, nsteps_diff=4)
    arr = to_numpy(sim.packets)
    nk = int(np.sum(arr["ptype"] == TYPE_KPKT))
    assert nk > 0
    t2 = sim.units.time_to_sim(sim.ts.end(0))
    k = arr["ptype"] == TYPE_KPKT
    np.testing.assert_allclose(arr["prop_time"][k], t2, rtol=1e-5)

    # without the delay most thermal packets convert within the step
    sim0 = _run(timescale=0.0, nsteps_diff=0)
    nk0 = int(np.sum(to_numpy(sim0.packets)["ptype"] == TYPE_KPKT))
    assert nk0 < nk


def test_delay_window_expires():
    # n_kpktdiffusion_timesteps = 0: timescale set but window expired
    # -> behaves exactly like no delay
    a = _run(timescale=1e3, nsteps_diff=0)
    b = _run(timescale=0.0, nsteps_diff=0)
    pa, pb = to_numpy(a.packets), to_numpy(b.packets)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k], err_msg=k)


def test_energy_still_escapes_with_delay():
    sim = _run(timescale=0.02, nsteps_diff=4, until=4)
    arr = to_numpy(sim.packets)
    assert int(np.sum(arr["ptype"] == TYPE_ESCAPE)) > 0
    assert np.all(np.isfinite(arr["e_rf"]))
