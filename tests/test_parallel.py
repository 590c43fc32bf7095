"""Multi-device SPMD tests on the virtual 8-device CPU mesh: packet
data-parallelism with estimator psum (the reference's MPI rank-private
packets + MPI_Allreduce, SURVEY.md §2.2) and the cell-sharded LTE
update with allgather (nstart/ndo decomposition analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu import SimConfig, Simulation, make_toy_1d_model
from artis_tpu import parallel as par
from artis_tpu.transport.kernel import zero_estimators


@pytest.fixture(scope="module")
def sim():
    cfg = SimConfig(npkts=512, ntimesteps=3, tmin_days=3.0,
                    tmax_days=10.0, ftstep=3, opacity_case=0, seed=5)
    model = make_toy_1d_model(nshells=8, tmin=cfg.tmin)
    return Simulation(model, cfg)


def test_mesh_has_8_devices():
    mesh = par.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device(sim):
    """The psum'ed estimators from the sharded run must equal the
    single-device run bit-for-close (counter-based RNG makes transport
    independent of sharding)."""
    from artis_tpu.transport.kernel import run_timestep

    t2 = jnp.float32(sim.units.time_to_sim(sim.ts.end(0)))
    tables = sim._tables()
    params = sim.params

    # single device reference
    pk1, est1 = jax.jit(lambda p: run_timestep(
        p, tables, params, t2, True, sim.base_key,
        grid_type="spherical", ncoord=sim.grid.ncoordgrid[0],
        max_iters=100_000))(sim.packets)

    # 8-way sharded
    mesh = par.make_mesh()
    batch = par.shard_batch(par.pad_batch_to(sim.packets, 8), mesh)
    step = par.make_sharded_step(
        mesh, grid_type="spherical", ncoord=sim.grid.ncoordgrid[0],
        max_iters=100_000)
    pk8, est8 = step(batch, par.replicate(tables, mesh),
                     par.replicate(params, mesh), t2, True,
                     sim.base_key)

    np.testing.assert_allclose(np.asarray(est8["J"]),
                               np.asarray(est1["J"]), rtol=2e-4)
    assert int(est8["pellet_decays"]) == int(est1["pellet_decays"])
    assert int(est8["escounter"]) == int(est1["escounter"])
    # per-packet states identical (order preserved by sharding)
    np.testing.assert_allclose(
        np.asarray(pk8.prop_time)[:sim.packets.n],
        np.asarray(pk1.prop_time), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(pk8.ptype)[:sim.packets.n], np.asarray(pk1.ptype))


def test_sharded_lte_update(sim):
    mesh = par.make_mesh()
    nm = sim.grid.nmodel
    pad = (-nm) % 8
    J = jnp.concatenate([jnp.linspace(1e8, 1e10, nm, dtype=jnp.float32),
                         jnp.zeros(pad, jnp.float32)])
    TJ_old = jnp.full(nm + pad, 5000.0, jnp.float32)
    lte_fn = par.make_sharded_lte_update(mesh, 1000.0, 1.4e5)
    T = lte_fn(par.replicate(J, mesh), par.replicate(TJ_old, mesh))
    T = np.asarray(T)[:nm]
    from artis_tpu.constants import PI, STEBO
    expect = np.clip((np.asarray(J)[:nm] * PI / STEBO) ** 0.25,
                     1000.0, 1.4e5)
    np.testing.assert_allclose(T, expect, rtol=1e-5)


def _detailed_sim(n_devices=None):
    from artis_tpu.atomic import make_synthetic_atomic_data
    cfg = SimConfig(npkts=768, ntimesteps=4, tmin_days=3.0,
                    tmax_days=14.0, ftstep=4, opacity_case=4,
                    grey_op=0.1, seed=31, num_grey_timesteps=1,
                    cell_is_optically_thick=8.0, compact_min_size=64)
    model = make_toy_1d_model(nshells=8, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    s = Simulation(model, cfg, atomic_data=ad, n_devices=n_devices)
    s.run(checkpoint=False, verbose=False)
    return s


def test_detailed_sim_sharded_matches_single_device():
    """Full detailed-mode (opacity_case 4) Simulation through the real
    driver on the 8-device mesh: per-timestep deposition log and final
    grid temperatures must match the single-device run (counter-based
    per-packet RNG makes transport sharding-invariant; estimator psum
    ordering differs, so f32-level tolerance)."""
    s1 = _detailed_sim()
    s8 = _detailed_sim(n_devices=8)
    assert s8.mesh is not None and s8.mesh.size == 8
    # timestep 0 has no estimator feedback yet: transport must be
    # sharding-invariant event for event (counter-based RNG)
    d1, d8 = s1.dep_log[0], s8.dep_log[0]
    assert d1["pellet_decays"] == d8["pellet_decays"]
    assert d1["ma_activations"] == d8["ma_activations"]
    assert d1["escounter"] == d8["escounter"]
    # later timesteps feed f32 psum'ed estimators back through the
    # grid solve; ulp-level Te differences flip individual sampled
    # events and MC trajectories are chaotic, so later timesteps are
    # only statistically identical (few-percent at 768 packets)
    # (tolerances sized to the MC noise of two independent 768-packet
    # realisations — J per cell carries ~10% noise -> Te ~2.5% 1sigma;
    # a double-counted psum would show up as a ~68% Te error)
    for d1, d8 in zip(s1.dep_log, s8.dep_log):
        np.testing.assert_allclose(d8["gamma_dep_Lsun"],
                                   d1["gamma_dep_Lsun"], rtol=0.05)
        if d1["ma_activations"] > 100:
            # two ~110-count realisations differ by sqrt(2*110) ~ 15
            # at 1 sigma; 0.4*n ~ 3 sigma (0.25 flaked at 1.8 sigma —
            # a double count would show as 1.0*n)
            assert (abs(d8["ma_activations"] - d1["ma_activations"])
                    <= 0.4 * d1["ma_activations"])
    np.testing.assert_allclose(s8.grid.Te, s1.grid.Te, rtol=0.08)
    np.testing.assert_allclose(s8.grid.TR, s1.grid.TR, rtol=0.08)


def test_pad_batch_inert(sim):
    b = par.pad_batch_to(sim.packets, 7)
    assert b.n % 7 == 0
    extra = b.n - sim.packets.n
    if extra:
        assert np.all(np.asarray(b.ptype)[-extra:] == 32)
        assert np.all(np.asarray(b.e_cmf)[-extra:] == 0)


def test_elastic_resume_across_device_counts(tmp_path):
    """Elastic recovery: a checkpoint written by a single-device run
    resumes on an 8-device mesh (and vice versa the batch is re-placed
    by _place_batch), completing to the same answer as the continuous
    single-device run. The reference cannot do this — its restart
    files are per-rank and require identical nprocs
    (grid.cc:1829-1830); artis_tpu checkpoints are device-layout-free
    host arrays + counter-based per-packet RNG, so transport is
    invariant to the resharding (grey opacity is frequency-independent
    so even ulp-level estimator-ordering differences cannot flip
    trajectories)."""
    cfg = SimConfig(npkts=512, ntimesteps=4, tmin_days=2.0,
                    tmax_days=10.0, ftstep=4, opacity_case=0, seed=7)
    mk = lambda: make_toy_1d_model(nshells=8, mni56_msun=0.2,
                                   tmin=cfg.tmin)
    ref = Simulation(mk(), cfg)
    ref.run(verbose=False, checkpoint=False)

    out = str(tmp_path / "elastic")
    s1 = Simulation(mk(), cfg, out_dir=out)
    s1.run(until=2, verbose=False, checkpoint=False)
    s1.save_checkpoint(2)

    s8 = Simulation(mk(), cfg, out_dir=out, n_devices=8)
    assert s8.mesh is not None and s8.mesh.size == 8
    s8.load_checkpoint(f"{out}/checkpoint_ts2.npz")
    assert s8.nts_done == 2
    assert s8.run(verbose=False, checkpoint=False) is True

    # per-timestep event counters after the resume point are exact
    for d_ref, d_8 in zip(ref.dep_log[2:], s8.dep_log[2:]):
        assert d_8["pellet_decays"] == d_ref["pellet_decays"]
        assert d_8["escounter"] == d_ref["escounter"]
        np.testing.assert_allclose(d_8["gamma_dep_Lsun"],
                                   d_ref["gamma_dep_Lsun"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.grid.Te),
                               np.asarray(ref.grid.Te), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s8.grid.TR),
                               np.asarray(ref.grid.TR), rtol=1e-4)
