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


def test_pad_batch_inert(sim):
    b = par.pad_batch_to(sim.packets, 7)
    assert b.n % 7 == 0
    extra = b.n - sim.packets.n
    if extra:
        assert np.all(np.asarray(b.ptype)[-extra:] == 32)
        assert np.all(np.asarray(b.e_cmf)[-extra:] == 0)
