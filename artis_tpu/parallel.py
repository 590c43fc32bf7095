"""Multi-device SPMD execution over a JAX mesh.

TPU-native replacement for the reference's MPI layer (SURVEY.md §2.2):

* packet data-parallelism: the packet megabatch is sharded over the
  mesh axis "dp" — the analogue of the reference's rank-private packet
  populations (sn3d.cc:937-938). Each device runs the transport
  while_loop on its shard independently (no per-iteration sync).
* estimator reduction: per-cell estimator arrays and deposition
  scalars are psum'ed over "dp" at the end of the timestep — the
  analogue of mpi_reduce_estimators (sn3d.cc:316-384), riding ICI
  instead of MPI_Allreduce.
* grid-solve decomposition: the per-cell plasma/temperature update is
  sharded over cells on the same axis — the analogue of the
  nstart/ndo cell ranges (grid.cc:1931-1998) — and the updated cell
  state is all-gathered back.

One difference from the reference: ranks there each carry the *full*
ensemble energy (estimators divided by nprocs afterwards); here shards
partition one ensemble, so the psum result needs no division.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .constants import PI, STEBO
from .packets import PacketBatch, TYPE_ESCAPE, to_numpy, from_numpy
from .transport.kernel import (run_timestep, run_timestep_chunk,
                               zero_estimators)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialisation — the analogue of the reference's
    MPI_Init + communicator setup (sn3d.cc:712-745), built on
    `jax.distributed.initialize`. On a TPU pod slice the arguments
    are discovered from the environment (TPU metadata); on other
    platforms pass coordinator/num_processes/process_id explicitly
    (the reference's world-rank analogue).

    After this, `jax.devices()` spans every chip of every host and
    `make_mesh()` builds a global "dp" mesh over them — the reference's
    MPI_COMM_WORLD. There is no intra-/inter-node communicator split:
    XLA routes collectives over ICI within a slice and DCN across
    slices by itself, which is what the reference's node-shared
    windows + two-level broadcast emulate by hand.

    Returns the process index (the reference's `my_rank`)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes,
                      process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("dp",))


def pad_batch_to(batch: PacketBatch, multiple: int) -> PacketBatch:
    """Pad the packet batch with inert (escaped, zero-energy) packets so
    its length divides the mesh size."""
    n = batch.n
    rem = n % multiple
    if rem == 0:
        return batch
    pad = multiple - rem
    arrays = to_numpy(batch)
    out = {}
    for k, v in arrays.items():
        fill = np.zeros((pad,) + v.shape[1:], dtype=v.dtype)
        if k == "ptype":
            fill[:] = TYPE_ESCAPE
        if k == "escape_type":
            fill[:] = -1  # never counted in spectra
        if k == "pkt_id":
            fill[:] = n + np.arange(pad)
        if k == "dirvec":
            fill[:, 2] = 1.0
        out[k] = np.concatenate([v, fill])
    return from_numpy(out)


def shard_batch(batch: PacketBatch, mesh: Mesh) -> PacketBatch:
    """Place the batch with the leading axis sharded over "dp"."""
    def put(x):
        spec = P("dp") if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x),
                                 NamedSharding(mesh, P())), tree)


def make_sharded_step(mesh: Mesh, *, grid_type: str, ncoord: int,
                      relativistic: bool = False,
                      max_iters: int = 2_000_000):
    """Build the jitted sharded timestep: per-shard transport while_loop
    + estimator psum."""

    def body(pk, tables, params, t2, nts_is_first, base_key):
        pk2, est = run_timestep(
            pk, tables, params, t2, nts_is_first, base_key,
            grid_type=grid_type, ncoord=ncoord,
            relativistic=relativistic, max_iters=max_iters)
        est = jax.tree.map(lambda x: jax.lax.psum(x, "dp"), est)
        return pk2, est

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(), P()),
        out_specs=(P("dp"), P()),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_chunk_step(mesh: Mesh, *, grid_type: str, ncoord: int,
                            nmodel: int, rf_nbins: int = 0,
                            vp_shape=None, nlines_stat: int = 0,
                            ion_stats_nions: int = 0,
                            syn_emiss_bins: int = 0, vgrid_shape=None,
                            n_bfcont: int = 0,
                            jb_nsel: int = 0,
                            relativistic: bool = False,
                            detailed: bool = False,
                            polarization: bool = False,
                            vpkt: bool = False):
    """The driver's chunked transport step, sharded over the "dp" mesh
    axis — the full-fidelity analogue of the reference's rank-private
    packet loop + mpi_reduce_estimators (sn3d.cc:937-938, 316-384),
    supporting every static kernel mode (detailed/polarization/vpkt).

    Signature matches the single-device step the driver jits in
    Simulation._make_step_fn:
        step(pk, est, tables, params, t2, nts_is_first, base_key,
             chunk_iters) -> (pk, est, n_active)
    ``pk`` is sharded over "dp" (leading packet axis); ``est`` is the
    replicated running total; ``tables``/``params`` are replicated.
    Each device transports only its shard; the per-chunk estimator
    *delta* is psum'ed over the mesh (ICI) and added to the running
    total, so chaining chunks never double-counts.
    """

    def body(pk, tables, params, t2, nts_is_first, base_key,
             chunk_iters):
        est0 = zero_estimators(nmodel, rf_nbins, vp_shape,
                               nlines_stat=nlines_stat,
                               ion_stats_nions=ion_stats_nions,
                               syn_emiss_bins=syn_emiss_bins,
                               vgrid_shape=vgrid_shape,
                               n_bfcont=n_bfcont, jb_nsel=jb_nsel)
        pk2, delta, n_act = run_timestep_chunk(
            pk, est0, tables, params, t2, nts_is_first, base_key,
            chunk_iters, grid_type=grid_type, ncoord=ncoord,
            relativistic=relativistic, detailed=detailed,
            polarization=polarization, vpkt=vpkt)
        delta = jax.tree.map(lambda x: jax.lax.psum(x, "dp"), delta)
        n_act = jax.lax.psum(n_act, "dp")
        return pk2, delta, n_act

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(), P(), P()),
        out_specs=(P("dp"), P(), P()),
        check_vma=False)

    def step(pk, est, tables, params, t2, nts_is_first, base_key,
             chunk_iters):
        pk2, delta, n_act = sharded(pk, tables, params, t2,
                                    nts_is_first, base_key, chunk_iters)
        est2 = jax.tree.map(jnp.add, est, delta)
        return pk2, est2, n_act

    return jax.jit(step)


def make_sharded_lte_update(mesh: Mesh, mintemp: float, maxtemp: float):
    """Cell-sharded LTE temperature solve + allgather — the analogue of
    the reference's per-rank cell ranges in update_grid followed by
    mpi_communicate_grid_properties (sn3d.cc:191-314).

    Inputs are per-cell arrays padded to a multiple of the mesh size;
    returns the full updated T_J array on every device.
    """

    def body(J_shard, TJ_old_shard):
        T_J = (J_shard * PI / STEBO) ** 0.25
        T_J = jnp.where(jnp.isfinite(T_J) & (T_J > 0), T_J, TJ_old_shard)
        T_J = jnp.clip(T_J, mintemp, maxtemp)
        return jax.lax.all_gather(T_J, "dp", tiled=True)

    sharded = jax.shard_map(body, mesh=mesh,
                            in_specs=(P("dp"), P("dp")),
                            out_specs=P(), check_vma=False)
    return jax.jit(sharded)
