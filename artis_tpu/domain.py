"""Grid domain decomposition with sorted all-to-all packet migration.

The reference replicates the full grid on every rank and keeps packets
rank-private (sn3d.cc:937-938) — transport memory per rank is the
whole model. This module implements the BASELINE north-star design
instead: the model grid (and every per-cell transport table) is
sharded spatially over the mesh's "dd" axis, and packets MIGRATE to
the device that owns their current cell via a sorted, capacity-bounded
`jax.lax.all_to_all` (ICI collective), so each chip only ever holds
its own slice of the per-cell tables.

Design (fixed shapes throughout, jit/shard_map-safe):

* Ownership: model cells are split into contiguous ranges with equal
  non-empty counts per device (setup_nstart_ndo, grid.cc:1931-1998);
  every propagation cell inherits its model cell's owner (empty cells
  are assigned round-robin by cell index).
* Each device holds ``M0`` HOME slots (one reserved per packet id it
  originated — a returning packet always has space) plus ``V``
  visitor slots for packets currently travelling through its domain.
  Empty slots carry ``ptype = TYPE_INVALID`` and are ignored by the
  kernel.
* One round = transport chunk (foreign packets frozen via the
  kernel's cell_owner mask) + migration:
    - pending packets whose cell left the local domain are sorted by
      destination owner and exchanged with `all_to_all`; per-receiver
      capacity is advertised beforehand (all_gather of free visitor
      slots), and packets that do not fit are DEFERRED to the next
      round — never dropped;
    - finished packets (escaped or reached the end of the timestep)
      are shipped to their reserved home slot.
  Per-packet counter-based RNG makes the result independent of where
  a packet is processed, so migration is physics-invariant.
* The timestep ends when no packet is pending AND every packet is
  back in its home slot; the home regions then concatenate back into
  the plain global batch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .packets import (PacketBatch, TYPE_ESCAPE, TYPE_INVALID,
                      from_numpy, to_numpy)
from .transport.kernel import run_timestep_chunk, zero_estimators


def make_domain_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("dd",))


@dataclasses.dataclass(frozen=True)
class DomainPlan:
    ndev: int
    nmodel: int
    ndo_max: int  # max LOCAL model cells per device (owned + halo)
    starts: tuple  # [ndev+1] OWNED model-cell range starts
    cell_owner: np.ndarray  # [ncells_prop] owning device per prop cell
    m0: int  # home slots per device
    v: int  # visitor slots per device
    halo: int = 0  # extra model cells held on each side of the range

    def ext_range(self, d: int) -> tuple[int, int]:
        """The device's LOCAL model range: owned cells extended by the
        halo on both sides (clipped to the model)."""
        return (max(self.starts[d] - self.halo, 0),
                min(self.starts[d + 1] + self.halo, self.nmodel))


def plan_decomposition(cell_mgi: np.ndarray, nmodel: int,
                       rho_init: np.ndarray, ndev: int, npkts: int,
                       headroom: float = 1.0,
                       halo: int = 0) -> DomainPlan:
    """Split model cells into ``ndev`` contiguous ranges with equal
    non-empty counts (setup_nstart_ndo, grid.cc:1931-1998).

    ``halo`` > 0 additionally replicates that many neighbouring model
    cells' tables on each side of every range: a packet random-walking
    across the seam keeps transporting locally and only migrates when
    it exits the halo, cutting the per-timestep migration round count
    (which is bounded below by the worst per-packet count of
    OWNERSHIP-EXIT crossings, not raw boundary crossings). This has no
    reference analogue — the reference replicates the whole grid on
    every rank — it is the TPU-native middle ground between full
    replication and strict spatial sharding."""
    nonempty = (np.asarray(rho_init[:nmodel]) > 0).astype(np.int64)
    total = max(int(nonempty.sum()), 1)
    cum = np.cumsum(nonempty)
    starts = np.zeros(ndev + 1, np.int64)
    for d in range(1, ndev):
        starts[d] = int(np.searchsorted(cum, d * total / ndev, "left"))
    starts[ndev] = nmodel
    starts = np.maximum.accumulate(starts)

    mgi = np.asarray(cell_mgi)
    owner = np.searchsorted(starts[1:-1], mgi, side="right")
    owner = np.where(mgi < nmodel, owner, np.arange(len(mgi)) % ndev)
    ndo_max = int(np.max(np.diff(starts))) + \
        (2 * halo if ndev > 1 else 0)
    m0 = -(-npkts // ndev)
    v = -(-max(int(m0 * headroom), ndev) // ndev) * ndev
    return DomainPlan(ndev=ndev, nmodel=nmodel, ndo_max=ndo_max,
                      starts=tuple(int(x) for x in starts),
                      cell_owner=owner.astype(np.int32), m0=m0, v=v,
                      halo=(halo if ndev > 1 else 0))


def shard_domain_tables(tables: dict, plan: DomainPlan,
                        mesh: Mesh) -> tuple[dict, dict]:
    """Split every model-indexed table ([nmodel+1] leading dim) into
    per-device slices stacked as [ndev, ndo_max+1, ...] sharded over
    "dd"; everything else replicated. Returns (tables, specs)."""
    D, nm = plan.ndev, plan.nmodel
    ndo1 = plan.ndo_max + 1
    out, specs = {}, {}
    shard = NamedSharding(mesh, P("dd"))
    repl = NamedSharding(mesh, P())
    for k, va in tables.items():
        v = np.asarray(va)
        if v.ndim >= 1 and v.shape[0] == nm + 1 and k != "cell_mgi":
            sl = np.zeros((D, ndo1) + v.shape[1:], v.dtype)
            for d in range(D):
                s, e = plan.ext_range(d)
                sl[d, :e - s] = v[s:e]
                sl[d, ndo1 - 1] = v[nm]  # dummy/empty row
            out[k] = jax.device_put(sl, shard)
            specs[k] = P("dd")
        else:
            out[k] = jax.device_put(v, repl)
            specs[k] = P()

    # per-device map: propagation cell -> LOCAL model index (owned +
    # halo cells resolve; everything else hits the dummy row)
    cm = np.asarray(tables["cell_mgi"])
    loc = np.zeros((D, len(cm)), np.int32)
    mine = np.zeros((D, len(cm)), np.int8)
    for d in range(D):
        s, e = plan.ext_range(d)
        inrange = (cm >= s) & (cm < e)
        loc[d] = np.where(inrange, cm - s, ndo1 - 1).astype(np.int32)
        # empty propagation cells (mgi >= nmodel) keep their
        # round-robin owner: exactly one device must free-stream them
        mine[d] = (inrange | ((cm >= nm)
                              & (plan.cell_owner == d))).astype(np.int8)
    out["cell_mgi"] = jax.device_put(loc, shard)
    specs["cell_mgi"] = P("dd")
    out["cell_mine"] = jax.device_put(mine, shard)
    specs["cell_mine"] = P("dd")
    if "cell_pack" in tables:
        # the packed per-cell scalar rows carry the model index in
        # channel 0 — remap it to each device's LOCAL index (other
        # channels are plain per-cell values, valid everywhere)
        cpk = np.asarray(tables["cell_pack"])
        cps = np.broadcast_to(cpk, (D,) + cpk.shape).copy()
        cps[:, :, 0] = loc
        out["cell_pack"] = jax.device_put(cps.astype(np.float32),
                                          shard)
        specs["cell_pack"] = P("dd")
    out["cell_owner"] = jax.device_put(plan.cell_owner, repl)
    specs["cell_owner"] = P()
    out["dd_rank"] = jax.device_put(np.arange(D, dtype=np.int32),
                                    shard)
    specs["dd_rank"] = P("dd")
    return out, specs


def make_domain_est(plan: DomainPlan, mesh: Mesh, rf_nbins: int = 0,
                    vp_shape=None, nlines_stat: int = 0,
                    ion_stats_nions: int = 0,
                    syn_emiss_bins: int = 0, vgrid_shape=None,
                    n_bfcont: int = 0, jb_nsel: int = 0) -> dict:
    """Initial per-device estimator stacks: every leaf gains a leading
    [ndev] axis sharded over "dd" (local model rows 0..ndo_max)."""
    base = zero_estimators(plan.ndo_max, rf_nbins, vp_shape,
                           nlines_stat=nlines_stat,
                           ion_stats_nions=ion_stats_nions,
                           syn_emiss_bins=syn_emiss_bins,
                           vgrid_shape=vgrid_shape,
                           n_bfcont=n_bfcont, jb_nsel=jb_nsel)
    shard = NamedSharding(mesh, P("dd"))
    out = {}
    for k, v in base.items():
        a = np.zeros((plan.ndev,) + np.asarray(v).shape,
                     np.asarray(v).dtype)
        out[k] = jax.device_put(a, shard)
    return out


def scatter_packets(pk: PacketBatch, plan: DomainPlan,
                    mesh: Mesh) -> PacketBatch:
    """Place the global batch into each device's home region (packet
    ids partitioned contiguously), visitor slots empty."""
    D, M0, V = plan.ndev, plan.m0, plan.v
    arr = to_numpy(pk)
    n = len(arr["ptype"])
    rows = D * (M0 + V)
    valid = np.zeros(rows, bool)
    out = {}
    for k, v in arr.items():
        buf = np.zeros((rows,) + v.shape[1:], v.dtype)
        for d in range(D):
            s, e = d * M0, min((d + 1) * M0, n)
            if e > s:
                r0 = d * (M0 + V)
                buf[r0:r0 + (e - s)] = v[s:e]
                valid[r0:r0 + (e - s)] = True
        out[k] = buf
    out["ptype"] = np.where(valid, out["ptype"], TYPE_INVALID)
    b = from_numpy(out)
    shard = NamedSharding(mesh, P("dd"))
    return jax.tree.map(lambda a: jax.device_put(a, shard), b)


def gather_packets(pk_sharded: PacketBatch, plan: DomainPlan,
                   npkts: int) -> PacketBatch:
    """Collect the home regions back into the global batch (valid
    after the round loop drove every packet home)."""
    arr = to_numpy(pk_sharded)
    D, M0, V = plan.ndev, plan.m0, plan.v
    out = {}
    for k, v in arr.items():
        parts = [v[d * (M0 + V):d * (M0 + V) + M0] for d in range(D)]
        out[k] = np.concatenate(parts)[:npkts]
    assert (out["ptype"] >= 0).all(), "packet(s) not home after loop"
    return from_numpy(out)


def assemble_estimators(est_stack: dict, plan: DomainPlan) -> dict:
    """[ndev, ndo_max+1, ...] local stacks -> global [nmodel+1, ...];
    leaves without the local-cell leading axis are summed over
    devices."""
    out = {}
    D, nm = plan.ndev, plan.nmodel
    ndo1 = plan.ndo_max + 1
    for k, v in est_stack.items():
        a = np.asarray(v)
        if a.ndim >= 2 and a.shape[1] == ndo1 and k not in (
                "vpkt_I", "vpkt_Q", "vpkt_U", "line_em", "line_ab"):
            g = np.zeros((nm + 1,) + a.shape[2:], a.dtype)
            for d in range(D):
                # halo rows overlap between neighbouring devices:
                # contributions accumulate (each transport event is
                # processed on exactly one device, so the sum is exact)
                s, e = plan.ext_range(d)
                g[s:e] += a[d, :e - s]
                g[nm] += a[d, ndo1 - 1]
            out[k] = g
        else:
            out[k] = a.sum(axis=0)
    return out


def _mask_nd(mask, v):
    if v.ndim > 1:
        return mask.reshape(mask.shape + (1,) * (v.ndim - 1))
    return mask


def _put_rows(dst: dict, idx, src: dict, mask) -> dict:
    """Scatter ``src`` rows into ``dst`` at ``idx`` where mask; masked
    rows are dropped (index pushed out of range)."""
    out = {}
    for k, v in dst.items():
        drop_idx = jnp.where(mask, idx, v.shape[0])
        out[k] = v.at[drop_idx].set(src[k], mode="drop")
    return out


def make_domain_step(mesh: Mesh, plan: DomainPlan, specs: dict, *,
                     grid_type: str, ncoord: int, rf_nbins: int = 0,
                     vp_shape=None, nlines_stat: int = 0,
                     ion_stats_nions: int = 0,
                     syn_emiss_bins: int = 0, vgrid_shape=None,
                     n_bfcont: int = 0, jb_nsel: int = 0,
                     relativistic: bool = False,
                     detailed: bool = False,
                     polarization: bool = False, vpkt: bool = False):
    """One domain-decomposed round: local transport chunk + sorted
    all-to-all migration. Returns a jitted
        step(pk, est, tables, params, t2, nts_is_first, base_key,
             chunk_iters) -> (pk, est, n_pending, n_away)."""
    D = plan.ndev
    M0, V = plan.m0, plan.v
    ROWS = M0 + V
    CP = max(V // D, 1)   # pending bucket capacity per (src, dst)
    CF = max(M0 // D, 1)  # homebound bucket capacity
    ndo1 = plan.ndo_max + 1

    dd_keys = frozenset(k for k, s in specs.items()
                        if s == P("dd") and k != "dd_rank")

    def body(pk, est, tables, params, t2, nts_is_first, base_key,
             chunk_iters):
        me = tables["dd_rank"][0]
        # sharded table stacks arrive as [1, ...] local blocks:
        # strip the device axis so the kernel sees plain local tables
        tables = {k: (v[0] if k in dd_keys else v)
                  for k, v in tables.items()}
        est = {k: v[0] for k, v in est.items()}

        # ---- transport the locally-owned packets for one chunk
        est0 = zero_estimators(ndo1 - 1, rf_nbins, vp_shape,
                               nlines_stat=nlines_stat,
                               ion_stats_nions=ion_stats_nions,
                               syn_emiss_bins=syn_emiss_bins,
                               vgrid_shape=vgrid_shape,
                               n_bfcont=n_bfcont, jb_nsel=jb_nsel)
        pk, delta, _ = run_timestep_chunk(
            pk, est0, tables, params, t2, nts_is_first, base_key,
            chunk_iters, grid_type=grid_type, ncoord=ncoord,
            relativistic=relativistic, detailed=detailed,
            polarization=polarization, vpkt=vpkt)
        est = jax.tree.map(jnp.add, est, delta)

        d = {f.name: getattr(pk, f.name)
             for f in dataclasses.fields(PacketBatch)}
        valid = d["ptype"] >= 0
        pending = valid & (d["ptype"] != TYPE_ESCAPE) \
            & (d["prop_time"] < t2)
        cell_cl = jnp.clip(d["cell"], 0,
                           tables["cell_owner"].shape[0] - 1)
        owner = tables["cell_owner"][cell_cl]
        # halo ownership: migrate only when the packet's cell left
        # this device's extended (owned + halo) range
        mine0 = tables["cell_mine"][cell_cl] != 0
        home = jnp.clip(d["pkt_id"] // M0, 0, D - 1).astype(jnp.int32)

        # ---- advertise free visitor capacity (receiver back-pressure)
        vis_used = jnp.sum((d["ptype"][M0:] >= 0).astype(jnp.int32))
        free_v = jnp.maximum(V - vis_used, 0)
        free_all = jax.lax.all_gather(free_v, "dd")  # [D]
        # fair-share caps: sum over senders equals the receiver's free
        # space exactly (floor share + rank-indexed remainder)
        cap_p = jnp.minimum(
            free_all // D + (me < free_all % D).astype(jnp.int32),
            CP)  # [D]

        def sorted_exchange(d_cur, dest, move, C, caps):
            """One sorted capacity-bounded all_to_all: rows with
            ``move`` go to device ``dest`` (at most ``caps[dest]``
            per dest, C buffer slots). Returns (d_after, recv_rows,
            sent_mask_natural_order)."""
            sort_key = jnp.where(move, dest, D + 1).astype(jnp.int32)
            order = jnp.argsort(sort_key)
            d_s = {k: v[order] for k, v in d_cur.items()}
            key_s = sort_key[order]
            dest_s = dest[order]
            move_s = move[order]
            # rank within each (sorted) dest group
            cs = jnp.cumsum(move_s.astype(jnp.int32))
            first = jnp.searchsorted(key_s, key_s, side="left")
            base = jnp.where(first > 0,
                             cs[jnp.maximum(first - 1, 0)], 0)
            rank = jnp.where(move_s, cs - 1 - base, 0).astype(jnp.int32)
            send = move_s & (rank < caps[jnp.clip(dest_s, 0, D - 1)])
            # [D, C] buffer (slot = dest * C + rank)
            slot = jnp.where(send, dest_s * C + rank, D * C)
            buf = {}
            for k, v in d_s.items():
                z = jnp.zeros((D * C,) + v.shape[1:], v.dtype)
                buf[k] = z.at[slot].set(v, mode="drop")
            filled = jnp.zeros(D * C, bool).at[slot].set(
                jnp.ones_like(send), mode="drop")
            buf["ptype"] = jnp.where(filled, buf["ptype"],
                                     TYPE_INVALID)
            buf = {k: v.reshape((D, C) + v.shape[1:])
                   for k, v in buf.items()}
            recv = {k: jax.lax.all_to_all(v, "dd", 0, 0)
                    for k, v in buf.items()}
            recv = {k: v.reshape((-1,) + v.shape[2:])
                    for k, v in recv.items()}
            d_s["ptype"] = jnp.where(send, TYPE_INVALID, d_s["ptype"])
            inv = jnp.argsort(order)
            d_nat = {k: v[inv] for k, v in d_s.items()}
            return d_nat, recv, jnp.sum(send.astype(jnp.int32))

        # ---- exchange 1: pending packets -> their cell's owner
        want_p = valid & pending & ~mine0
        d1, recv_p, n_sent_p = sorted_exchange(d, owner, want_p, CP,
                                               cap_p)

        # ---- place received pending packets into free visitor slots
        rp_valid = recv_p["ptype"] >= 0
        rp_rank = jnp.cumsum(rp_valid.astype(jnp.int32)) - 1
        free_cum = jnp.cumsum((d1["ptype"][M0:] < 0)
                              .astype(jnp.int32))
        rp_slot = M0 + jnp.clip(
            jnp.searchsorted(free_cum, rp_rank + 1, side="left"),
            0, V - 1)
        d1 = _put_rows(d1, rp_slot, recv_p, rp_valid)

        # ---- exchange 2: homebound packets -> their reserved home
        # slot. This carries (a) finished packets and (b) pending
        # packets that could NOT reach their owner this round and are
        # not at home (EVACUEES) — the deadlock breaker: home slots
        # are reserved, so circular visitor-buffer starvation cannot
        # stall the system; evacuees wait at home until owner
        # capacity appears.
        valid1 = d1["ptype"] >= 0
        pending1 = valid1 & (d1["ptype"] != TYPE_ESCAPE) \
            & (d1["prop_time"] < t2)
        cell1_cl = jnp.clip(d1["cell"], 0,
                            tables["cell_owner"].shape[0] - 1)
        mine1 = tables["cell_mine"][cell1_cl] != 0
        home1 = jnp.clip(d1["pkt_id"] // M0, 0, D - 1) \
            .astype(jnp.int32)
        finished1 = valid1 & ~pending1
        evac1 = pending1 & ~mine1 & (home1 != me)
        want_h = (finished1 | evac1) & (home1 != me)
        cap_h = jnp.full((D,), CF, jnp.int32)
        d2, recv_f, _ = sorted_exchange(d1, home1, want_h, CF, cap_h)

        # received homebound packets -> their reserved home slots
        rf_valid = recv_f["ptype"] >= 0
        rf_slot = jnp.clip(recv_f["pkt_id"] - me * M0, 0, M0 - 1)
        d_n = _put_rows(d2, rf_slot, recv_f, rf_valid)

        # ---- local re-homing: any valid VISITOR row whose home is
        # this device moves into its reserved home slot (its slot is
        # free by construction — only this packet may occupy it)
        row_idx = jnp.arange(ROWS)
        vis_home = ((d_n["ptype"] >= 0) & (row_idx >= M0)
                    & (jnp.clip(d_n["pkt_id"] // M0, 0, D - 1) == me))
        home_slot = jnp.clip(d_n["pkt_id"] - me * M0, 0, M0 - 1)
        d_moved = _put_rows(d_n, home_slot, d_n, vis_home)
        d_moved["ptype"] = jnp.where(vis_home, TYPE_INVALID,
                                     d_moved["ptype"])
        d_n = d_moved

        pk_out = PacketBatch(**d_n)

        # ---- global progress counters
        v2 = d_n["ptype"] >= 0
        pend2 = v2 & (d_n["ptype"] != TYPE_ESCAPE) \
            & (d_n["prop_time"] < t2)
        away2 = v2 & (jnp.clip(d_n["pkt_id"] // M0, 0, D - 1) != me)
        n_pending = jax.lax.psum(jnp.sum(pend2.astype(jnp.int32)),
                                 "dd")
        n_away = jax.lax.psum(jnp.sum(away2.astype(jnp.int32)), "dd")
        # owner migrations this round: the communication the protocol
        # exists for — rounds with n_migrated == 0 are pure-compute
        # rounds the chunk-size escalation should absorb
        n_migrated = jax.lax.psum(n_sent_p, "dd")
        # restore the device axis on the local estimator block
        est = {k: v[None] for k, v in est.items()}
        return pk_out, est, n_pending, n_away, n_migrated

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("dd"), P("dd"), specs, P(), P(), P(), P(), P()),
        out_specs=(P("dd"), P("dd"), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded)


def run_domain_timestep(step, pk, est, tables, params, t2,
                        nts_is_first, base_key, chunk_iters,
                        max_rounds: int = 4096, verbose: bool = False,
                        max_chunk_iters: int = 32768,
                        stats_out: Optional[dict] = None):
    """Drive migration rounds until every packet finished AND went
    home. Returns (pk, est, rounds).

    The per-round iteration budget escalates geometrically: one round
    costs a full migration barrier (the communication metric in
    DD_SCALING.json), so beyond the first few rounds — where most
    packets are still near their owners and short chunks keep
    freshly-migrated packets from being frozen — we double
    ``chunk_iters`` every round (a traced int32: no recompilation)
    until the cap. A round that migrated nothing doubles
    unconditionally: it was pure compute the chunk budget should have
    absorbed. This drives the round count toward the per-packet
    max-boundary-crossings lower bound instead of total_iters/chunk.

    ``stats_out`` (optional dict) receives: ``migrations`` (total
    owner-migrations), ``rounds_zero_migration`` (rounds that moved
    no packets), ``max_round_migrations``.
    """
    rounds = 0
    it = int(chunk_iters)
    migr_total = 0
    zero_rounds = 0
    migr_max = 0
    while True:
        pk, est, n_pending, n_away, n_migr = step(
            pk, est, tables, params, jnp.float32(t2),
            nts_is_first, base_key, jnp.int32(it))
        rounds += 1
        np_, na_ = int(n_pending), int(n_away)
        nm_ = int(n_migr)
        migr_total += nm_
        migr_max = max(migr_max, nm_)
        if verbose and rounds % 16 == 0:
            print(f"  [domain] round {rounds}: pending={np_} "
                  f"away={na_} migrated={nm_} chunk={it}")
        if np_ == 0 and na_ == 0:
            if stats_out is not None:
                stats_out["migrations"] = migr_total
                stats_out["rounds_zero_migration"] = zero_rounds
                stats_out["max_round_migrations"] = migr_max
            return pk, est, rounds
        if nm_ == 0 and np_ > 0:
            zero_rounds += 1
        # escalation: after round 3 every round doubles the chunk (the
        # barrier is the cost we are minimising); a zero-migration
        # round doubles twice (it paid a barrier for nothing)
        if rounds >= 3 or nm_ == 0:
            it = min(it * (4 if nm_ == 0 else 2), max_chunk_iters)
        if rounds >= max_rounds:
            raise RuntimeError(
                f"domain transport did not converge in {rounds} "
                f"rounds (pending={np_}, away={na_})")
