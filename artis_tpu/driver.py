"""Simulation driver: the time loop, checkpoint/resume, and outputs.

Rebuild of the reference's sn3d main loop (sn3d.cc:675-1154,
do_timestep sn3d.cc:514-673) around the vectorised transport kernel:
a host-side Python loop over timesteps, with each timestep's transport
fully on device.

Per-timestep sequence (mirrors do_timestep):
  1. update_grid: advance densities/abundances, set temperatures from
     the previous timestep's estimators
  2. checkpoint (packets + grid state) — the resume point
  3. transport all packets to the end of the timestep
  4. record deposition / estimator outputs
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import time as _time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import spectra as spectra_mod
from .config import SimConfig
from .constants import (CLIGHT, DAY, GRID_SPHERICAL1D, KB, LSUN, MEV,
                        H, PI, STEBO)
from .decay import DecayModel
from .grid import (Grid, assign_initial_temperatures, build_grid,
                   grid_device_tables, make_units)
from .model import Model
from .packets import PacketBatch, init_pellets, to_numpy, from_numpy
from .plasma.grey_lte import (fit_fullspec_dilute, normalise_J,
                              update_grid_common, update_grid_grey,
                              update_temperatures_from_J)
from .plasma import lte as lte_mod
from .plasma import thermal as thermal_mod
from .plasma.lte_case4 import compute_case4_state, update_thick_flags
from .plasma import macroatom as ma_mod
from .plasma import nltepop as nltepop_mod
from .plasma import photoion as photoion_mod
from .plasma import radfield as radfield_mod
from .phixs import PhixsData, make_hydrogenic_phixs
from .rng import make_base_key
from .timesteps import TimestepGrid, build_timesteps
from .transport.kernel import (TransportParams, make_planck_table,
                               run_timestep_chunk, zero_estimators)
from .units import Units


def _pack_sel_device(rows_list):
    """Stack per-timestep cumulative selection rows [nm1, K_i] into
    the (blk, end) block layout consumed by kernel.cdf_search: the
    whole CDF selection then costs 1-2 row-gathers per event."""
    Kmax = max(int(r.shape[1]) for r in rows_list)
    padded = [jnp.pad(r, ((0, 0), (0, Kmax - r.shape[1])),
                      mode="edge") for r in rows_list]
    sel = jnp.stack(padded, axis=1)  # [nm1, G, Kmax]
    G = len(rows_list)
    if Kmax <= 128:
        return sel, None
    nb = -(-Kmax // 128)
    selp = jnp.pad(sel, ((0, 0), (0, 0), (0, nb * 128 - Kmax)),
                   mode="edge")
    blk = selp.reshape(sel.shape[0], G * nb, 128)
    end = selp.reshape(sel.shape[0], G, nb, 128)[..., -1]
    return blk, end


def _build_line_walk_blocks(nl_pad, taufac_lu, taufac_ul, line_lower,
                            line_upper, line_nu, *, nb: int):
    """Per-timestep block tables for the analytic Sobolev line walk
    (kernel.py use_cum_walk): the per-(cell, line) Sobolev depth per
    unit sim-time (tau_base) and its frequency-ordered cumulative sum
    weighted by 1/nu (so tau accumulated over lines j0..j is
    t * nu_cmf * (D[j] - D[j0]); see kernel.py for the identity),
    laid out in 128-wide row blocks — on TPU a whole-row gather costs
    the same as one scalar gather.

    The cumulative sum is built in f64 on the host and stored
    DOUBLE-SINGLE: D = D_hi + D_lo with D_hi = f32(D) and D_lo the
    f32 residual. A production linelist spans ~1e14 in per-line depth
    (136k lines, median tau ~ 10 at typical t*nu), so a plain f32
    cumsum collapses MOST of the forest: interval differences
    D[j2]-D[j1] lose 95%+ of the true depth (measured on the
    classic_sph_biglines dataset). The kernel reconstructs
    differences as (hi2-hi1) + (lo2-lo1), which is exact to ~f64.
    Returns (D_hi, D_lo, tau_blk, Dend_hi, Dend_lo, tau_end)."""
    ROWW = 128
    nl_np = np.asarray(nl_pad, np.float64)
    ncells = nl_np.shape[0]
    nl = line_nu.shape[0]
    n_l = nl_np[:, np.asarray(line_lower)]
    n_u = nl_np[:, np.asarray(line_upper)]
    base = np.maximum(
        np.asarray(taufac_lu, np.float64)[None, :] * n_l
        - np.asarray(taufac_ul, np.float64)[None, :] * n_u, 0.0)
    dcol = base / np.maximum(np.asarray(line_nu, np.float64),
                             1.0)[None, :]
    D = np.concatenate(
        [np.zeros((ncells, 1)), np.cumsum(dcol, axis=1)],
        axis=1)  # [ncells, nl+1] f64
    P = nb * ROWW
    D = np.pad(D, ((0, 0), (0, P - (nl + 1))), mode="edge")
    D_hi = D.astype(np.float32)
    D_lo = (D - D_hi.astype(np.float64)).astype(np.float32)
    D_hi = D_hi.reshape(ncells, nb, ROWW)
    D_lo = D_lo.reshape(ncells, nb, ROWW)
    tau_blk = np.pad(base, ((0, 0), (0, P - nl))).reshape(
        ncells, nb, ROWW).astype(np.float32)
    return (jnp.asarray(D_hi), jnp.asarray(D_lo),
            jnp.asarray(tau_blk),
            jnp.asarray(D_hi[..., -1]), jnp.asarray(D_lo[..., -1]),
            jnp.asarray(tau_blk[..., -1]))


@jax.jit
def _build_recomb_cum(sigma, nu_edge, nuinc, Te_pad):
    """Per-(cell, continuum) cumulative recombination emissivity over
    the shared x = nu/nu_edge sigma grid (select_continuum_nu,
    ratecoeff.cc:628-720), sampled in the kernel by binary search
    (sample_recomb_nu_table)."""
    NP = sigma.shape[1]
    x = 1.0 + nuinc * jnp.arange(NP, dtype=jnp.float32)
    a = (jnp.float32(H / KB) * nu_edge[None, :, None]
         / jnp.maximum(Te_pad, 1.0)[:, None, None])
    w = (sigma[None, :, :] * (x ** 3)[None, None, :]
         * jnp.exp(-a * (x[None, None, :] - 1.0)))
    return jnp.cumsum(w, axis=2)


def _unit_rows(dirs) -> np.ndarray:
    d = np.atleast_2d(np.asarray(dirs, np.float64))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


class Simulation:
    """One single-host simulation (optionally sharded across local
    devices via parallel.py)."""

    def __init__(self, model: Model, cfg: SimConfig,
                 out_dir: Optional[str] = None, atomic_data=None,
                 phixs_data: Optional[PhixsData] = None,
                 n_devices: Optional[int] = None, mesh=None,
                 domain_decomp: bool = False):
        self.cfg = cfg
        # grid domain decomposition (domain.py): per-cell transport
        # tables sharded spatially over the device mesh with sorted
        # all-to-all packet migration — the SURVEY.md §5.7 north star
        # (the reference replicates the full grid on every rank).
        # Mutually exclusive with the packet-data-parallel mesh.
        self._dd_ndev = n_devices or len(jax.devices())
        self._domain_decomp = bool(domain_decomp) and self._dd_ndev > 1
        if self._domain_decomp:
            mesh = None
            n_devices = None
        if model.ndim == 2:
            # axisymmetric models propagate on a 3D Cartesian cube
            # (the reference uses a cylindrical grid,
            # grid.cc GRID_CYLINDRICAL2D); convert up front so the
            # decay model / abundances / grid all share one cell set
            from .model import model_2d_to_3d
            model = model_2d_to_3d(model)
        self.model = model
        if cfg.data_path:
            # optional per-cell electron-fraction override
            # (read_possible_yefile, grid.cc:528: "Ye.txt" in the run
            # directory), consumed by the opacity_case-5 Tanaka table
            yep = os.path.join(cfg.data_path, "Ye.txt")
            if os.path.exists(yep):
                from .model import apply_ye_file
                apply_ye_file(model, yep)
        self.atomic_data = atomic_data
        # multi-device SPMD: packets sharded over the mesh "dp" axis,
        # estimators psum'ed per chunk (parallel.py; the analogue of
        # the reference's rank-private packets + mpi_reduce_estimators,
        # sn3d.cc:937-938, 316-384)
        if mesh is None and n_devices is not None and n_devices > 1:
            from . import parallel as parallel_mod
            mesh = parallel_mod.make_mesh(n_devices)
        self.mesh = mesh
        # opacity_case 4 = detailed (lines/bf/MA); 5 = grey with the
        # Ye-dependent Tanaka kappa table (kilonova mode, grid.cc
        # calculate_kappagrey case 5) — grey transport, not detailed
        self.detailed = cfg.opacity_case == 4
        if self.detailed and phixs_data is None and atomic_data is not None:
            # no photoionisation tables supplied: fall back to
            # hydrogenic cross sections so bf physics stays active
            phixs_data = make_hydrogenic_phixs(atomic_data)
        self.phixs = phixs_data
        if (self.phixs is not None and atomic_data is not None
                and cfg.data_path):
            # calibrate recombination rates to tabulated values by
            # scaling the cross sections, when recombrates.txt exists
            # (read_recombrate_file, ratecoeff.cc:837-935)
            from .phixs import calibrate_recombination
            calibrate_recombination(self.phixs, atomic_data,
                                    cfg.data_path)
        if self.detailed and atomic_data is None:
            raise ValueError(
                "opacity_case 4 requires an AtomicData instance "
                "(atomic_data=...)")
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)

        self.ts = build_timesteps(cfg)
        self.dm = DecayModel(model.nuclide_table, model.initradioabund,
                             model.t_model)
        self.grid = build_grid(model, cfg)

        # pellets + energy normalisation
        self.units: Units
        self.packets, self.etot = self._init_packets()
        assign_initial_temperatures(self.grid, self.dm,
                                    float(self.ts.mid[0]), cfg)

        if self.mesh is not None:
            from . import parallel as parallel_mod
            self.packets = parallel_mod.shard_batch(
                parallel_mod.pad_batch_to(self.packets, self.mesh.size),
                self.mesh)
        self.params = self._build_params()
        self.base_key = make_base_key(cfg.seed)
        # kernel geometry follows the PROPAGATION grid, not the model
        # dimensionality: a 1D model propagated on the forced-uniform
        # 3D Cartesian grid (cfg.grid_force_uniform, the reference's
        # default kilonova mode, map_1dmodeltogrid grid.cc:910) needs
        # the uniform boundary code
        self._grid_static = ("spherical"
                             if self.grid.grid_type == GRID_SPHERICAL1D
                             else "uniform",
                             self.grid.ncoordgrid[0])
        self._step_fn = self._make_step_fn()
        # Chunk sizing is driven by a measured per-batch-size cost
        # model: iterations per device call = target_s / (s/iter at
        # this batch size). Batch sizes quantize to npkts/2^k (the
        # compaction ladder), so a dict keyed by size converges after
        # one chunk per size. This keeps the compaction cadence tied
        # to wall time at EVERY size — the round-3 pathology was a
        # single adaptive iteration count carried across sizes and
        # timesteps, which let one full-size chunk run 3200 iterations
        # (59 s) while the active set collapsed to 2% (the analogue of
        # the reference's per-pass packet sort cadence,
        # update_packets.cc:249-320).
        self._chunk_cost: dict[int, float] = {}  # size -> EMA s/iter
        self._chunk_target_s = cfg.chunk_target_s
        # prior for unmeasured sizes (measured on TPU v5e, round 4:
        # detailed ~157 ns/lane/iter, grey ~40; + ~0.3 ms dispatch
        # floor per iteration)
        self._lane_ns_guess = 165.0 if self.detailed else 45.0
        self._chunk_iters = self._pick_chunk_iters(cfg.npkts)
        self._compact_fns: dict[tuple[int, int], object] = {}

        self.nts_done = cfg.itstep  # next timestep to run
        self.dep_log: list[dict] = []
        self.est_J_prev: Optional[np.ndarray] = None
        self.est_prev: Optional[dict] = None
        self.deltat_prev: float = 0.0

    def _make_step_fn(self):
        cfg = self.cfg
        if self.mesh is not None:
            from . import parallel as parallel_mod
            return parallel_mod.make_sharded_chunk_step(
                self.mesh,
                grid_type=self._grid_static[0],
                ncoord=self._grid_static[1],
                nmodel=self.grid.nmodel,
                rf_nbins=self._rf_nbins(),
                vp_shape=self._vp_shape(),
                nlines_stat=self._nlines_stat(),
                ion_stats_nions=self._ion_stats_nions(),
                syn_emiss_bins=self._syn_emiss_bins(),
                vgrid_shape=self._vgrid_shape(),
                n_bfcont=self._n_bfcont(),
                jb_nsel=self._jb_nsel(),
                relativistic=cfg.use_relativistic_doppler,
                detailed=self.detailed,
                polarization=cfg.polarization_on,
                vpkt=cfg.vpkt_on)
        return jax.jit(
            partial(run_timestep_chunk,
                    grid_type=self._grid_static[0],
                    ncoord=self._grid_static[1],
                    relativistic=cfg.use_relativistic_doppler,
                    detailed=self.detailed,
                    polarization=cfg.polarization_on,
                    vpkt=cfg.vpkt_on))

    def _syn_emiss_bins(self) -> int:
        return (self.cfg.syn_emiss_bins
                if self.cfg.syn_emissivity_on else 0)

    def _ion_stats_nions(self) -> int:
        return (self.atomic_data.nions_total
                if (self.detailed and self.cfg.track_ion_stats
                    and self.atomic_data is not None) else 0)

    def _nlines_stat(self) -> int:
        return (self.atomic_data.nlines
                if (self.detailed and self.cfg.linestat_on
                    and self.atomic_data is not None) else 0)

    def _n_bfcont(self) -> int:
        # per-continuum bf-rate estimators: only with the multibin
        # radfield + detailed-estimator mode, and bounded so the
        # [ncells, ncont] array stays HBM-friendly
        if not (self.detailed and self.cfg.multibin_radfield_on
                and self.cfg.detailed_bf_estimators
                and self.phixs is not None):
            return 0
        ncont = self.phixs.ncont
        return ncont if (self.grid.nmodel + 1) * ncont <= 2 ** 27 else 0

    def _rf_nbins(self) -> int:
        return (self.cfg.radfield_nbins
                if (self.detailed and self.cfg.multibin_radfield_on)
                else 0)


    def _ma_log_cap(self) -> int:
        return (self.cfg.ma_log_cap
                if (self.detailed and self.cfg.log_macroatom) else 0)


    _BF_FINE_BINS = 1024  # matches the chi_bf log-nu grid (bf_dlognu)

    def _bf_fine_bins(self) -> int:
        return self._BF_FINE_BINS if self._n_bfcont() > 0 else 0

    def _bf_sigma_tab(self) -> np.ndarray:
        """[bf_fine_bins, n_bfcont] per-continuum cross sections at
        the fine-bin centres (photoionization_crosssection_fromtable
        interpolation); contracts the kernel's sigma-free J_bf_fine
        estimator into the per-continuum bfrate array once per
        timestep."""
        tab = getattr(self, "_bf_sigma_cache", None)
        if tab is not None:
            return tab
        p = self.params
        ncont = self._n_bfcont()
        nb = self._BF_FINE_BINS
        lo = float(p.bf_lognu_min)
        dln = float(p.bf_dlognu)
        nu_b = np.exp(lo + (np.arange(nb) + 0.5) * dln)
        edge = np.asarray(p.cont_nu_edge, np.float64)[:ncont]
        cs = np.asarray(p.cont_sigma, np.float64)[:ncont]  # [nc, NP]
        NPx = cs.shape[1]
        nuinc = float(p.cont_nuinc)
        x = nu_b[:, None] / edge[None, :]
        fi = (x - 1.0) / nuinc
        i0 = np.clip(fi.astype(np.int64), 0, NPx - 2)
        frac = np.clip(fi - i0, 0.0, 1.0)
        ci = np.arange(ncont)[None, :]
        sig = cs[ci, i0] * (1.0 - frac) + cs[ci, i0 + 1] * frac
        in_t = (x >= 1.0) & (fi <= NPx - 1)
        tab = (sig * in_t).astype(np.float32)
        self._bf_sigma_cache = tab
        return tab

    def _jb_nsel(self) -> int:
        """Number of lines with detailed Jb_lu estimators
        (DETAILED_LINE_ESTIMATORS_ON; radfield.cc:276-315 selection).
        Active in the detailed NLTE mode on the non-relativistic
        kernel path (where the crossed-line range is analytic)."""
        if not (self.detailed and self.cfg.nlte_pops_on
                and self.cfg.detailed_line_estimators
                and not self.cfg.use_relativistic_doppler):
            return 0
        if not hasattr(self, "_jb_sel"):
            self._jb_sel = radfield_mod.select_detailed_lines(
                self.atomic_data)
        return len(self._jb_sel)

    def _vp_shape(self):
        return ((len(self.cfg.vpkt_obs), self.ts.n,
                 self.cfg.vpkt_nnubins)
                if self.cfg.vpkt_on else None)

    def _vgrid_shape(self):
        cfg = self.cfg
        if not (cfg.vpkt_on and cfg.vpkt_vgrid_on
                and len(cfg.vpkt_vgrid_lambda_aa)):
            return None
        return (len(cfg.vpkt_obs), len(cfg.vpkt_vgrid_lambda_aa),
                cfg.vpkt_vgrid_nv, cfg.vpkt_vgrid_nv)

    def _place_tables(self, tables: dict) -> dict:
        """Replicate the per-timestep tables over the mesh (the
        analogue of the reference's node-shared read-only windows,
        SURVEY.md §2.2)."""
        if self.mesh is not None:
            from . import parallel as parallel_mod
            return parallel_mod.replicate(tables, self.mesh)
        return tables

    _CHUNK_ITER_FLOOR_S = 3e-4  # per-iteration dispatch floor (TPU)

    def _pred_iter_s(self, size: int) -> float:
        """Predicted seconds per kernel iteration at ``size`` lanes."""
        if size in self._chunk_cost:
            return self._chunk_cost[size]
        floor = self._CHUNK_ITER_FLOOR_S
        if self._chunk_cost:
            # scale linearly in lanes from the geometrically nearest
            # measured size (cost is ~linear down to ~4k lanes)
            s0 = min(self._chunk_cost,
                     key=lambda s: abs(math.log(s / size)))
            return max(floor, (self._chunk_cost[s0] - floor)
                       * size / s0 + floor)
        return size * self._lane_ns_guess * 1e-9 + floor

    def _pick_chunk_iters(self, size: int) -> int:
        it = int(self._chunk_target_s
                 / max(self._pred_iter_s(size), 1e-7))
        return int(np.clip(it, 16, self.cfg.transport_chunk_iters))

    def _note_chunk_cost(self, size: int, iters: int, dt: float,
                         ran_full: bool):
        """EMA-update the per-size cost model after a chunk. Chunks
        that early-exited the while_loop (active set hit zero) ran
        fewer iterations than requested and are skipped."""
        if not ran_full or iters <= 0 or dt <= 0:
            return
        per = dt / iters
        old = self._chunk_cost.get(size)
        self._chunk_cost[size] = per if old is None else 0.5 * (old
                                                                + per)

    def _compact_fn(self, in_size: int, new_size: int):
        """Jitted device-side compaction: stable-partition the active
        packets to the front and gather the first ``new_size`` rows.
        Returns (small_batch, row_indices). Cached per shape pair (the
        compaction ladder is npkts/2^k, so the set is O(log N))."""
        key = (in_size, new_size)
        fn = self._compact_fns.get(key)
        if fn is None:
            from .transport.kernel import packets_active

            @jax.jit
            def fn(pk, t2):
                act = packets_active(pk, t2)
                perm = jnp.argsort(jnp.logical_not(act), stable=True)
                idx = perm[:new_size]
                small = jax.tree.map(lambda a: a[idx], pk)
                return small, idx

            self._compact_fns[key] = fn
        return fn

    def _place_batch(self, pk: PacketBatch) -> PacketBatch:
        """Re-place a packet batch on device(s): sharded over the mesh
        when one is configured, default placement otherwise."""
        if self.mesh is not None:
            from . import parallel as parallel_mod
            return parallel_mod.shard_batch(pk, self.mesh)
        return pk

    def _device_recover(self):
        """Reset the JAX backend after a device/worker crash and
        recreate everything that lived on device. The reference's
        resilience mechanism is job-step restart from checkpoint
        (sn3d.cc:420-451); on the single-chip tunnel a worker restart
        is recoverable in-process from the host-side snapshots the
        chunk loop keeps."""
        t0 = _time.time()
        while True:
            try:
                jax.clear_caches()
            except Exception:
                pass
            try:
                import jax.extend.backend as _jeb
                _jeb.clear_backends()
            except Exception:
                pass
            try:
                # probe: backend must complete a trivial computation
                jnp.zeros(8).block_until_ready()
                break
            except Exception:
                if _time.time() - t0 > 900.0:
                    raise
                _time.sleep(20.0)
        self.params = self._build_params()
        self.base_key = make_base_key(self.cfg.seed)
        self._step_fn = self._make_step_fn()

    # -- setup --------------------------------------------------------
    def _init_packets(self) -> tuple[PacketBatch, float]:
        cfg = self.cfg
        # first pass to learn etot for the energy unit
        q = self.dm.simtime_endecay_per_mass(
            cfg.tmin, cfg.tmax, from_tmodel=cfg.initial_packets)
        q_cell = q.sum(axis=1)
        if (cfg.use_model_initial_energy
                and self.grid.init_energyq is not None):
            # model initial thermal energy joins the packet energy
            # budget (packet_init, packet.cc:93-98)
            q_cell = q_cell + np.asarray(self.grid.init_energyq,
                                         np.float64)
        mgi = self.grid.cell_mgi
        etot = float(np.sum(self.grid.vol_gridcell
                            * self.grid.rho_init[mgi]
                            * q_cell[mgi] * self.grid.cell_keep))
        self.units = make_units(cfg, etot)
        batch, etot2 = init_pellets(cfg, self.grid, self.dm, self.units)
        assert abs(etot2 / etot - 1) < 1e-9
        return batch, etot

    def _build_params(self) -> TransportParams:
        cfg = self.cfg
        px, pcdf = make_planck_table()
        f32 = jnp.float32
        if self.atomic_data is not None:
            from .constants import PI
            ad = self.atomic_data
            # Sobolev tau factors: tau = (taufac_lu n_l - taufac_ul n_u)
            # * t_sim, with taufac_ul = A c^3/(8 pi nu^3) * tmin and
            # taufac_lu = (g_u/g_l) * taufac_ul (get_event,
            # rpkt.cc:172-179)
            base = (ad.line_A * CLIGHT**3
                    / (8.0 * PI * ad.line_nu**3) * self.units.tmin)
            g_ratio = (self.atomic_data.level_g[ad.line_upper]
                       / self.atomic_data.level_g[ad.line_lower])
            line_nu = jnp.asarray(ad.line_nu, f32)
            taufac_lu = jnp.asarray(base * g_ratio, f32)
            taufac_ul = jnp.asarray(base, f32)
            line_lower = jnp.asarray(ad.line_lower, jnp.int32)
            line_upper = jnp.asarray(ad.line_upper, jnp.int32)
            self._ma_static = ma_mod.build_static(ad, self.phixs)
            ma_byup = jnp.asarray(self._ma_static.byup_perm, jnp.int32)
            ma_ups = jnp.asarray(self._ma_static.up_start, jnp.int32)
            ma_bylo = jnp.asarray(self._ma_static.bylo_perm, jnp.int32)
            ma_los = jnp.asarray(self._ma_static.lo_start, jnp.int32)
            ph = self.phixs
            ma_bt = jnp.asarray(self._ma_static.bytarget_perm, jnp.int32)
            ma_ts = jnp.asarray(self._ma_static.target_start, jnp.int32)
            lvl_cont = jnp.asarray(self._ma_static.level_cont, jnp.int32)
            cont_edge = jnp.asarray(ph.cont_nu_edge, f32)
            cont_lvl = jnp.asarray(ph.cont_level, jnp.int32)
            cont_uplvl = jnp.asarray(ph.cont_upperlevel, jnp.int32)
            # static macro-atom row-packs (kernel.py phase A2b): one
            # row-gather each replaces 5-8 scalar gathers per event
            ms = self._ma_static
            nlev_t = ad.nlevels_total
            span_np = np.zeros((nlev_t, 8), np.float32)
            span_np[:, 0] = ms.up_start[:-1]
            span_np[:, 1] = ms.up_start[1:]
            span_np[:, 2] = ms.lo_start[:-1]
            span_np[:, 3] = ms.lo_start[1:]
            span_np[:, 4] = ms.target_start[:-1]
            span_np[:, 5] = ms.target_start[1:]
            span_np[:, 6] = ms.level_cont
            span_np[:, 7] = np.where(
                ms.level_cont >= 0,
                np.asarray(ph.cont_upperlevel)[
                    np.clip(ms.level_cont, 0, None)], 0)
            bylo = np.clip(ms.bylo_perm, 0, ad.nlines - 1)
            byup = np.clip(ms.byup_perm, 0, ad.nlines - 1)
            ltgt_np = np.stack(
                [bylo, byup,
                 ad.line_lower[bylo], ad.line_upper[bylo],
                 ad.line_lower[byup], ad.line_upper[byup],
                 ad.line_nu[bylo], ad.line_nu[byup]],
                axis=1).astype(np.float32)
            bt = np.clip(ms.bytarget_perm, 0, max(ph.ncont - 1, 0))
            ctgt_np = np.stack(
                [bt, np.asarray(ph.cont_level)[bt],
                 np.asarray(ph.cont_upperlevel)[bt],
                 np.asarray(ph.cont_nu_edge)[bt]],
                axis=1).astype(np.float32)
            ln_np = np.stack(
                [ad.line_nu, ad.line_lower, ad.line_upper,
                 np.zeros(ad.nlines)], axis=1).astype(np.float32)
            cn_np = np.stack(
                [np.asarray(ph.cont_nu_edge),
                 np.asarray(ph.cont_level),
                 np.asarray(ph.cont_upperlevel),
                 np.zeros(ph.ncont)], axis=1).astype(np.float32)
            cont_sigma = jnp.asarray(ph.cont_sigma, f32)
            cont_nuinc = f32(ph.nuincrement)
            # NT ionisation target: ground level of the next ion up;
            # with Auger data, ground of ion+1+a (clamped at the
            # element's top stage; nt_random_upperion,
            # nonthermal.cc:1657-1676)
            from .plasma.nonthermal import NT_MAX_AUGER_ELECTRONS
            namax = NT_MAX_AUGER_ELECTRONS
            ntt = np.full(ad.nions_total, -1, np.int32)
            ntta = np.full((ad.nions_total, namax + 1), -1, np.int32)
            for e_i in range(ad.nelements):
                s_i, e_e = (ad.elem_ion_start[e_i],
                            ad.elem_ion_start[e_i + 1])
                for i_i in range(s_i, e_e - 1):
                    ntt[i_i] = ad.ion_level_start[i_i + 1]
                    for a_i in range(namax + 1):
                        ntta[i_i, a_i] = ad.ion_level_start[
                            min(i_i + 1 + a_i, e_e - 1)]
            nt_target = jnp.asarray(ntt, jnp.int32)
            self._nt_target_auger = jnp.asarray(ntta, jnp.int32)
        else:
            line_nu = jnp.zeros(1, f32)
            taufac_lu = jnp.zeros(1, f32)
            taufac_ul = jnp.zeros(1, f32)
            line_lower = jnp.zeros(1, jnp.int32)
            line_upper = jnp.zeros(1, jnp.int32)
            self._ma_static = None
            ma_byup = jnp.zeros(1, jnp.int32)
            ma_ups = jnp.zeros(2, jnp.int32)
            ma_bylo = jnp.zeros(1, jnp.int32)
            ma_los = jnp.zeros(2, jnp.int32)
            ma_bt = jnp.zeros(1, jnp.int32)
            ma_ts = jnp.zeros(2, jnp.int32)
            lvl_cont = jnp.full(1, -1, jnp.int32)
            cont_edge = jnp.zeros(1, f32)
            cont_lvl = jnp.zeros(1, jnp.int32)
            cont_uplvl = jnp.zeros(1, jnp.int32)
            cont_sigma = jnp.zeros((1, 2), f32)
            cont_nuinc = f32(0.1)
            nt_target = jnp.full(1, -1, jnp.int32)
            span_np = np.zeros((1, 8), np.float32)
            ltgt_np = np.zeros((1, 8), np.float32)
            ctgt_np = np.zeros((1, 4), np.float32)
            ln_np = np.zeros((1, 4), np.float32)
            cn_np = np.zeros((1, 4), np.float32)
        return TransportParams(
            x_unit=f32(self.units.x_unit),
            nu_min_r=f32(cfg.nu_min_r), nu_max_r=f32(cfg.nu_max_r),
            gamma_grey=f32(cfg.gamma_grey),
            max_path_step=f32(self.grid.rmax / self.units.x_unit / 10.0),
            line_nu=line_nu, line_taufac_lu=taufac_lu,
            line_taufac_ul=taufac_ul, line_lower=line_lower,
            line_upper=line_upper,
            ma_byup_perm=ma_byup, ma_up_start=ma_ups,
            ma_bylo_perm=ma_bylo, ma_lo_start=ma_los,
            ma_bytarget_perm=ma_bt, ma_target_start=ma_ts,
            nt_target_level=nt_target,
            level_cont=lvl_cont, cont_nu_edge=cont_edge,
            cont_level=cont_lvl, cont_upperlevel=cont_uplvl,
            cont_sigma=cont_sigma, cont_nuinc=cont_nuinc,
            bf_lognu_min=f32(np.log(cfg.nu_min_r)),
            bf_dlognu=f32((np.log(cfg.nu_max_r)
                           - np.log(cfg.nu_min_r)) / 1024),
            bf_dlognu_sel=f32((np.log(cfg.nu_max_r)
                               - np.log(cfg.nu_min_r)) / 128),
            planck_x=jnp.asarray(px), planck_cdf=jnp.asarray(pcdf),
            kpkt_diffusion_dt=f32(0.0),
            rf_lognu_min=f32(np.log(cfg.nu_min_r)),
            rf_dlognu=f32((np.log(cfg.nu_max_r) - np.log(cfg.nu_min_r))
                          / max(cfg.radfield_nbins, 1)),
            vgrid_nu_ranges=jnp.asarray(
                [[CLIGHT / (lmax * 1e-8), CLIGHT / (lmin * 1e-8)]
                 for (lmin, lmax) in cfg.vpkt_vgrid_lambda_aa]
                or [[0.0, 0.0]], f32),
            vgrid_t_range=jnp.asarray(
                [self.units.time_to_sim(cfg.vpkt_vgrid_tmin_d * DAY),
                 self.units.time_to_sim(
                     min(cfg.vpkt_vgrid_tmax_d, 1e20) * DAY)], f32),
            vgrid_vmax=f32(self.grid.vmax / CLIGHT
                           if hasattr(self.grid, "vmax")
                           else self.model.vmax / CLIGHT),
            syn_dir=jnp.asarray(_unit_rows(cfg.syn_dir)[0], f32),
            syn_lognu_min=f32(np.log(max(cfg.nusyn_min, 1.0))),
            syn_dlognu=f32((np.log(max(cfg.nusyn_max, 2.0))
                            - np.log(max(cfg.nusyn_min, 1.0)))
                           / max(cfg.syn_emiss_bins, 1)),
            vpkt_obs=jnp.asarray(_unit_rows(cfg.vpkt_obs), f32),
            vpkt_t_edges=jnp.asarray(
                np.append(self.ts.start, self.ts.start[-1]
                          + self.ts.width[-1]) / self.units.tmin, f32),
            vpkt_lognu_min=f32(np.log(cfg.nu_min_r)),
            vpkt_dlognu=f32((np.log(cfg.nu_max_r)
                             - np.log(cfg.nu_min_r))
                            / max(cfg.vpkt_nnubins, 1)),
            vpkt_tau_max=f32(cfg.vpkt_tau_max),
            instant_deposit=jnp.bool_(cfg.instant_particle_deposition),
            tmin_seconds=f32(self.units.tmin),
            ma_span_pack=jnp.asarray(span_np),
            ma_ltgt_pack=jnp.asarray(ltgt_np),
            ma_ctgt_pack=jnp.asarray(ctgt_np),
            ln_pack=jnp.asarray(ln_np),
            cn_pack=jnp.asarray(cn_np),
        )

    def _tables(self, tmid: Optional[float] = None) -> dict:
        if self.detailed:
            g = self.grid
            t_sub0 = _time.time()
            levelpops, kff_base, pops = compute_case4_state(
                g, self.atomic_data, self.units)
            self._t_tables_sub = {"case4": _time.time() - t_sub0}
            t_sub0 = _time.time()
            t_mid_s = tmid if tmid is not None else float(self.ts.mid[0])
            ph = self.phixs
            rf_fit = getattr(self, "_radfield_binned", None)
            rf_raw = getattr(self, "_radfield_raw", None)
            use_raw = (rf_raw is not None
                       and self.cfg.detailed_bf_estimators)
            rf_binned = rf_raw if use_raw else rf_fit
            pirates = photoion_mod.compute_rates(
                self.atomic_data, ph, g.Te, g.TR, g.W, g.nne,
                radfield=rf_binned)
            self._t_tables_sub["pirates"] = _time.time() - t_sub0
            bf_gamma = getattr(self, "_bfrate_gamma", None)
            if use_raw and bf_gamma is not None \
                    and bf_gamma.shape == pirates.gamma_corr.shape:
                # transport-accumulated per-continuum estimators take
                # priority where sampled (get_corrphotoioncoeff's
                # gammacorr > 0 rule, ratecoeff.cc:1255-1262)
                pirates.gamma_corr = np.where(
                    bf_gamma > 0, bf_gamma, pirates.gamma_corr)
            if use_raw and rf_fit is not None:
                # estimator-vs-fitted-field diagnostic: median ratio
                # of the photoionisation rates over continua with a
                # sampled field (logged per timestep; the comparison
                # the reference gets from printing both gammaestimator
                # and corrphotoioncoeff columns)
                pir_fit = photoion_mod.compute_rates(
                    self.atomic_data, ph, g.Te, g.TR, g.W, g.nne,
                    radfield=rf_fit)
                both = ((pirates.gamma_corr > 0)
                        & (pir_fit.gamma_corr > 0))
                self.gamma_est_over_fit = (
                    float(np.median(pirates.gamma_corr[both]
                                    / pir_fit.gamma_corr[both]))
                    if both.any() else 1.0)
            # Spencer-Fano solve BEFORE the population solve, so the
            # NT ionisation rates feed the NLTE matrix (the reference
            # orders solve_spencerfano before the population update in
            # solve_Te_nltepops, update_grid.cc:775-887)
            sol = None
            nt_ion_rate_ion = None
            if self.cfg.nonthermal_on:
                if not hasattr(self, "_sf_solver"):
                    from .plasma.nonthermal import (SpencerFanoSolver,
                                                    read_collion,
                                                    read_auger_data)
                    colliondata = None
                    dp = self.cfg.data_path
                    if dp and os.path.exists(
                            os.path.join(dp, "collion.txt")):
                        colliondata = read_collion(dp)
                        n_aug = 0
                        if self.cfg.sf_auger_on:
                            n_aug = read_auger_data(dp, colliondata)
                        print(f"collion.txt: {len(colliondata)} shells"
                              f", Auger data for {n_aug}")
                    self._sf_solver = SpencerFanoSolver(
                        self.atomic_data, sfpts=self.cfg.sf_points,
                        emin_ev=self.cfg.sf_emin_ev,
                        emax_ev=self.cfg.sf_emax_ev,
                        colliondata=colliondata)
                    rst = getattr(self, "_sf_restore", None)
                    if rst is not None:
                        # checkpointed solution-reuse state
                        # (load_checkpoint): resume == continuous for
                        # the reuse policy (nonthermal.cc:2559-2581)
                        self._sf_solver._last = rst["last"]
                        self._sf_solver._last_nneperion = \
                            rst["nneperion"]
                        self._sf_solver._ts_last_solved = \
                            rst["ts_last_solved"]
                        del self._sf_restore
                # the SF wall is the batched matrix ASSEMBLY (one
                # GEMM over cells), which BLAS already parallelises —
                # range-threading it on one host only adds contention
                # (PLASMA_SOLVE.json sf_concurrent row). Shard it only
                # in true DD mode, where each rank owns its cells.
                sf_starts = self._plasma_starts()
                sf_workers = 1
                if sf_starts is not None:
                    # rank-distributed SF solve with the full-batch
                    # reuse gate applied first (sn3d.cc:951-964 +
                    # nonthermal.cc:2559-2581)
                    from .plasma import sharded as sharded_mod
                    sol = sharded_mod.solve_sf_sharded(
                        self._sf_solver, sf_starts, g.nne,
                        levelpops.astype(np.float64),
                        pops.ion_numberdens, workers=sf_workers,
                        timestep=self.nts_done,
                        max_ts_between_solutions=(
                            self.cfg.sf_max_ts_between_solutions),
                        max_fracdiff_nneperion=(
                            self.cfg.sf_max_fracdiff_nneperion))
                else:
                    sol = self._sf_solver.solve(
                        g.nne, levelpops.astype(np.float64),
                        pops.ion_numberdens, timestep=self.nts_done,
                        max_ts_between_solutions=(
                            self.cfg.sf_max_ts_between_solutions),
                        max_fracdiff_nneperion=(
                            self.cfg.sf_max_fracdiff_nneperion))
                self.sf_solution = sol
                if (self.est_prev is not None
                        and "dep_cell" in self.est_prev
                        and self.deltat_prev > 0):
                    # Y_nt[c, ion] = ion_rate_per_dep x local
                    # deposition rate density (nt_ionization_ratecoeff,
                    # nonthermal.cc:1684-1712)
                    dep_rd = self._dep_rate_density(t_mid_s)
                    nt_ion_rate_ion = (sol.ion_rate_per_dep
                                       * dep_rd[:, None])
            t_nlte0 = _time.time()
            if (self.cfg.nlte_pops_on
                    and self.nts_done >= self.cfg.num_lte_timesteps):
                # statistical-equilibrium populations replace the
                # Saha/Boltzmann set (solve_nlte_pops_element,
                # nltepop.cc:798; called from solve_Te_nltepops,
                # update_grid.cc:832-850)
                nd = lte_mod.elem_numberdens_from_massfracs(
                    self.atomic_data, g.rho, g.elem_abund)
                nlte_kw = dict(
                    radfield=rf_binned,
                    nt_ion_rate_ion=nt_ion_rate_ion,
                    nt_auger_prob=(sol.prob_num_auger
                                   if sol is not None else None),
                    jb_lu=((self._jb_sel, self._jb_lu_val)
                           if getattr(self, "_jb_lu_val", None)
                           is not None else None))
                starts, pl_workers = self._plasma_exec()
                tp = getattr(self, "_thick_prev", None)

                def solve_pops(pir):
                    if starts is not None:
                        # each rank/thread solves its owned cell
                        # range and the slices concatenate back — the
                        # reference's rank-distributed update_grid
                        # pass (sn3d.cc:951-964); bitwise equal to
                        # full-batch (tests/test_plasma_sharded.py)
                        from .plasma import sharded as sharded_mod
                        walls: list = []
                        nl = sharded_mod.solve_nlte_pops_sharded(
                            starts, self.atomic_data, ph, pir,
                            levelpops.astype(np.float64), nd, g.Te,
                            g.TR, g.W, g.nne, t_mid_s, timings=walls,
                            workers=pl_workers, **nlte_kw)
                        self._plasma_shard_walls = walls
                    else:
                        nl = nltepop_mod.solve_nlte_pops(
                            self.atomic_data, ph, pir,
                            levelpops.astype(np.float64), nd, g.Te,
                            g.TR, g.W, g.nne, t_mid_s, **nlte_kw)
                    # previously-thick cells keep the pure-LTE set
                    # (update_grid.cc:1106-1125 branch)
                    if tp is not None and tp.any():
                        nl[tp] = levelpops.astype(np.float64)[tp]
                    nne_n = nltepop_mod.nne_from_levelpops(
                        self.atomic_data, nl)
                    if tp is not None and tp.any():
                        nne_n[tp] = g.nne[tp]
                    return nl, nne_n

                def refresh_pirates():
                    pir = photoion_mod.compute_rates(
                        self.atomic_data, ph, g.Te, g.TR, g.W, g.nne,
                        radfield=rf_binned)
                    if use_raw and bf_gamma is not None \
                            and bf_gamma.shape == pir.gamma_corr.shape:
                        pir.gamma_corr = np.where(
                            bf_gamma > 0, bf_gamma, pir.gamma_corr)
                    return pir

                nl_nlte, nne_nlte = solve_pops(pirates)
                g.nne = np.where(g.rho_init > 0, nne_nlte, 0.0)
                # pops <-> T_e fixed-point iteration (the reference's
                # solve_Te_nltepops NLTEITER loop, update_grid.cc:
                # 775-887, tol 4%): re-solve the thermal balance with
                # the freshly-solved populations held fixed, then
                # re-solve the populations at the new T_e, until T_e
                # converges. Without it the NT-heated nebular state
                # can oscillate between timesteps.
                if (self.est_prev is not None
                        and self.nts_done >= self.cfg.num_lte_timesteps):
                    for _ in range(4):
                        Te_old = g.Te.copy()
                        self._solve_thermal_balance(
                            t_mid_s, fixed_nl=nl_nlte,
                            fixed_nne=g.nne, keep_thick_pinned=True)
                        dTe = np.abs(g.Te - Te_old) \
                            / np.maximum(Te_old, 1.0)
                        if float(np.max(dTe)) < 0.04:
                            break
                        pirates = refresh_pirates()
                        nl_nlte, nne_nlte = solve_pops(pirates)
                        g.nne = np.where(g.rho_init > 0, nne_nlte,
                                         0.0)
                self.nlte_levelpops = nl_nlte
                self.lte_levelpops = levelpops.astype(np.float64)
                # cells that have been through the NLTE branch at
                # least once carry a usable SF solution for the NT
                # transport channels (the reference's per-cell
                # nt_solution, solved inside solve_Te_nltepops)
                solved = ~tp if tp is not None else np.ones(
                    g.nmodel, bool)
                prev = getattr(self, "_nlte_solved_once", None)
                self._nlte_solved_once = (solved | prev
                                          if prev is not None
                                          else solved)
                levelpops = nl_nlte.astype(np.float32)
            self._t_tables_sub["nlte"] = _time.time() - t_nlte0
            # ion-stage number densities for the estimators-file
            # populations rows (update_grid.cc:65-91)
            self._ionpops_est = nltepop_mod.ion_populations(
                self.atomic_data, levelpops.astype(np.float64))
            tables = grid_device_tables(g, self.cfg, self.units,
                                        levelpops=levelpops,
                                        kff_base=kff_base)
            if not hasattr(self, "_level_ion_dev"):
                ion_of_lvl = np.repeat(
                    np.arange(self.atomic_data.nions_total),
                    np.diff(self.atomic_data.ion_level_start)
                ).astype(np.int32)
                self._level_ion_dev = jnp.asarray(ion_of_lvl)
            tables["level_ion"] = self._level_ion_dev
            if self._jb_nsel() > 0:
                tables["jb_sel"] = jnp.asarray(self._jb_sel)
            pad = lambda a: np.concatenate(
                [a, np.zeros((1,) + a.shape[1:], a.dtype)])
            # macro-atom tables built ON DEVICE (jitted, float32,
            # chunked over the linelist — macroatom_device.py); the
            # dummy padded cell row comes from padding the inputs
            t_tab0 = _time.time()
            if not hasattr(self, "_ma_builder"):
                from .plasma.macroatom_device import DeviceTableBuilder
                self._ma_builder = DeviceTableBuilder(
                    self.atomic_data, self._ma_static, ph=ph,
                    jb_sel=(self._jb_sel if self._jb_nsel() > 0
                            else None))
            pad1 = lambda a: np.concatenate([a, np.ones(1, a.dtype)])
            pir_pad = dataclasses.replace(
                pirates,
                **{f.name: pad(getattr(pirates, f.name))
                   for f in dataclasses.fields(pirates)})
            rf_pad = rf_binned
            if rf_binned is not None:
                if hasattr(rf_binned, "J_bin"):
                    rf_pad = dataclasses.replace(
                        rf_binned, J_bin=pad(rf_binned.J_bin),
                        T_R=pad(rf_binned.T_R))
                else:
                    rf_pad = dataclasses.replace(
                        rf_binned, W=pad(rf_binned.W),
                        T_R=pad(rf_binned.T_R))
            jb_val = getattr(self, "_jb_lu_val", None)
            mats = self._ma_builder.build(
                pad(levelpops), pad1(g.Te), pad1(g.TR), pad(g.W),
                pad(g.nne), t_mid_s, pirates=pir_pad,
                radfield=rf_pad,
                jb_vals=(pad(np.concatenate(
                    [jb_val, np.zeros((jb_val.shape[0], 1))],
                    axis=1).astype(np.float32))
                    if jb_val is not None else None))
            jax.block_until_ready(mats["proc_cum"])
            self._t_tables_ma = _time.time() - t_tab0
            tables["ma_proc_cum"] = mats["proc_cum"]
            # merged 5-group macro-atom selection pack (kernel.py
            # phase A2b packed path): raddeexc/downsame/upsame over
            # the byup/bylo CSR orders + radrecomb/downlower over the
            # bytarget order, one cdf_search per event
            mblk, mend = _pack_sel_device(
                [mats["w_raddeexc"], mats["w_downsame"],
                 mats["w_upsame"], mats["w_radrecomb"],
                 mats["w_downlower"]])
            tables["ma_sel_blk"] = mblk
            if mend is not None:
                tables["ma_sel_end"] = mend
            tables["kp_w_collexc"] = mats["w_kcollexc"]

            jax.block_until_ready(mblk)
            self._t_tables_sub["ma_pack"] = _time.time() - t_tab0 \
                - self._t_tables_ma
            t_sub1 = _time.time()
            # k-packet fb / collisional-ionisation cooling rows
            # (calculate_cooling_rates, kpkt.cc:120-155)
            ad = self.atomic_data
            nl64 = levelpops.astype(np.float64)
            n_l_cont = nl64[:, ph.cont_level]
            # upper-ion total populations per continuum: segment-sum
            # of level pops over each level's ion, gathered per
            # continuum (vectorised; no per-continuum loop)
            ion_of_level = np.repeat(
                np.arange(ad.nions_total),
                np.diff(ad.ion_level_start))
            ionpop = np.zeros((g.nmodel, ad.nions_total))
            np.add.at(ionpop.T, ion_of_level, nl64.T)
            upion_pop = ionpop[:, ph.cont_upperion]
            # k-packet channel weights are PER-nne (all four channels
            # are linear in nne, so the selection CDF is identical;
            # the scaling avoids f32 underflow in near-neutral cells,
            # whose channel ratio sets the ignition-phase spectrum —
            # see _line_weights in macroatom_device.py)
            w_fb = pirates.bfcooling * upion_pop
            eps_tr = (ad.level_energy[ph.cont_upperlevel]
                      - ad.level_energy[ph.cont_level])[None, :]
            nne_div = np.maximum(g.nne, 1e-300)[:, None]
            w_ci = n_l_cont * (pirates.c_ion / nne_div) * eps_tr
            tables["kp_w_fb"] = jnp.asarray(
                pad(np.cumsum(w_fb, axis=1).astype(np.float32)))
            tables["kp_w_collion"] = jnp.asarray(
                pad(np.cumsum(w_ci, axis=1).astype(np.float32)))
            # merged 3-group k-packet channel-target pack (kernel.py
            # phase A3 packed path)
            kblk, kendp = _pack_sel_device(
                [tables["kp_w_collexc"], tables["kp_w_fb"],
                 tables["kp_w_collion"]])
            tables["kp_sel_blk"] = kblk
            if kendp is not None:
                tables["kp_sel_end"] = kendp
            jax.block_until_ready(kblk)
            self._t_tables_sub["kp"] = _time.time() - t_sub1
            t_sub1 = _time.time()

            if self.cfg.vpkt_on and self.cfg.use_relativistic_doppler:
                # binned line expansion opacity for the vpkt ray-march
                # — only the relativistic fallback path reads it; in
                # the common non-relativistic configuration the kernel
                # uses the exact per-ray Sobolev march over lw_D_blk
                # and this [nmodel+1, 1024] table would be dead weight
                # (uses the bf table's log-nu binning)
                nbins_bf = 1024
                dln = (np.log(self.cfg.nu_max_r)
                       - np.log(self.cfg.nu_min_r)) / nbins_bf
                tables["chi_line_exp"] = jnp.asarray(pad(
                    ma_mod.line_expansion_opacity(
                        ad, levelpops, t_mid_s,
                        self.units.time_to_sim(t_mid_s),
                        float(np.log(self.cfg.nu_min_r)), dln,
                        nbins_bf).astype(np.float32)))

            # bound-free opacity tables
            bft = photoion_mod.build_bf_opacity_tables(
                ad, ph, levelpops, g.Te, self.units.x_unit,
                self.cfg.nu_min_r, self.cfg.nu_max_r)
            tables["chi_bf"] = jnp.asarray(pad(bft["chi_bf"]))
            tables["bf_sel_cum"] = jnp.asarray(pad(bft["bf_sel_cum"]))
            jax.block_until_ready(tables["bf_sel_cum"])
            self._t_tables_sub["bf"] = _time.time() - t_sub1
            t_sub1 = _time.time()

            # analytic-line-walk block tables (kernel.py
            # use_cum_walk): the per-cell cumulative Sobolev depth
            # lets the kernel resolve a whole inter-event line walk
            # with ~6 row-gathers
            if not self.cfg.use_relativistic_doppler:
                nl_lines = self.params.line_nu.shape[0]
                nb_w = -(-(nl_lines + 1) // 128)
                (D_blk, D_lo_blk, tau_blk, D_end, D_lo_end,
                 tau_end) = _build_line_walk_blocks(
                    pad(levelpops),
                    self.params.line_taufac_lu,
                    self.params.line_taufac_ul,
                    self.params.line_lower,
                    self.params.line_upper,
                    self.params.line_nu, nb=nb_w)
                tables["lw_D_blk"] = D_blk
                tables["lw_D_lo_blk"] = D_lo_blk
                tables["lw_tau_blk"] = tau_blk
                tables["lw_D_end"] = D_end
                tables["lw_D_lo_end"] = D_lo_end
                tables["lw_tau_end"] = tau_end
                if not hasattr(self, "_lw_nu_blk"):
                    nu_np = np.asarray(self.params.line_nu, np.float32)
                    self._lw_nu_blk = jnp.asarray(np.pad(
                        nu_np, (0, nb_w * 128 - nl_lines)
                    ).reshape(nb_w, 128))
                tables["lw_nu_blk"] = self._lw_nu_blk
                jax.block_until_ready(tables["lw_D_blk"])
            self._t_tables_sub["lw"] = _time.time() - t_sub1
            t_sub1 = _time.time()
            # per-(cell, cont) cumulative recombination emissivity for
            # O(log NP) continuum-nu sampling; gated so the table
            # cannot dominate HBM at extreme cell counts
            if (ph is not None
                    and (g.nmodel + 1) * ph.ncont
                    * self.params.cont_sigma.shape[1] <= 2 ** 26):
                tables["recomb_cum"] = _build_recomb_cum(
                    self.params.cont_sigma, self.params.cont_nu_edge,
                    self.params.cont_nuinc,
                    jnp.asarray(pad1(g.Te), jnp.float32))

            # Spencer-Fano non-thermal deposition channels (solution
            # computed above, before the population solve)
            # the reference only solves Spencer-Fano in the NLTE
            # branch (update_grid.cc:775-887, nts >=
            # num_lte_timesteps); before that do_ntlepton has no
            # solution and frac_ionization = 0 — pure heating
            in_nlte_phase = (self.nts_done
                             >= self.cfg.num_lte_timesteps)
            if self.cfg.nonthermal_on and in_nlte_phase:
                # energy-weighted per-ion ionisation selection row
                ionpots_ev = self.atomic_data.ion_ionpot / 1.6021772e-12
                w_ion = (sol.ion_rate_per_dep * pops.ion_numberdens
                         * ionpots_ev[None, :])
                # only cells with an SF solution from a previous NLTE
                # solve feed the ionisation/excitation channels
                # (do_ntlepton falls back to pure heating otherwise)
                solved = getattr(self, "_nlte_solved_once", None)
                frac_i = sol.frac_ionization.astype(np.float32)
                if solved is not None:
                    frac_i = np.where(solved, frac_i, 0.0)
                elif self.cfg.nlte_pops_on:
                    frac_i = np.zeros_like(frac_i)
                tables["nt_frac_ion"] = jnp.asarray(pad(frac_i))
                tables["nt_ion_cum"] = jnp.asarray(
                    pad(np.cumsum(w_ion, axis=1).astype(np.float32)))
                if any(r.auger_g_accumulated > 0
                       for r in self._sf_solver.collion):
                    # Auger multi-electron upper-ion selection
                    # (energy-weighted; nt_random_upperion,
                    # nonthermal.cc:1657-1676)
                    tables["nt_auger_cum"] = jnp.asarray(pad(
                        np.cumsum(sol.ionenfrac_num_auger, axis=2)
                        .astype(np.float32)))
                    tables["nt_target_auger"] = self._nt_target_auger
                if (self.cfg.nt_excitation_on
                        and sol.exc_frac is not None
                        and sol.exc_frac.shape[1] > 0):
                    # NT excitation channel: per-line cumulative
                    # deposition fractions + upper-level targets
                    # (do_ntlepton's NT_EXCITATION_ON branch,
                    # nonthermal.cc:1936-1974)
                    tables["nt_frac_exc"] = jnp.asarray(
                        pad(sol.frac_excitation.astype(np.float32)))
                    tables["nt_exc_cum"] = jnp.asarray(pad(
                        np.cumsum(sol.exc_frac, axis=1)
                        .astype(np.float32)))
                    tables["nt_exc_upper"] = jnp.asarray(
                        ad.line_upper[self._sf_solver.exc_lines]
                        .astype(np.int32))
            self._t_tables_sub["nt"] = _time.time() - t_sub1
            t_sub1 = _time.time()
            tables["cell_pack"] = self._cell_pack(tables)
            jax.block_until_ready(tables["cell_pack"])
            self._t_tables_sub["cellpack"] = _time.time() - t_sub1
            self._t_tables_sub["pack"] = (
                _time.time() - t_sub0
                - self._t_tables_sub["pirates"]
                - getattr(self, "_t_tables_ma", 0.0))
            return tables
        tables = grid_device_tables(self.grid, self.cfg, self.units)
        tables["cell_pack"] = self._cell_pack(tables)
        return tables

    def _cell_pack(self, tables: dict):
        """Packed per-propagation-cell scalar rows (kernel.py CP_*):
        one row-gather per kernel iteration replaces ~15 scalar
        gathers — the dominant per-iteration cost on TPU."""
        from .transport.kernel import build_cell_pack
        return jnp.asarray(build_cell_pack(
            tables, np.asarray(self.params.planck_x),
            np.asarray(self.params.planck_cdf),
            self.cfg.nu_min_r, self.cfg.nu_max_r))

    # -- main loop ----------------------------------------------------
    def run(self, until: Optional[int] = None, checkpoint: bool = True,
            verbose: bool = True,
            walltime_limit_s: Optional[float] = None) -> bool:
        """Advance to timestep ``until`` (default: cfg.ftstep).

        ``walltime_limit_s`` enables the reference's walltime-limited
        job-step mode (sn3d.cc main loop's do_this_full_loop /
        walltimelimitseconds handling): after each timestep, if less
        time remains than ~1.5x the slowest timestep so far, save a
        checkpoint and return False so an outer job script can
        resubmit; resume with ``Simulation(...,)`` +
        ``load_checkpoint``. Returns True when the run reached
        ``until``."""
        last = min(until if until is not None else self.cfg.ftstep,
                   self.cfg.ftstep)
        job_t0 = _time.time()
        slowest = 0.0
        while self.nts_done < last:
            ts_t0 = _time.time()
            self.advance_one_timestep(checkpoint=checkpoint,
                                      verbose=verbose)
            slowest = max(slowest, _time.time() - ts_t0)
            if walltime_limit_s is not None and self.nts_done < last:
                remaining = walltime_limit_s - (_time.time() - job_t0)
                if remaining < 1.5 * slowest:
                    if self.out_dir:
                        self.save_checkpoint(self.nts_done)
                    if verbose:
                        print(f"walltime: stopping after ts "
                              f"{self.nts_done - 1} ({remaining:.0f}s "
                              f"left < 1.5x{slowest:.0f}s)")
                    return False
        if self.out_dir:
            self.write_outputs()
        return True

    def advance_one_timestep(self, checkpoint: bool = True,
                             verbose: bool = True):
        nts = self.nts_done
        cfg = self.cfg
        tmid = float(self.ts.mid[nts])
        t_start = _time.time()

        # 0. checkpoint at timestep entry, BEFORE the grid solve
        # mutates any state (save_grid_and_packets, sn3d.cc:466-512):
        # the saved state is exactly the post-transport state of the
        # previous timestep, so a resumed advance replays this
        # timestep identically (resume == continuous, including the
        # detailed/NLTE branch whose solve updates grid.thick etc.)
        if checkpoint and self.out_dir and nts > self.cfg.itstep:
            self.save_checkpoint(nts)

        # 1. grid solve with the previous timestep's estimators
        if self.detailed:
            update_grid_common(self.grid, self.dm, cfg, tmid,
                               elements_z=self.atomic_data.elem_z)
        else:
            update_grid_grey(self.grid, self.dm, cfg, tmid)
        if self.est_J_prev is not None and self.deltat_prev > 0:
            J_cgs = normalise_J(self.est_J_prev, self.grid, self.units,
                                tmid, self.deltat_prev)
            # nebular-phase branch: dilute-blackbody fit + thermal
            # balance T_e after the forced-LTE timesteps
            # (update_grid_cell's non-initial_iteration branch,
            # update_grid.cc:1126-1158)
            # cells optically thick in the previous timestep keep the
            # pure-LTE treatment even past num_lte_timesteps
            # (update_grid.cc:1106 reads the thick flag set by the
            # previous timestep's update_grid_cell)
            thick_prev = (np.asarray(self.grid.thick) == 1)
            # cells optically thick in the previous timestep take the
            # pure-LTE branch this timestep (update_grid.cc:1106 reads
            # the flag set by the previous update); the NLTE pops /
            # SF channels in _tables() respect this mask
            self._thick_prev = thick_prev.copy()
            if (self.detailed and nts >= cfg.num_lte_timesteps
                    and self.est_prev is not None):
                with np.errstate(invalid="ignore", divide="ignore"):
                    nubar = (self.est_prev["nuJ"][:self.grid.nmodel]
                             / np.maximum(
                                 self.est_prev["J"][:self.grid.nmodel],
                                 1e-30))
                fit_fullspec_dilute(self.grid, cfg, J_cgs, nubar)
                self._solve_thermal_balance(tmid)
                # LTE pinning for previously-thick cells: TR = Te =
                # TJ = T_J(J), W = 1 (update_grid.cc:1104-1125)
                if thick_prev.any():
                    g = self.grid
                    with np.errstate(invalid="ignore"):
                        T_J = (J_cgs * PI / STEBO) ** 0.25
                    # estimator-starved cells clamp to MINTEMP
                    # (get_T_J_from_J, radfield.cc:1464-1481)
                    T_J = np.where(np.isfinite(T_J), T_J, g.TJ)
                    T_J = np.clip(T_J, cfg.mintemp, cfg.maxtemp)
                    for arr in (g.Te, g.TR, g.TJ):
                        arr[thick_prev] = T_J[thick_prev]
                    g.W[thick_prev] = 1.0
                if (cfg.multibin_radfield_on
                        and "J_bin" in self.est_prev):
                    # per-bin (W, T_R) fits from the binned estimators
                    # (fit_parameters, radfield.cc:1177-1290); the
                    # fitted field feeds this timestep's rate integrals
                    g = self.grid
                    deltaV = g.vol_init * (tmid / g.tmin) ** 3
                    norm = (self.units.x_unit * self.units.e0
                            / (4.0 * np.pi * deltaV
                               * self.deltat_prev))
                    Jb = (self.est_prev["J_bin"][:g.nmodel]
                          * norm[:, None])
                    nuJb = (self.est_prev["nuJ_bin"][:g.nmodel]
                            * norm[:, None])
                    edges = radfield_mod.make_bin_edges(
                        cfg.nu_min_r, cfg.nu_max_r,
                        cfg.radfield_nbins)
                    # the multibin field only feeds the rate
                    # machinery from FIRST_NLTE_RADFIELD_TIMESTEP on
                    # (radfield.cc MULTIBIN activation,
                    # artisoptions_nltenebular.h:99); before that the
                    # fullspec dilute fit drives the rates
                    if nts >= cfg.first_nlte_radfield_ts:
                        self._radfield_binned = \
                            radfield_mod.fit_bin_parameters(
                                Jb, nuJb, edges, cfg.mintemp,
                                cfg.maxtemp)
                        # detailed bf estimators: keep the raw binned
                        # J as a piecewise-constant field (the
                        # analogue of update_bfestimators,
                        # radfield.cc:764-828)
                        if cfg.detailed_bf_estimators:
                            self._radfield_raw = \
                                radfield_mod.RawBinnedField(
                                    nu_edges=edges, J_bin=Jb,
                                    T_R=self._radfield_binned.T_R)
                    if ("bfrate" in self.est_prev
                            and nts >= cfg.detailed_bfest_from_ts):
                        # per-continuum photoionisation rate
                        # coefficients from the exact-sigma path
                        # estimators (normalise_bf_estimators,
                        # radfield.cc:764-828; estimator_normfactor
                        # / H, update_grid.cc:1150): these replace
                        # the binned-field integrals, which smear
                        # narrow line photons across whole bins
                        from .constants import H as _H
                        bf_norm = (self.units.x_unit * self.units.e0
                                   / (deltaV * self.deltat_prev * _H))
                        self._bfrate_gamma = (
                            self.est_prev["bfrate"][:g.nmodel]
                            * bf_norm[:, None])
                if ("jb_diff" in self.est_prev
                        and self._jb_nsel() > 0
                        and nts >= cfg.first_nlte_radfield_ts):
                    # per-line Jb_lu estimators: prefix-sum the
                    # interval difference arrays accumulated by the
                    # kernel, scale by the per-line 1/nu and the same
                    # normalisation as J (normalise_J,
                    # radfield.cc:1297-1305) -> J_nu at each detailed
                    # line [erg/s/cm^2/Hz/sr], replacing the binned
                    # field in the radiative excitation rates
                    S = self._jb_nsel()
                    raw = np.cumsum(
                        np.asarray(self.est_prev["jb_diff"],
                                   np.float64)[:g.nmodel],
                        axis=1)[:, :S]
                    cnt = np.cumsum(
                        np.asarray(self.est_prev["jb_cnt"],
                                   np.int64)[:g.nmodel],
                        axis=1)[:, :S]
                    nu_sel = self.atomic_data.line_nu[self._jb_sel]
                    jb_norm = (self.units.x_unit * self.units.e0
                               / (4.0 * np.pi
                                  * np.maximum(deltaV, 1e-300)
                                  * self.deltat_prev))
                    self._jb_lu_val = np.maximum(
                        raw, 0.0) * jb_norm[:, None] / nu_sel[None, :]
                    self._jb_lu_cnt = cnt
            else:
                update_temperatures_from_J(self.grid, cfg, J_cgs)
        if self.detailed:
            update_thick_flags(self.grid, cfg, nts, tmid)
        # phase timing: grid/plasma solve finished here (the analogue
        # of the reference's per-phase printouts, sn3d.cc:553-554)
        self._t_solve = _time.time() - t_start

        # 3. transport on device, in bounded chunks of events (the
        # host re-invokes until every packet reached t2 — analogue of
        # the reference's multi-pass loop, update_packets.cc:249-320).
        # When only a ragged tail of packets remains in flight, the
        # active set is compacted into a smaller batch so the while
        # loop stops paying for finished lanes (the TPU answer to the
        # reference's density sort for load balance,
        # update_packets.cc:204-232).
        t2_sim = self.units.time_to_sim(self.ts.end(nts))
        # per-timestep kpkt diffusion delay (kpkt.cc:505-512)
        dt_diff = 0.0
        if nts < cfg.n_kpktdiffusion_timesteps:
            dt_diff = (cfg.kpktdiffusion_timescale
                       * self.units.time_to_sim(float(self.ts.width[nts])))
        self.params = dataclasses.replace(
            self.params, kpkt_diffusion_dt=jnp.float32(dt_diff))
        t_up0 = _time.time()
        tables = self._place_tables(self._tables(tmid))
        # block on the largest array so the host->device upload cost
        # is attributed here rather than to the first chunk
        jax.block_until_ready(max(tables.values(),
                                  key=lambda v: getattr(v, "size", 0)))
        t_tables_up = _time.time() - t_up0

        # per-timestep grid-state rows in the reference's
        # estimators_XXXX.out format (update_grid.cc:42-658), written
        # with the state driving this timestep's transport (incl. the
        # Saha nne computed in the table build, matching the
        # reference's write order inside update_grid_cell)
        if self.out_dir:
            from .output import append_estimators
            est_path = os.path.join(self.out_dir, "estimators_0000.out")
            if nts == self.cfg.itstep and os.path.exists(est_path):
                os.remove(est_path)
            append_estimators(est_path, self.grid, nts, self.ts,
                              heatingcooling=getattr(
                                  self, "_heatcool", None),
                              ad=self.atomic_data,
                              ionpops=getattr(self, "_ionpops_est",
                                              None))
            if getattr(self, "_radfield_binned", None) is not None:
                # per-timestep multibin fit rows (the reference writes
                # radfield.out every timestep, radfield.cc:611-660)
                rf_path = os.path.join(self.out_dir, "radfield.out")
                if nts == self.cfg.itstep and os.path.exists(rf_path):
                    os.remove(rf_path)
                rr = getattr(self, "_radfield_raw", None)
                radfield_mod.write_radfield_file(
                    rf_path, self._radfield_binned, nts,
                    float(tmid) / DAY,
                    append=os.path.exists(rf_path),
                    J_bin=(rr.J_bin if rr is not None else None))
            if (getattr(self, "_ion_stats_prev", None) is not None
                    and self.deltat_prev > 0):
                from .output import append_ion_stats
                g = self.grid
                deltaV = g.vol_init * (tmid / g.tmin) ** 3
                append_ion_stats(
                    est_path, self.atomic_data, self._ion_stats_prev,
                    nts, self.units.e0 / (deltaV * self.deltat_prev))

        pk = self.packets
        rf_nbins = self._rf_nbins()
        vp_shape = self._vp_shape()
        if self._domain_decomp:
            pk, est_dd = self._transport_domain(nts, tables, t2_sim)
            self.packets = pk
            est_np = {k: (float(v) if np.asarray(v).ndim == 0
                          else np.asarray(v))
                      for k, v in est_dd.items()}
            return self._finish_timestep(nts, tmid, est_np, t_start,
                                          verbose)
        est = zero_estimators(self.grid.nmodel, rf_nbins, vp_shape,
                              nlines_stat=self._nlines_stat(),
                              ion_stats_nions=self._ion_stats_nions(),
                              syn_emiss_bins=self._syn_emiss_bins(),
                              vgrid_shape=self._vgrid_shape(),
                              n_bfcont=self._n_bfcont(),
                              jb_nsel=self._jb_nsel(),
                              ma_log_cap=self._ma_log_cap(),
                              bf_fine_bins=self._bf_fine_bins())
        chunks = 0
        iters_done = 0
        # per-phase wall-time tracing (the analogue of the reference's
        # per-phase printouts, sn3d.cc:553-554): chunks = device
        # executions; snap = crash-recovery snapshots (tunnel
        # transfers); compact = tail compaction; estfetch = estimator
        # device->host fetch
        self._t_phase = {"tables_up": t_tables_up, "chunks": 0.0,
                         "snap": 0.0, "compact": 0.0, "estfetch": 0.0}
        compact_stack: list[tuple[PacketBatch, jax.Array]] = []
        t2_f32 = jnp.float32(t2_sim)
        # host-side snapshot for in-process recovery from a device /
        # tunnel worker crash. Snapshots are device->host transfers of
        # the full megabatch over the TUNNEL (tens of MB), so they are
        # taken on a time cadence, not per chunk — a crash redoes at
        # most ~snap_every seconds of transport. snap and snap_stack
        # are captured together (the compaction stack must match the
        # snapshotted batch's shape).
        snap = None
        snap_stack: list[tuple[dict, np.ndarray]] = []
        snap_every = 45.0
        last_snap_t = _time.time()
        crash_retries = 0
        pending_restore = False
        while True:
            t_chunk = _time.time()
            try:
                if pending_restore:
                    # the restore itself runs inside the retried block:
                    # if the backend is still down it throws again and
                    # we wait longer
                    self._device_recover()
                    tables = self._place_tables(self._tables(tmid))
                    t2_f32 = jnp.float32(t2_sim)
                    if snap is None:
                        pk = self._place_batch(
                            from_numpy(to_numpy(self.packets)))
                        est = zero_estimators(
                            self.grid.nmodel, rf_nbins, vp_shape,
                            nlines_stat=self._nlines_stat(),
                            ion_stats_nions=self._ion_stats_nions(),
                            syn_emiss_bins=self._syn_emiss_bins(),
                            vgrid_shape=self._vgrid_shape(),
                            n_bfcont=self._n_bfcont(),
                            jb_nsel=self._jb_nsel(),
                            ma_log_cap=self._ma_log_cap(),
                            bf_fine_bins=self._bf_fine_bins())
                        compact_stack, snap_stack = [], []
                    else:
                        pk = self._place_batch(from_numpy(snap[0]))
                        est = {k: jnp.asarray(v)
                               for k, v in snap[1].items()}
                        compact_stack = [
                            (self._place_batch(from_numpy(p)),
                             jnp.asarray(i))
                            for p, i in snap_stack]
                    pending_restore = False
                self._chunk_iters = self._pick_chunk_iters(pk.n)
                pk, est, n_active = self._step_fn(
                    pk, est, tables, self.params, t2_f32, nts == 0,
                    self.base_key, jnp.int32(self._chunk_iters))
                chunks += 1
                n_act = int(n_active)  # also syncs the device
            except jax.errors.JaxRuntimeError as err:
                crash_retries += 1
                if crash_retries > 8 or "UNAVAILABLE" not in str(err):
                    raise
                print(f"  [ts {nts}] device crash "
                      f"({str(err).splitlines()[0][:100]}); "
                      f"recovering ({crash_retries}/8)", flush=True)
                # the tunnel worker takes minutes to come back; back
                # off progressively before each recovery attempt
                _time.sleep(min(30.0 * crash_retries, 180.0))
                pending_restore = True
                # long executions are a suspected crash trigger on the
                # tunnel: resume with shorter device executions
                self._chunk_target_s = max(0.75,
                                           self._chunk_target_s * 0.5)
                continue
            crash_retries = 0
            dt_chunk = _time.time() - t_chunk
            self._t_phase["chunks"] += dt_chunk
            if _time.time() - last_snap_t >= snap_every:
                t_s0 = _time.time()
                # stack entries are immutable once pushed: snapshot
                # only the new ones
                while len(snap_stack) < len(compact_stack):
                    p, i = compact_stack[len(snap_stack)]
                    snap_stack.append((to_numpy(p), np.asarray(i)))
                snap = (to_numpy(pk),
                        {k: np.asarray(v) for k, v in est.items()})
                last_snap_t = _time.time()
                self._t_phase["snap"] += _time.time() - t_s0
            iters_done += self._chunk_iters
            self._note_chunk_cost(pk.n, self._chunk_iters, dt_chunk,
                                  ran_full=n_act > 0)
            if verbose and chunks % 20 == 0:
                print(f"  [ts {nts}] chunk {chunks}: "
                      f"{n_act}/{pk.n} packets still in flight",
                      flush=True)
            if n_act == 0:
                break
            if iters_done > self.cfg.max_transport_iters:
                raise RuntimeError(
                    f"transport did not converge: {n_act} packets "
                    f"active after {chunks} chunks")
            t_c0 = _time.time()
            pk, compact_stack = self._maybe_compact(
                pk, n_act, t2_f32, compact_stack)
            self._t_phase["compact"] += _time.time() - t_c0
        # unwind compactions: scatter tail results back into the full
        # batch (padded rows carry out-of-range indices and are dropped)
        t_c0 = _time.time()
        while compact_stack:
            parent, idx_pad = compact_stack.pop()
            pk = jax.tree.map(
                lambda a, s: a.at[idx_pad].set(s, mode="drop"),
                parent, pk)
            pk = self._place_batch(pk)
        self.packets = pk
        self._t_phase["compact"] += _time.time() - t_c0

        t_e0 = _time.time()
        est_np = self._fetch_estimators(est)
        if "J_bf_fine" in est_np:
            # contract the sigma-free fine-binned path integrand with
            # the per-continuum sigma table (see _bf_sigma_tab)
            est_np["bfrate"] = (
                est_np.pop("J_bf_fine") @ self._bf_sigma_tab())
        self._t_phase["estfetch"] = _time.time() - t_e0
        return self._finish_timestep(nts, tmid, est_np, t_start,
                                      verbose)

    def _fetch_estimators(self, est: dict) -> dict:
        """Device->host fetch of the whole estimator dict in TWO
        transfers (one float, one integer) instead of one RPC per
        leaf — per-leaf fetches over the TPU tunnel cost a round-trip
        each (~3 s/timestep at ~35 leaves)."""
        keys = sorted(est)
        sig = tuple((k, est[k].dtype.str, est[k].shape) for k in keys)
        if getattr(self, "_est_pack_sig", None) != sig:
            fkeys = [k for k in keys
                     if jnp.issubdtype(est[k].dtype, jnp.floating)]
            ikeys = [k for k in keys if k not in fkeys]

            @jax.jit
            def packer(e):
                fv = (jnp.concatenate(
                    [e[k].ravel().astype(jnp.float32) for k in fkeys])
                    if fkeys else jnp.zeros(0, jnp.float32))
                iv = (jnp.concatenate(
                    [e[k].ravel().astype(jnp.int32) for k in ikeys])
                    if ikeys else jnp.zeros(0, jnp.int32))
                return fv, iv

            self._est_pack_fn = packer
            self._est_pack_keys = (fkeys, ikeys)
            self._est_pack_sig = sig
        fkeys, ikeys = self._est_pack_keys
        fv, iv = self._est_pack_fn(est)
        fv, iv = np.asarray(fv), np.asarray(iv)
        out = {}
        for vec, group in ((fv, fkeys), (iv, ikeys)):
            off = 0
            for k in group:
                n = int(np.prod(est[k].shape)) if est[k].shape else 1
                v = vec[off:off + n].reshape(est[k].shape)
                out[k] = float(v) if v.ndim == 0 else v
                off += n
        return out

    def _plasma_starts(self):
        """Owned model-cell ranges for the rank-distributed plasma
        solve (plasma/sharded.py). In DD mode the plasma solve reuses
        the transport decomposition's contiguous equal-nonempty cell
        split (setup_nstart_ndo, grid.cc:1931-1998) so the transport
        tables and plasma state share one ownership map; None when not
        domain-decomposed (full-batch host solve)."""
        if not self._domain_decomp:
            return None
        if hasattr(self, "_dd_plan"):
            return self._dd_plan.starts
        from . import domain as dom
        plan = dom.plan_decomposition(
            np.arange(self.grid.nmodel), self.grid.nmodel,
            self.grid.rho_init, self._dd_ndev, self.cfg.npkts)
        return plan.starts

    def _plasma_exec(self):
        """(starts, workers) for the rank-distributed plasma solves.

        DD mode reuses the transport decomposition's cell ranges; a
        plain single-host run still splits the cells into
        ``plasma_workers`` ranges so the NLTE / Spencer-Fano / Te
        solves overlap on host cores (plasma.sharded.run_ranges) —
        the concurrency the reference gets from MPI ranks
        (sn3d.cc:951-964). Returns (None, 1) when a split is not
        worth it (few cells)."""
        w = self.cfg.plasma_workers
        if w == 0:
            w = min(os.cpu_count() or 1, 8)
        starts = self._plasma_starts()
        if starts is not None:
            return starts, w
        n = self.grid.nmodel
        if w <= 1 or n < 4 * w:
            return None, 1
        bounds = np.linspace(0, n, w + 1).astype(int)
        return tuple(int(b) for b in bounds), w

    def _transport_domain(self, nts, tables, t2_sim):
        """Grid-domain-decomposed transport for one timestep
        (domain.py): every per-cell table — including the detailed
        [ncells, nlines] macro-atom/line-walk/bf packs — is sharded
        spatially over the 'dd' mesh axis, and packets migrate to
        their cell's owner device via sorted capacity-bounded
        all-to-all rounds. This is the BASELINE north-star design the
        reference cannot express (its transport grid is fully
        replicated per rank, SURVEY.md §5.7)."""
        from . import domain as dom
        tab_np = {k: np.asarray(v) for k, v in tables.items()}
        if not hasattr(self, "_dd_mesh"):
            self._dd_mesh = dom.make_domain_mesh(self._dd_ndev)
            self._dd_plan = dom.plan_decomposition(
                tab_np["cell_mgi"], self.grid.nmodel,
                self.grid.rho_init, self._dd_mesh.size,
                self.cfg.npkts, halo=self.cfg.dd_halo)
        plan, mesh = self._dd_plan, self._dd_mesh
        dtab, specs = dom.shard_domain_tables(tab_np, plan, mesh)
        key_sig = frozenset(specs.keys())
        if getattr(self, "_dd_step_sig", None) != key_sig:
            self._dd_step = dom.make_domain_step(
                mesh, plan, specs, grid_type=self._grid_static[0],
                ncoord=self._grid_static[1],
                rf_nbins=self._rf_nbins(), vp_shape=self._vp_shape(),
                nlines_stat=self._nlines_stat(),
                ion_stats_nions=self._ion_stats_nions(),
                syn_emiss_bins=self._syn_emiss_bins(),
                vgrid_shape=self._vgrid_shape(),
                n_bfcont=self._n_bfcont(),
                jb_nsel=self._jb_nsel(),
                relativistic=self.cfg.use_relativistic_doppler,
                detailed=self.detailed,
                polarization=self.cfg.polarization_on,
                vpkt=self.cfg.vpkt_on)
            self._dd_step_sig = key_sig
        pkd = dom.scatter_packets(self.packets, plan, mesh)
        estd = dom.make_domain_est(
            plan, mesh, self._rf_nbins(), self._vp_shape(),
            nlines_stat=self._nlines_stat(),
            ion_stats_nions=self._ion_stats_nions(),
            syn_emiss_bins=self._syn_emiss_bins(),
            vgrid_shape=self._vgrid_shape(),
            n_bfcont=self._n_bfcont(), jb_nsel=self._jb_nsel())
        dd_stats: dict = {}
        pkd, estd, rounds = dom.run_domain_timestep(
            self._dd_step, pkd, estd, dtab, self.params, t2_sim,
            nts == 0, self.base_key,
            int(min(self._chunk_iters, 256)), stats_out=dd_stats)
        self._dd_rounds = rounds
        self._dd_stats = dd_stats
        pk = dom.gather_packets(pkd, plan, self.cfg.npkts)
        est = dom.assemble_estimators(
            jax.tree.map(np.asarray, estd), plan)
        return pk, est

    def _finish_timestep(self, nts, tmid, est_np, t_start, verbose):
        """Post-transport bookkeeping shared by the packet-sharded and
        domain-decomposed transport paths: estimator carry-over,
        cumulative accumulators, per-timestep outputs and logging."""
        pk = self.packets
        cfg = self.cfg
        self.est_J_prev = est_np["J"]
        self.est_prev = {k: est_np[k] for k in
                         ("J", "nuJ", "ffheat", "colheat", "dep_cell")
                         if k in est_np}
        for k in ("J_bin", "nuJ_bin", "compton_emiss", "pp_emiss",
                  "bfrate", "jb_diff", "jb_cnt"):
            if k in est_np:
                self.est_prev[k] = est_np[k]
        self.deltat_prev = float(self.ts.width[nts])
        if "vpkt_I" in est_np:
            if not hasattr(self, "vspec_I"):
                self.vspec_I = np.zeros_like(est_np["vpkt_I"])
                self.vspec_Q = np.zeros_like(est_np["vpkt_I"])
                self.vspec_U = np.zeros_like(est_np["vpkt_I"])
            self.vspec_I = self.vspec_I + est_np["vpkt_I"]
            self.vspec_Q = self.vspec_Q + est_np.get(
                "vpkt_Q", np.zeros_like(est_np["vpkt_I"]))
            self.vspec_U = self.vspec_U + est_np.get(
                "vpkt_U", np.zeros_like(est_np["vpkt_I"]))
        if "vgrid_I" in est_np:
            if not hasattr(self, "vgrid_I"):
                self.vgrid_I = np.zeros_like(est_np["vgrid_I"])
                self.vgrid_Q = np.zeros_like(est_np["vgrid_I"])
                self.vgrid_U = np.zeros_like(est_np["vgrid_I"])
            self.vgrid_I = self.vgrid_I + est_np["vgrid_I"]
            self.vgrid_Q = self.vgrid_Q + est_np["vgrid_Q"]
            self.vgrid_U = self.vgrid_U + est_np["vgrid_U"]
        if "ion_stats" in est_np:
            self._ion_stats_prev = est_np["ion_stats"]
        self._record_deposition(nts, est_np)
        if self.out_dir and "compton_emiss" in est_np:
            # compton/pp emissivity estimators, normalised by
            # 1/(dV dt) (normalise_compton_estimators,
            # emissivities.cc:172-220)
            from .output import write_compton_estimators
            g = self.grid
            deltaV = g.vol_init * (tmid / g.tmin) ** 3
            norm = self.units.e0 * self.units.x_unit / (
                deltaV * self.deltat_prev)
            write_compton_estimators(
                os.path.join(self.out_dir, f"compton_emiss_{nts:04d}.out"),
                np.asarray(est_np["compton_emiss"])[:g.nmodel]
                * norm[:, None],
                np.asarray(est_np["pp_emiss"])[:g.nmodel] * norm,
                self.cfg, nts)
        if self.out_dir and "line_em" in est_np:
            from .output import (write_linestat_header,
                                 append_linestat)
            ls_path = os.path.join(self.out_dir, "linestat.out")
            if nts == self.cfg.itstep or not os.path.exists(ls_path):
                write_linestat_header(ls_path, self.atomic_data)
            append_linestat(ls_path, est_np["line_em"],
                            est_np["line_ab"])
        if self.out_dir and "ma_log_i" in est_np:
            from .output import append_macroatom_log
            ma_path = os.path.join(self.out_dir, "macroatom.out")
            if nts == self.cfg.itstep and os.path.exists(ma_path):
                os.remove(ma_path)
            append_macroatom_log(
                ma_path, nts, self.atomic_data, est_np["ma_log_i"],
                est_np["ma_log_f"], int(est_np["ma_log_n"]))

        if verbose:
            e0 = self.units.e0
            print(f"[ts {nts:3d}] tmid={tmid / DAY:7.3f} d  "
                  f"iters={int(est_np['iterations']):6d}  "
                  f"escaped={int(np.sum(np.asarray(pk.ptype) == 32)):8d}  "
                  f"gamma_dep={est_np['gamma_dep'] * e0 / self.deltat_prev / LSUN:9.3e} Lsun  "
                  f"escatters={int(est_np['escounter']):9d}  "
                  f"({_time.time() - t_start:5.1f}s"
                  + (f"; solve {self._t_solve:.1f}s"
                     if hasattr(self, "_t_solve") else "")
                  + (f"; tables {self._t_tables_ma:.1f}s"
                     if hasattr(self, "_t_tables_ma") else "")
                  + (("; " + " ".join(
                      f"{k} {v:.1f}s"
                      for k, v in self._t_phase.items() if v >= 0.05))
                     if hasattr(self, "_t_phase") else "")
                  + ")")

        self.nts_done = nts + 1

    def _solve_thermal_balance(self, tmid: float,
                               fixed_nl=None, fixed_nne=None,
                               keep_thick_pinned: bool = False):
        """T_e from heating = cooling using the previous timestep's
        estimators (solve_Te_nltepops' T_e part,
        update_grid.cc:763-888).

        ``fixed_nl``/``fixed_nne`` override the population set held
        fixed during the root solve (defaults to the previous NLTE
        set when nlte_pops_on) — used by the pops<->Te fixed-point
        iteration in _tables (solve_Te_nltepops' NLTEITER loop,
        update_grid.cc:775-887). ``keep_thick_pinned`` preserves the
        LTE-pinned Te of previously-thick cells."""
        g = self.grid
        deltaV = g.vol_init * (tmid / g.tmin) ** 3
        norm = self.units.e0 / (deltaV * self.deltat_prev)
        ffheat = self.est_prev["ffheat"][:g.nmodel] * norm
        colheat = self.est_prev["colheat"][:g.nmodel] * norm
        # non-thermal deposition heating: nt_frac_heating x
        # deposition rate density (thermalbalance.cc:370-390); with the
        # Spencer-Fano solution pending the first solve, the reference
        # initialises frac_heating to 0.97 (nonthermal.cc:513)
        dep_heating = None
        # deposition heating enters the balance in the "gamma-ray
        # heating" estimator mode (do_rlc_est == 3,
        # thermalbalance.cc:373-377) — all bundled fixtures use it;
        # without a Spencer-Fano solution frac_heating = 1 (the
        # reference's no-NT_ON limit; 0.97 is its pre-solve default
        # when NT is on, nonthermal.cc:513)
        if self.cfg.do_rlc_est == 3 and "dep_cell" in self.est_prev:
            dep_rate_density = self._dep_rate_density(tmid)
            sol = (getattr(self, "sf_solution", None)
                   if self.cfg.nonthermal_on else None)
            frac_heat = (sol.frac_heating if sol is not None
                         else np.full(g.nmodel,
                                      0.97 if self.cfg.nonthermal_on
                                      else 1.0))
            dep_heating = frac_heat * dep_rate_density
        nd = lte_mod.elem_numberdens_from_massfracs(
            self.atomic_data, g.rho, g.elem_abund)
        # bf-heating integrates the measured binned field when the
        # detailed bf estimators are active (the reference's
        # transport-accumulated bfheatingestimator, rpkt.cc:557-621)
        rf_raw = getattr(self, "_radfield_raw", None)
        rf_te = (rf_raw if (rf_raw is not None
                            and self.cfg.detailed_bf_estimators)
                 else getattr(self, "_radfield_binned", None))
        # in the NLTE phase the balance is evaluated with the CURRENT
        # statistical-equilibrium populations held fixed — the
        # reference's call_T_e_finder uses the grid's stored pops
        # (thermalbalance.cc:218-396); recomputing LTE Saha at each
        # trial T_e badly overstates nne + collisional cooling in
        # non-thermally-ionised nebular gas
        if fixed_nl is None:
            fixed_nl = (getattr(self, "nlte_levelpops", None)
                        if self.cfg.nlte_pops_on else None)
            fixed_nne = g.nne if fixed_nl is not None else None
        starts, te_workers = self._plasma_exec()
        if starts is not None:
            # rank-distributed T_e solve over owned cell ranges
            # (sn3d.cc:951-964), bitwise equal to full-batch
            from .plasma import sharded as sharded_mod
            per_cell = dict(elem_numberdens=nd, TR=g.TR, W=g.W,
                            ffheat_est=ffheat, colheat_est=colheat,
                            vol_tmin=g.vol_init,
                            dep_heating=dep_heating, radfield=rf_te,
                            fixed_nl=fixed_nl, fixed_nne=fixed_nne)
            repl = dict(ad=self.atomic_data, ph=self.phixs,
                        t_mid=tmid, tmin=g.tmin,
                        mintemp=self.cfg.mintemp,
                        maxtemp=self.cfg.maxtemp)
            Te = sharded_mod.solve_te_sharded(
                starts, thermal_mod.solve_Te, g.nmodel, per_cell,
                repl, workers=te_workers)
        else:
            Te = thermal_mod.solve_Te(
                self.atomic_data, self.phixs, nd, g.TR, g.W, ffheat,
                colheat, tmid, g.vol_init, g.tmin, self.cfg.mintemp,
                self.cfg.maxtemp, dep_heating=dep_heating,
                radfield=rf_te, fixed_nl=fixed_nl,
                fixed_nne=fixed_nne)
        if keep_thick_pinned:
            tp = getattr(self, "_thick_prev", None)
            if tp is not None and tp.any():
                Te = np.where(tp, g.Te, Te)
        g.Te = np.where(g.rho_init > 0, Te, 0.0)
        # diagnostic heating/cooling rows at the solved T_e
        # (update_grid.cc:642-649)
        self._heatcool = thermal_mod.heating_cooling_breakdown(
            self.atomic_data, self.phixs, nd, Te, g.TR, g.W, ffheat,
            colheat, tmid, dep_heating=dep_heating, radfield=rf_te,
            fixed_nl=fixed_nl, fixed_nne=fixed_nne)
        return Te

    def _dep_rate_density(self, tmid: float) -> np.ndarray:
        """Local energy deposition rate density per cell [erg/s/cm^3]
        from the previous timestep's per-cell deposition estimator
        (calculate_deposition_rate_density, nonthermal.cc:626)."""
        g = self.grid
        deltaV = g.vol_init * (tmid / g.tmin) ** 3
        norm = self.units.e0 / (deltaV * self.deltat_prev)
        return self.est_prev["dep_cell"][:g.nmodel] * norm

    def _maybe_compact(self, pk: PacketBatch, n_act: int, t2_f32,
                       stack: list):
        """Gather the active packets into a smaller batch when most
        lanes are done. Batch sizes are restricted to N/2^k (k >= 0)
        to bound the number of distinct compilations (each shape
        compiles once; the persistent cache keeps it across runs)."""
        size = pk.n
        min_size = self.cfg.compact_min_size
        ndev = self.mesh.size if self.mesh is not None else 1
        new_size = size
        while (new_size // 2 >= max(min_size, int(1.3 * n_act) + 1)
               and new_size // 2 >= 1
               and (new_size // 2) % ndev == 0):
            new_size //= 2
        if new_size >= size:
            return pk, stack
        if self.mesh is None:
            # device-side: stable-partition active rows to the front
            # and keep the first half (>= 1.3*n_act by the ladder
            # condition above, so every active row fits; the tail rows
            # are genuinely inactive packets, which _event_step leaves
            # untouched, so the unwind scatter writes them back
            # unchanged). No host round-trip of the megabatch.
            # Shrinking strictly by HALVES keeps the compiled-shape
            # ladder fixed at ~log2(npkts) pairs that every timestep
            # reuses (arbitrary (in, out) pairs made each fresh run
            # compile new kernels).
            while pk.n > new_size:
                half = pk.n // 2
                small, idx = self._compact_fn(pk.n, half)(pk, t2_f32)
                stack.append((pk, idx))
                pk = small
            return pk, stack
        # sharded path: host-side gather (keeps per-device row counts
        # equal; new_size % ndev == 0 enforced above)
        active = np.asarray(
            (np.asarray(pk.ptype) != 32)
            & (np.asarray(pk.prop_time) < float(t2_f32)))
        idx = np.flatnonzero(active)
        assert len(idx) == n_act, (len(idx), n_act)
        # pad with out-of-range indices: gathers clamp to a dummy row
        # that is marked escaped; scatters drop them
        idx_pad = np.full(new_size, size, dtype=np.int64)
        idx_pad[:len(idx)] = idx
        idx_pad_j = jnp.asarray(idx_pad)
        gather_idx = jnp.minimum(idx_pad_j, size - 1)
        small = jax.tree.map(lambda a: a[gather_idx], pk)
        pad_rows = jnp.arange(new_size) >= len(idx)
        small = small.replace(
            ptype=jnp.where(pad_rows, 32, small.ptype),
            e_cmf=jnp.where(pad_rows, 0.0, small.e_cmf),
            e_rf=jnp.where(pad_rows, 0.0, small.e_rf))
        small = self._place_batch(small)
        stack.append((pk, idx_pad_j))
        return small, stack

    def _record_deposition(self, nts: int, est: dict):
        e0 = self.units.e0
        w = float(self.ts.width[nts])
        self.dep_log.append({
            "ts": nts,
            "tmid_days": float(self.ts.mid[nts]) / DAY,
            "gamma_dep_Lsun": float(est["gamma_dep"]) * e0 / w / LSUN,
            "positron_dep_Lsun": float(est["positron_dep"]) * e0 / w / LSUN,
            "electron_dep_Lsun": float(est["electron_dep"]) * e0 / w / LSUN,
            "alpha_dep_Lsun": float(est["alpha_dep"]) * e0 / w / LSUN,
            "gamma_emission": float(est["gamma_emission"]) * e0,
            "electron_emission": float(est["electron_emission"]) * e0,
            "alpha_emission": float(est["alpha_emission"]) * e0,
            "cmf_lum": float(est["cmf_lum"]) * e0,
            "pellet_decays": int(est["pellet_decays"]),
            "escounter": int(est["escounter"]),
            "ma_activations": int(est["ma_activations"]),
            "ma_deact_rad": int(est["ma_deact_rad"]),
            "ma_deact_col": int(est["ma_deact_col"]),
            "ma_jumps": int(est["ma_jumps"]),
            "cellcrossings": int(est["cellcrossings"]),
            "interactions": int(est["interactions"]),
            "iterations": int(est["iterations"]),
            **({"gamma_est_over_fit": self.gamma_est_over_fit}
               if hasattr(self, "gamma_est_over_fit") else {}),
            # per-phase wall times (tracing; sn3d.cc:553-554 analogue)
            **({"t_solve_s": round(self._t_solve, 3)}
               if hasattr(self, "_t_solve") else {}),
            **({f"t_{k}_s": round(v, 3)
                for k, v in self._t_phase.items()}
               if hasattr(self, "_t_phase") else {}),
            **({f"t_tab_{k}_s": round(v, 3)
                for k, v in self._t_tables_sub.items()}
               if hasattr(self, "_t_tables_sub") else {}),
            **({"t_tables_s": round(self._t_tables_ma, 3)}
               if hasattr(self, "_t_tables_ma") else {}),
        })

    # -- checkpoint / resume ------------------------------------------
    def input_hash(self) -> str:
        """MD5 over the run inputs (config + model arrays), the
        analogue of the reference's input-file MD5 consistency check on
        job-step resume (md5.cc + update_md5_file usage in sn3d.cc):
        resuming a checkpoint with different inputs is an error."""
        import hashlib
        h = hashlib.md5()
        # hash only physics-affecting config fields: performance and
        # diagnostic knobs may change between job steps (the reference
        # hashes input FILES only, md5.cc)
        skip = {"transport_chunk_iters", "chunk_target_s",
                "compact_min_size", "max_transport_iters",
                "log_macroatom", "ma_log_cap"}
        items = sorted((k, v) for k, v in vars(self.cfg).items()
                       if k not in skip)
        h.update(repr(items).encode())
        m = self.model
        for a in (m.rho, m.ffegrp, m.initradioabund):
            h.update(np.ascontiguousarray(a).tobytes())
        if m.elem_abund is not None:
            h.update(np.ascontiguousarray(m.elem_abund).tobytes())
        return h.hexdigest()

    def save_checkpoint(self, nts: int):
        """Write packets + grid state, the resume point for timestep
        ``nts`` (gridsave/packets .tmp analogue, sn3d.cc:387-512)."""
        path = os.path.join(self.out_dir, f"checkpoint_ts{nts}.npz")
        arrays = {f"pkt_{k}": v for k, v in to_numpy(self.packets).items()}
        g = self.grid
        # NLTE + Spencer-Fano restart state (the reference chains the
        # radfield/nonthermal/nltepop restart sections into gridsave,
        # grid.cc:1871-1875 / nltepop.cc:1636 / nonthermal.cc:2715);
        # without these, an NLTE job-step resume silently changes the
        # trajectory (VERDICT.md round 2, Missing #4)
        extra = {}
        for attr, key in (("nlte_levelpops", "nlte_levelpops"),
                          ("lte_levelpops", "lte_levelpops"),
                          ("_nlte_solved_once", "nlte_solved_once"),
                          ("nne", None)):
            if attr == "nne":
                extra["grid_nne"] = g.nne
                continue
            v = getattr(self, attr, None)
            if v is not None:
                extra[key] = v
        sfs = getattr(self, "_sf_solver", None)
        if sfs is not None and sfs._last is not None:
            extra["sf_last_nneperion"] = sfs._last_nneperion
            extra["sf_ts_last_solved"] = sfs._ts_last_solved
            for f in dataclasses.fields(type(sfs._last)):
                v = getattr(sfs._last, f.name)
                if v is not None and f.name != "y":
                    extra[f"sflast_{f.name}"] = np.asarray(v)
        # the previous timestep's fitted/raw radfield and bf-rate
        # coefficients feed the first resumed thermal balance before
        # being refreshed (the reference's radfield restart section,
        # radfield.cc:1606)
        rb = getattr(self, "_radfield_binned", None)
        if rb is not None:
            extra["rfb_nu_edges"] = rb.nu_edges
            extra["rfb_W"] = rb.W
            extra["rfb_T_R"] = rb.T_R
        rr = getattr(self, "_radfield_raw", None)
        if rr is not None:
            extra["rfr_nu_edges"] = rr.nu_edges
            extra["rfr_J_bin"] = rr.J_bin
            extra["rfr_T_R"] = rr.T_R
        bg = getattr(self, "_bfrate_gamma", None)
        if bg is not None:
            extra["bfrate_gamma"] = bg
        extra["grid_nnetot"] = g.nnetot
        np.savez_compressed(
            path, nts=nts, etot=self.etot,
            input_md5=np.bytes_(self.input_hash().encode()),
            grid_Te=g.Te, grid_TR=g.TR, grid_TJ=g.TJ, grid_W=g.W,
            grid_thick=g.thick, grid_kappagrey=g.kappagrey,
            grid_rho=g.rho, grid_elem_abund=g.elem_abund,
            est_J_prev=(self.est_J_prev if self.est_J_prev is not None
                        else np.zeros(0)),
            deltat_prev=self.deltat_prev,
            # cumulative / previous-timestep state that must survive a
            # job-step restart (vspecpol accumulators, dep_log rows,
            # previous estimators incl. radfield bins)
            vspec_I=getattr(self, "vspec_I", np.zeros(0)),
            vspec_Q=getattr(self, "vspec_Q", np.zeros(0)),
            vspec_U=getattr(self, "vspec_U", np.zeros(0)),
            vgrid_I=getattr(self, "vgrid_I", np.zeros(0)),
            vgrid_Q=getattr(self, "vgrid_Q", np.zeros(0)),
            vgrid_U=getattr(self, "vgrid_U", np.zeros(0)),
            dep_log_json=np.bytes_(
                json.dumps(self.dep_log).encode()),
            **{f"estprev_{k}": v
               for k, v in (self.est_prev or {}).items()},
            **extra, **arrays)
        # keep only the latest two checkpoints (numeric timestep order)
        cps = sorted(
            (f for f in os.listdir(self.out_dir)
             if f.startswith("checkpoint_ts")),
            key=lambda f: int(f[len("checkpoint_ts"):-len(".npz")]))
        for old in cps[:-2]:
            os.remove(os.path.join(self.out_dir, old))

    def load_checkpoint(self, path: str):
        data = np.load(path)
        if "input_md5" in data.files:
            saved = bytes(data["input_md5"]).decode()
            if saved != self.input_hash():
                if os.environ.get("ARTIS_SKIP_MD5", "0") == "1":
                    print(f"WARNING: resuming {path} despite input md5 "
                          f"mismatch ({saved} != {self.input_hash()}) "
                          f"— ARTIS_SKIP_MD5=1", flush=True)
                else:
                    raise ValueError(
                        f"checkpoint {path} was written for different "
                        f"inputs (md5 {saved} != {self.input_hash()}); "
                        f"set ARTIS_SKIP_MD5=1 to override if the "
                        f"mismatch is from a code upgrade")
        nts = int(data["nts"])
        pk = {k[len("pkt_"):]: data[k] for k in data.files
              if k.startswith("pkt_")}
        # fields added after a checkpoint was written default to
        # their init values (forward-compatible resume)
        n = len(pk["pos"])
        for name, fill, dt in (("ma_activ_level", 0, np.int32),
                               ("ma_activ_line", -99, np.int32),
                               ("ma_activ_nu_cmf", 0.0, np.float32),
                               ("ma_activ_nu_rf", 0.0, np.float32),
                               ("ma_jumps_cur", 0, np.int32)):
            if name not in pk:
                pk[name] = np.full(n, fill, dt)
        self.packets = self._place_batch(from_numpy(pk))
        g = self.grid
        g.Te = data["grid_Te"]
        g.TR = data["grid_TR"]
        g.TJ = data["grid_TJ"]
        g.W = data["grid_W"]
        g.thick = data["grid_thick"]
        g.kappagrey = data["grid_kappagrey"]
        g.rho = data["grid_rho"]
        g.elem_abund = data["grid_elem_abund"]
        ej = data["est_J_prev"]
        self.est_J_prev = ej if ej.size else None
        self.deltat_prev = float(data["deltat_prev"])
        if "vspec_I" in data.files and data["vspec_I"].size:
            self.vspec_I = data["vspec_I"]
            for k in ("vspec_Q", "vspec_U", "vgrid_I", "vgrid_Q",
                      "vgrid_U"):
                if k in data.files and data[k].size:
                    setattr(self, k, data[k])
        if "dep_log_json" in data.files:
            self.dep_log = json.loads(bytes(data["dep_log_json"]).decode())
        est_prev = {k[len("estprev_"):]: data[k] for k in data.files
                    if k.startswith("estprev_")}
        if est_prev:
            self.est_prev = est_prev
        # NLTE + Spencer-Fano restart state (see save_checkpoint)
        if "grid_nne" in data.files:
            g.nne = data["grid_nne"]
        if "grid_nnetot" in data.files:
            g.nnetot = data["grid_nnetot"]
        if "rfb_nu_edges" in data.files:
            self._radfield_binned = radfield_mod.BinnedRadField(
                nu_edges=data["rfb_nu_edges"], W=data["rfb_W"],
                T_R=data["rfb_T_R"])
        if "rfr_nu_edges" in data.files:
            self._radfield_raw = radfield_mod.RawBinnedField(
                nu_edges=data["rfr_nu_edges"], J_bin=data["rfr_J_bin"],
                T_R=data["rfr_T_R"])
        if "bfrate_gamma" in data.files:
            self._bfrate_gamma = data["bfrate_gamma"]
        if "nlte_levelpops" in data.files:
            self.nlte_levelpops = data["nlte_levelpops"]
        if "lte_levelpops" in data.files:
            self.lte_levelpops = data["lte_levelpops"]
        if "nlte_solved_once" in data.files:
            self._nlte_solved_once = data["nlte_solved_once"]
        if "sf_last_nneperion" in data.files:
            # rebuild the last Spencer-Fano solution now (it feeds the
            # thermal balance of the first resumed timestep, which runs
            # before _tables creates the solver); the solver's reuse
            # state is injected lazily in _tables()
            from .plasma.nonthermal import SFSolution
            last = {k[len("sflast_"):]: data[k] for k in data.files
                    if k.startswith("sflast_")}
            e_init = float(last.pop("E_init_ev"))
            self.sf_solution = SFSolution(E_init_ev=e_init, **last)
            self._sf_restore = {
                "nneperion": data["sf_last_nneperion"],
                "ts_last_solved": data["sf_ts_last_solved"],
                "last": self.sf_solution,
            }
        self.nts_done = nts

    # -- outputs ------------------------------------------------------
    def escaped_arrays_cgs(self) -> dict[str, np.ndarray]:
        """Escaped-packet state converted back to CGS float64."""
        arr = to_numpy(self.packets)
        u = self.units
        return {
            "ptype": arr["ptype"],
            "escape_type": arr["escape_type"],
            "pos": arr["pos"].astype(np.float64) * u.x_unit,
            "dirvec": arr["dirvec"].astype(np.float64),
            "nu_rf": arr["nu_rf"].astype(np.float64),
            "nu_cmf": arr["nu_cmf"].astype(np.float64),
            "e_rf": arr["e_rf"].astype(np.float64) * u.e0,
            "e_cmf": arr["e_cmf"].astype(np.float64) * u.e0,
            "escape_time": arr["escape_time"].astype(np.float64) * u.tmin,
            "stokes_q": arr["stokes_q"].astype(np.float64),
            "stokes_u": arr["stokes_u"].astype(np.float64),
            "emissiontype": arr["emissiontype"],
            "absorptiontype": arr["absorptiontype"],
            "absorption_nu": arr["absorption_nu"].astype(np.float64),
            "em_pos": arr["em_pos"].astype(np.float64) * u.x_unit,
            "em_time": arr["em_time"].astype(np.float64) * u.tmin,
        }

    def build_spectra(self, escape_type: int = 11):
        esc = spectra_mod.select_escaped(self.escaped_arrays_cgs(),
                                         escape_type)
        cfg = self.cfg
        if escape_type == 11:  # r-packets
            nu_min, nu_max = cfg.nu_min_r, cfg.nu_max_r
            nnu = cfg.nnubins_r
        else:  # gamma
            nu_min, nu_max = cfg.nusyn_min, cfg.nusyn_max
            nnu = cfg.nnubins_gamma
        return spectra_mod.build_spectra(esc, self.ts, nu_min, nu_max,
                                         nnu, vmax=self.grid.vmax)

    def write_outputs(self):
        out = self.out_dir
        spec_r = self.build_spectra(11)
        # second block: per-ts gamma deposition + cmf luminosity rates
        # (light_curve.cc:23-29)
        dep_by_ts = {d["ts"]: d for d in self.dep_log}
        dep_block = [
            (dep_by_ts[i]["gamma_dep_Lsun"] if i in dep_by_ts else 0.0,
             (dep_by_ts[i]["cmf_lum"] / self.ts.width[i] / LSUN)
             if i in dep_by_ts else 0.0)
            for i in range(self.cfg.ftstep)]
        spectra_mod.write_light_curve(
            os.path.join(out, "light_curve.out"), spec_r,
            nts_max=self.cfg.ftstep, dep_block=dep_block)
        spectra_mod.write_spectrum(os.path.join(out, "spec.out"), spec_r)
        spec_g = self.build_spectra(10)
        spectra_mod.write_light_curve(
            os.path.join(out, "gamma_light_curve.out"), spec_g,
            nts_max=self.cfg.ftstep, dep_block=dep_block)
        spectra_mod.write_spectrum(
            os.path.join(out, "gamma_spec.out"), spec_g)
        if self.detailed and self.atomic_data is not None:
            esc = spectra_mod.select_escaped(self.escaped_arrays_cgs(),
                                             11)
            em, ab, names = spectra_mod.build_emission_absorption(
                esc, self.ts, self.cfg.nu_min_r, self.cfg.nu_max_r,
                self.cfg.nnubins_r, self.atomic_data, self.phixs)
            spectra_mod.write_emission_absorption(
                os.path.join(out, "emission.out"),
                os.path.join(out, "absorption.out"), self.ts, em, ab,
                names, self.cfg.nu_min_r, self.cfg.nu_max_r)
        with open(os.path.join(out, "deposition.json"), "w") as f:
            json.dump(self.dep_log, f, indent=1)
        # final packet dump (write_packets, packet.cc:152-196) so the
        # standalone tools/exspec.py can re-bin the run
        from .output import write_packets_file
        arr = self.escaped_arrays_cgs()
        arr["cell"] = to_numpy(self.packets)["cell"]
        arr["nscatterings"] = to_numpy(self.packets)["nscatterings"]
        write_packets_file(os.path.join(out, "packets00_0000.out"), arr)
        if getattr(self, "sf_solution", None) is not None:
            from .output import write_nonthermal_file
            write_nonthermal_file(
                os.path.join(out, "nonthermalspec.out"),
                self.sf_solution, self._sf_solver.en,
                self.nts_done - 1, self.ts)
        if getattr(self, "vspec_I", None) is not None:
            e0 = self.units.e0
            qu = {}
            if self.cfg.polarization_on and hasattr(self, "vspec_Q"):
                qu = {"vspec_Q_erg": np.asarray(self.vspec_Q,
                                                np.float64) * e0,
                      "vspec_U_erg": np.asarray(self.vspec_U,
                                                np.float64) * e0}
            spectra_mod.write_vspec(
                os.path.join(out, "vspecpol.out"), self.ts,
                np.asarray(self.vspec_I, dtype=np.float64) * e0,
                self.cfg.nu_min_r, self.cfg.nu_max_r, **qu)
        if getattr(self, "vgrid_I", None) is not None:
            from .output import write_vpkt_grid
            write_vpkt_grid(os.path.join(out, "vpkt_grid.out"),
                            np.asarray(self.vgrid_I, np.float64)
                            * self.units.e0,
                            np.asarray(self.vgrid_Q, np.float64)
                            * self.units.e0,
                            np.asarray(self.vgrid_U, np.float64)
                            * self.units.e0, self.cfg,
                            self.model.vmax)
        if getattr(self, "_radfield_binned", None) is not None:
            # radfield.out is written per timestep during the run
            # (matching the reference); only produce it here if the
            # run never wrote one (e.g. out_dir-less runs finalised
            # through write_outputs)
            rf_path = os.path.join(out, "radfield.out")
            if not os.path.exists(rf_path):
                rr = getattr(self, "_radfield_raw", None)
                radfield_mod.write_radfield_file(
                    rf_path, self._radfield_binned, self.nts_done - 1,
                    float(self.ts.mid[self.nts_done - 1]) / DAY,
                    J_bin=(rr.J_bin if rr is not None else None))
        if getattr(self, "nlte_levelpops", None) is not None:
            from .output import write_nlte_pops_file
            write_nlte_pops_file(
                os.path.join(out, "nlte_pops.out"), self.atomic_data,
                self.nlte_levelpops,
                getattr(self, "lte_levelpops", None),
                self.nts_done - 1, self.ts)
        if self.cfg.polarization_on:
            esc = spectra_mod.select_escaped(self.escaped_arrays_cgs(),
                                             11)
            I, Q, U = spectra_mod.build_specpol(
                esc, self.ts, self.cfg.nu_min_r, self.cfg.nu_max_r,
                self.cfg.nnubins_r)
            spectra_mod.write_specpol(
                os.path.join(out, "specpol.out"), self.ts, I, Q, U,
                self.cfg.nu_min_r, self.cfg.nu_max_r)
