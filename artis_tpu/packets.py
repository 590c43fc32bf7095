"""Packet megabatch: structure-of-arrays state + pellet initialisation.

The reference stores an array of 44-field structs (packet.h:28-73) and
mutates them one at a time. Here the packet population is a pytree of
[N] device arrays in simulation units (units.py) — the natural layout
for vectorised TPU transport — with float64 CGS conversion only at the
I/O boundary.

Pellet initialisation follows packet_init (packet.cc:61-150) +
place_pellet (packet.cc:18-59) + setup_radioactive_pellet
(decay.cc:1371-1458), vectorised with numpy on the host (it runs once).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import decay as decay_mod
from .config import SimConfig
from .constants import CLIGHT, GRID_SPHERICAL1D, H
from .grid import Grid
from .nucdata import DECAYTYPE_BETAMINUS, DECAYTYPE_BETAPLUS
from .units import Units

# packet type codes (same values as the reference enum, packet.h:6-17)
TYPE_ESCAPE = 32
# empty slot sentinel (domain-decomposed transport, domain.py):
# rows whose packet has migrated away / was never filled
TYPE_INVALID = -1
# emission/absorption provenance codes (packet.h:49-56; kpkt.cc:469)
EMTYPE_NOTSET = -9999000
EMTYPE_FREEFREE = -9999999
# bound-free emission is encoded as -1 - continuum_index
# (get_continuumindex, atomic.cc:16-38); absorptiontype: line index for
# bound-bound, -1 electron scatter, -2 free-free (rpkt.cc:383-388)
ABSTYPE_ESCAT = -1
ABSTYPE_FREEFREE = -2
TYPE_RADIOACTIVE_PELLET = 100
TYPE_GAMMA = 10
TYPE_RPKT = 11
TYPE_KPKT = 12
TYPE_MA = 13
TYPE_NTLEPTON = 20
TYPE_NONTHERMAL_PREDEPOSIT = 21
TYPE_PRE_KPKT = 120


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PacketBatch:
    """SoA packet state on device (sim units; see units.py)."""
    pos: jax.Array  # [N,3] position (length: c*tmin)
    dirvec: jax.Array  # [N,3] unit propagation direction
    nu_cmf: jax.Array  # [N] comoving frequency [Hz]
    nu_rf: jax.Array  # [N] rest-frame frequency [Hz]
    e_cmf: jax.Array  # [N] comoving energy [e0]
    e_rf: jax.Array  # [N] rest-frame energy [e0]
    prop_time: jax.Array  # [N] internal clock [tmin]
    tdecay: jax.Array  # [N] pellet decay time [tmin]
    ptype: jax.Array  # [N] int32 packet type
    cell: jax.Array  # [N] int32 propagation cell
    last_cross: jax.Array  # [N] int32 boundary code
    pellet_nucindex: jax.Array  # [N] int32
    pellet_decaytype: jax.Array  # [N] int32
    from_particle: jax.Array  # [N] bool: decays to particle, not gamma
    escape_type: jax.Array  # [N] int32
    escape_time: jax.Array  # [N] f32 [tmin]
    em_time: jax.Array  # [N] f32 last emission time [tmin]
    em_pos: jax.Array  # [N, 3] f32 last emission position (packet.h
    # em_pos; feeds the TRACE_EMISSION_ABSORPTION velocity ranking,
    # spectrum.cc:11-136)
    nscatterings: jax.Array  # [N] int32
    interactions: jax.Array  # [N] int32
    rng_count: jax.Array  # [N] int32 per-packet event counter
    pkt_id: jax.Array  # [N] int32 globally unique id
    nu_decay: jax.Array  # [N] f32 pre-sampled gamma-line frequency [Hz]
    # (0 if the pellet's nuclide has no known gamma lines)
    next_trans: jax.Array  # [N] int32 next candidate line index in the
    # descending-nu linelist; -1 requests a re-sync via searchsorted
    # (the reference's packet.next_trans, rpkt.cc:26-65)
    ma_level: jax.Array  # [N] int32 active macro-atom global level
    # index (the reference's mastate, packet.h:21-26)
    # macro-atom activation snapshot for the LOG_MACROATOM
    # per-deactivation log (macroatom.cc:677-683): level/line/nu at
    # activation plus the internal-jump count of this activation
    ma_activ_level: jax.Array  # [N] int32 global level at activation
    ma_activ_line: jax.Array  # [N] int32 activating line (-99: not bb)
    ma_activ_nu_cmf: jax.Array  # [N] f32
    ma_activ_nu_rf: jax.Array  # [N] f32
    ma_jumps_cur: jax.Array  # [N] int32 jumps since activation
    stokes_q: jax.Array  # [N] f32 Stokes Q/I (packet.h:59)
    stokes_u: jax.Array  # [N] f32 Stokes U/I
    emissiontype: jax.Array  # [N] int32 last emission process
    # (packet.h:49: line index, -1-cont for bf, EMTYPE_FREEFREE)
    absorptiontype: jax.Array  # [N] int32 last absorption process
    absorption_nu: jax.Array  # [N] f32 nu_rf at last absorption
    # (packet.h:55 absorptionfreq)

    @property
    def n(self) -> int:
        return self.pos.shape[0]

    def replace(self, **kw) -> "PacketBatch":
        return dataclasses.replace(self, **kw)


def init_pellets(cfg: SimConfig, g: Grid, dm: decay_mod.DecayModel,
                 units: Units, n_local: Optional[int] = None,
                 id_offset: int = 0,
                 seed_offset: int = 0) -> tuple[PacketBatch, float]:
    """Place radioactive pellets and return (batch, etot_erg).

    ``n_local`` allows a rank/shard to initialise only its own packets
    (with deterministic ids from ``id_offset``), matching the
    reference's per-rank private packet populations.
    """
    npkts = n_local if n_local is not None else cfg.npkts
    rng = np.random.default_rng(cfg.seed + 1000003 * seed_offset)

    # per-model-cell decay energy per mass over the simulated interval,
    # per decay path [nmodel, npaths]
    q_paths = dm.simtime_endecay_per_mass(
        cfg.tmin, cfg.tmax, from_tmodel=cfg.initial_packets)
    q_cell = q_paths.sum(axis=1)  # [nmodel]

    # USE_MODEL_INITIAL_ENERGY: the model's q column contributes
    # initial thermal energy released at tmin (setup_radioactive_pellet
    # zrand >= cumulative branch, decay.cc; grid.cc:1206-1208 scaling
    # already applied by the model reader)
    q_init = None
    if (cfg.use_model_initial_energy
            and getattr(g, "init_energyq", None) is not None):
        q_init = np.asarray(g.init_energyq, np.float64)
        q_cell = q_cell + q_init

    # energy per propagation cell (packet_init, packet.cc:86-104)
    mgi = g.cell_mgi
    cell_energy = (g.vol_gridcell * g.rho_init[mgi] * q_cell[mgi]
                   * g.cell_keep)
    etot = float(cell_energy.sum())
    assert etot > 0, "no radioactive energy in the simulated time range"
    e0 = etot / cfg.npkts

    # sample cells proportional to energy
    cum = np.cumsum(cell_energy)
    targets = rng.random(npkts) * etot
    cells = np.searchsorted(cum, targets, side="right").astype(np.int32)
    cells = np.minimum(cells, g.ngrid - 1)

    # uniform positions within each cell (place_pellet, packet.cc:29-44)
    if g.grid_type == GRID_SPHERICAL1D:
        r_in = g.pos_min[cells, 0]
        r_out = r_in + g.wid[cells]
        z3 = rng.random(npkts)
        radius = (z3 * r_in**3 + (1.0 - z3) * r_out**3) ** (1.0 / 3.0)
        mu = -1.0 + 2.0 * rng.random(npkts)
        phi = 2.0 * np.pi * rng.random(npkts)
        sq = np.sqrt(1.0 - mu**2)
        pos = np.stack([radius * sq * np.cos(phi),
                        radius * sq * np.sin(phi), radius * mu], axis=1)
    else:
        u = rng.random((npkts, 3))
        pos = g.pos_min[cells] + u * g.wid[cells][:, None]

    # decay path selection proportional to per-cell path energies
    # (setup_radioactive_pellet, decay.cc:1371-1413)
    mgis = mgi[cells]
    path_cum = np.cumsum(q_paths, axis=1)  # [nmodel, npaths]
    path_tot = path_cum[:, -1]
    zr = rng.random(npkts) * path_tot[mgis]
    path_index = np.zeros(npkts, dtype=np.int64)
    for pi in range(q_paths.shape[1]):
        path_index = np.where(zr >= path_cum[mgis, pi], pi + 1, path_index)
    path_index = np.minimum(path_index, q_paths.shape[1] - 1)

    tdecaymin = dm.t_model if cfg.initial_packets else cfg.tmin
    tdecay = dm.sample_decay_times(path_index, cfg.tmax, rng,
                                   tdecaymin=tdecaymin)

    # initial-energy pellets: probability q_init/(q_decay+q_init) per
    # cell; they "decay" at tmin into the thermal pool
    is_initial = np.zeros(npkts, bool)
    if q_init is not None:
        q_dec_tot = q_paths.sum(axis=1)[mgis]
        p_init = q_init[mgis] / np.maximum(q_dec_tot + q_init[mgis],
                                           1e-300)
        is_initial = rng.random(npkts) < p_init
        tdecay = np.where(is_initial, cfg.tmin, tdecay)

    # terminal nuclide & decay type per pellet
    final_nucindex = np.array(
        [dm.nt.index(p.final_z, p.final_a) for p in dm.paths],
        dtype=np.int32)
    final_dectype = np.array([p.final_decaytype for p in dm.paths],
                             dtype=np.int32)
    nucindex = final_nucindex[path_index]
    dectype = final_dectype[path_index]

    # gamma vs particle split (decay.cc:1454-1457)
    e_gamma = np.array([n.endecay_gamma for n in dm.nt.nuclides])
    e_part = np.array([[n.particle_energy(d) for d in range(5)]
                       for n in dm.nt.nuclides])
    eg = e_gamma[nucindex]
    ep = e_part[nucindex, dectype]
    frac_gamma = np.where(eg + ep > 0, eg / np.maximum(eg + ep, 1e-300), 0.0)
    from_particle = rng.random(npkts) >= frac_gamma
    nu_cmf = ep / H  # particle KE encoded as frequency (decay.cc:1457)

    # Pre-sample the gamma line emitted at decay (energy-weighted line
    # choice, choose_gamma_ray gammapkt.cc:227-254). The choice depends
    # only on the nuclide, so doing it here keeps the per-line table
    # walk out of the hot transport kernel entirely.
    spec = dm.nt.packed_gamma_spectra()
    nu_decay = np.zeros(npkts)
    u_line = rng.random(npkts)
    for nuc in np.unique(nucindex):
        s, e = int(spec["nuc_start"][nuc]), int(spec["nuc_start"][nuc + 1])
        if e > s:
            sel = nucindex == nuc
            j = s + np.searchsorted(spec["line_cumprob"][s:e],
                                    u_line[sel], side="right")
            j = np.minimum(j, e - 1)
            nu_decay[sel] = spec["line_energy"][j] / H

    e_cmf = np.full(npkts, e0)
    # energy renormalisation so that the expected total is etot
    # (packet.cc:136-148); with uniform energies this is exact when
    # n_local == npkts, and per-shard expectation otherwise.
    e_cmf *= etot / (e0 * cfg.npkts)

    # pellet moves with the flow; dir used only for the e_rf Doppler
    dirvec = pos / np.maximum(
        np.linalg.norm(pos, axis=1, keepdims=True), 1e-300)
    vel = pos / (cfg.tmin * CLIGHT)  # v/c at tmin
    dopp = 1.0 - np.sum(dirvec * vel, axis=1)
    e_rf = e_cmf / dopp

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    i32 = lambda x: jnp.asarray(x, dtype=jnp.int32)
    batch = PacketBatch(
        pos=f32(pos / units.x_unit),
        dirvec=f32(dirvec),
        nu_cmf=f32(nu_cmf),
        nu_rf=f32(nu_cmf),
        e_cmf=f32(e_cmf / units.e0),
        e_rf=f32(e_rf / units.e0),
        prop_time=f32(np.full(npkts, 1.0)),  # tmin in sim units
        tdecay=f32(tdecay / units.tmin),
        ptype=i32(np.where(is_initial, TYPE_PRE_KPKT,
                           TYPE_RADIOACTIVE_PELLET)),
        cell=i32(cells),
        last_cross=i32(np.zeros(npkts)),
        pellet_nucindex=i32(nucindex),
        pellet_decaytype=i32(dectype),
        from_particle=jnp.asarray(from_particle & ~is_initial),
        escape_type=i32(np.zeros(npkts)),
        escape_time=f32(np.full(npkts, -1.0)),
        em_time=f32(np.full(npkts, 1.0)),
        em_pos=f32(pos),
        nscatterings=i32(np.zeros(npkts)),
        interactions=i32(np.zeros(npkts)),
        rng_count=i32(np.zeros(npkts)),
        pkt_id=i32(id_offset + np.arange(npkts)),
        nu_decay=f32(nu_decay),
        next_trans=i32(np.full(npkts, -1)),
        ma_level=i32(np.zeros(npkts)),
        ma_activ_level=i32(np.zeros(npkts)),
        ma_activ_line=i32(np.full(npkts, -99)),
        ma_activ_nu_cmf=f32(np.zeros(npkts)),
        ma_activ_nu_rf=f32(np.zeros(npkts)),
        ma_jumps_cur=i32(np.zeros(npkts)),
        stokes_q=f32(np.zeros(npkts)),
        stokes_u=f32(np.zeros(npkts)),
        emissiontype=i32(np.full(npkts, EMTYPE_NOTSET)),
        absorptiontype=i32(np.full(npkts, EMTYPE_NOTSET)),
        absorption_nu=f32(np.zeros(npkts)),
    )
    return batch, etot


def to_numpy(batch: PacketBatch) -> dict[str, np.ndarray]:
    return {f.name: np.asarray(getattr(batch, f.name))
            for f in dataclasses.fields(batch)}


def from_numpy(arrays: dict[str, np.ndarray]) -> PacketBatch:
    return PacketBatch(**{k: jnp.asarray(v) for k, v in arrays.items()})
