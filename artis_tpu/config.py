"""Typed simulation configuration.

Collapses the reference's two-tier config (compile-time
``artisoptions_*.h`` constants + positional ``input.txt``,
reference: input.cc:1874-2143 and artisoptions_classic.h) into one
dataclass. A reader for reference-format ``input.txt`` files is
provided for drop-in compatibility.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from .constants import DAY, GRID_SPHERICAL1D, MEV, H

TIMESTEP_LOGARITHMIC = 0
TIMESTEP_CONSTANT = 1
TIMESTEP_LOG_THEN_CONSTANT = 2


@dataclasses.dataclass
class SimConfig:
    # --- packets / RNG
    npkts: int = 100_000
    seed: int = 42

    # --- time grid (input.txt lines 2-4; time_init input.cc:2226-2381)
    ntimesteps: int = 50
    itstep: int = 0  # first timestep of this job
    ftstep: int = 50  # one past the last timestep of this job
    tmin_days: float = 3.0
    tmax_days: float = 30.0
    timestep_method: int = TIMESTEP_LOGARITHMIC
    max_timestep_days: float = 2.0  # cap for the hybrid method

    # --- frequency ranges (artisoptions: nu_min_r/nu_max_r;
    #     globals.cc defaults: 1e14 .. 5e15 Hz for optical packets)
    nu_min_r: float = 1e14
    nu_max_r: float = 5e15
    # gamma synthesis range (input.txt line 5, in MeV)
    nusyn_min_mev: float = 0.1
    nusyn_max_mev: float = 4.0

    # --- model / grid
    model_type: int = 1  # 1, 2 or 3 dimensions (input.txt line 8)
    # estimator / r-light-curve mode (input.txt line 9, stored as the
    # reference's do_rlc_est = value-1; input.cc:1978): mode 3
    # ("gamma-ray heating", input value 4 — every bundled fixture)
    # adds deposition heating to the thermal balance
    # (thermalbalance.cc:373-377)
    do_rlc_est: int = 3
    ncoordgrid: int = 50  # propagation grid points per axis for 3D

    # --- opacity / physics switches
    opacity_case: int = 0  # 0-3 grey, 4 full, 5 Ye-dependent (input.txt)
    grey_op: float = 0.1  # GREY_OP [cm^2/g] (artisoptions)
    gamma_grey: float = -1.0  # >=0: grey gamma opacity [cm^2/g] (input.txt)
    rho_crit_para: float = 1.0e-10  # opacity_case 3 parameter (input.txt)
    syn_dir: tuple[float, float, float] = (0.0, 0.0, 1.0)

    num_lte_timesteps: int = 999  # LTE-forced initial timesteps
    cell_is_optically_thick: float = 8.0  # grey-depth threshold
    num_grey_timesteps: int = 999
    use_relativistic_doppler: bool = False
    # propagate a 1D (or 2D) model on the uniform 3D Cartesian grid
    # instead of the native spherical grid — the reference's default
    # kilonova mode (GRID_TYPE=GRID_UNIFORM with a 1D model,
    # map_1dmodeltogrid grid.cc:910); grid_ncoord matches the
    # reference's default ncoordgrid=50 (uniform_grid_setup,
    # grid.cc:2055-2068)
    grid_force_uniform: bool = False
    grid_ncoord: int = 50

    # kpkt diffusion smoothing (input.txt line 25)
    kpktdiffusion_timescale: float = 0.0
    n_kpktdiffusion_timesteps: int = 0

    # non-thermal deposition handling
    instant_particle_deposition: bool = True
    # Spencer-Fano non-thermal electron solver (NT_ON; requires
    # opacity_case 4). When off, all deposition thermalises.
    nonthermal_on: bool = False
    # NT excitation transport channel (NT_EXCITATION_ON): NT lepton
    # energy can activate a macro-atom at the upper level of a sampled
    # excitation line. The reference's do_ntlepton currently hardcodes
    # frac_excitation = 0 (nonthermal.cc:1898), so this defaults off;
    # when off, the excitation fraction thermalises (matches upstream).
    nt_excitation_on: bool = False
    # Auger multi-electron physics in the Spencer-Fano solve and the
    # NT upper-ion selection (SF_AUGER_CONTRIBUTION_ON +
    # NT_MAX_AUGER_ELECTRONS); the reference's nebular CI test runs
    # with it off
    sf_auger_on: bool = True
    # NLTE level populations (statistical-equilibrium rate matrix per
    # element, nltepop.cc analogue). Applies after num_lte_timesteps;
    # requires opacity_case 4.
    nlte_pops_on: bool = False
    # multibin radiation-field model (radfield.cc MULTIBIN mode):
    # per-(cell, log-nu-bin) J/nuJ estimators fitted with (W, T_R)
    # each; rates then integrate over the fitted field instead of the
    # fullspec dilute blackbody. Applies after num_lte_timesteps.
    multibin_radfield_on: bool = False
    radfield_nbins: int = 64  # RADFIELDBINCOUNT analogue
    # detailed bf-rate estimators (DETAILED_BF_ESTIMATORS_ON,
    # radfield.cc:764-828): photoionisation/bf-heating integrals and
    # line radiative rates evaluate the RAW transport-accumulated
    # binned J estimator (piecewise-constant J_nu) instead of the
    # fitted per-bin dilute-Planck shape. Active when
    # multibin_radfield_on.
    detailed_bf_estimators: bool = True
    # per-line Jb_lu flux estimators for selected lines, replacing the
    # binned-field J_nu in the radiative excitation rates
    # (DETAILED_LINE_ESTIMATORS_ON; update_lineestimator
    # radfield.cc:878, consumption macroatom.cc:1006-1015); active in
    # the detailed NLTE mode
    detailed_line_estimators: bool = True
    # activation timesteps for the NLTE radfield machinery
    # (FIRST_NLTE_RADFIELD_TIMESTEP = 12,
    # DETAILED_BF_ESTIMATORS_USEFROMTIMESTEP = 13,
    # artisoptions_nltenebular.h:99,119): before these, the rate
    # integrals use the fullspec dilute-blackbody fit / field
    # integrals, as the reference does
    first_nlte_radfield_ts: int = 12
    detailed_bfest_from_ts: int = 13
    # per-line emission/absorption counters -> linestat.out
    # (sn3d.cc:62-84); detailed mode only
    linestat_on: bool = True
    # syn-mode Compton/pair emissivity estimators toward syn_dir
    # (emissivities.cc:14-140; the legacy gamma-ray synthesis mode,
    # input.txt estimator-mode line); binned over log nu in
    # [nusyn_min, nusyn_max]
    syn_emissivity_on: bool = False
    syn_emiss_bins: int = 64
    # per-(cell, ion) energy-flow statistics (TRACK_ION_STATS,
    # stats.h:12-45); off by default, matching the reference variants
    track_ion_stats: bool = False
    # polarised electron scattering (Stokes Q/U tracking; Bulla+2015)
    polarization_on: bool = False
    # virtual packets toward fixed observer directions (vpkt.cc):
    # every re-emission / electron scatter peels one contribution per
    # observer, attenuated by a ray-march through the binned opacities
    vpkt_on: bool = False
    vpkt_obs: tuple = ((0.0, 0.0, 1.0),)  # observer unit vectors
    vpkt_tau_max: float = 10.0  # early-exit optical-depth cut
    # vpkt are not created from cells whose grey depth exceeds this
    # (cell_is_optically_thick_vpkt, vpkt.cc:784-796); <0 = inherit
    # cell_is_optically_thick from input.txt
    vpkt_thickcell_tau: float = -1.0
    vpkt_nnubins: int = 200
    # velocity-plane image grid (vpkt_grid, vpkt.cc:441-560)
    vpkt_vgrid_on: bool = False
    vpkt_vgrid_tmin_d: float = 0.0
    vpkt_vgrid_tmax_d: float = 1e30
    vpkt_vgrid_lambda_aa: tuple = ()  # (lambda_min, lambda_max) pairs [A]
    vpkt_vgrid_nv: int = 50  # NY_VGRID/NZ_VGRID image resolution
    sf_points: int = 384  # Spencer-Fano energy grid size (SFPTS)
    sf_emin_ev: float = 1.0
    sf_emax_ev: float = 3000.0
    # solution-reuse policy (nonthermal.cc:2559-2581): keep a cell's
    # SF solution while nne/niontot drifted < fracdiff and the last
    # solve is at most N timesteps old
    # (SF_MAX_TIMESTEPS_BETWEEN_SOLUTIONS,
    # NT_MAX_FRACDIFF_NNEPERION_BETWEEN_SOLUTIONS)
    sf_max_ts_between_solutions: int = 0
    sf_max_fracdiff_nneperion: float = 0.05

    # pellets
    uniform_pellet_energies: bool = True
    initial_packets: bool = True  # include decays between t_model and tmin
    use_model_initial_energy: bool = False

    # temperature clamps (artisoptions MINTEMP/MAXTEMP)
    mintemp: float = 1000.0
    maxtemp: float = 1.4e5

    # --- numerics
    real_dtype: str = "float32"  # device real dtype for transport
    max_transport_iters: int = 2_000_000  # safety cap on event loop
    # hard cap on events per device invocation; single executions stay
    # short (execution-deadline/preemption friendly). The actual count
    # per chunk is chosen adaptively below this cap (chunk_target_s).
    transport_chunk_iters: int = 4096
    # target wall seconds per device invocation: the driver picks the
    # iteration count per chunk from a measured per-batch-size cost
    # model so compaction cadence stays ~constant in wall time at
    # every batch size (and single executions stay tunnel-friendly)
    chunk_target_s: float = 2.5
    # smallest batch the ragged-tail compaction will shrink to (keep
    # >= the VPU lane tile on TPU; tests use smaller values)
    compact_min_size: int = 512
    # host threads for the per-cell plasma solves (NLTE / Spencer-Fano
    # / thermal balance): the single-host analogue of the reference's
    # one-MPI-rank-per-cell-range update_grid split (sn3d.cc:951-964).
    # 0 = auto (CPU count, capped); 1 = serial full-batch
    plasma_workers: int = 0
    # domain-decomposition halo width (model cells replicated on each
    # side of a device's owned range): boundary packets random-walk
    # across the seam locally instead of paying one migration round
    # per crossing (domain.plan_decomposition)
    dd_halo: int = 2

    # --- output binning (exspec analogue)
    nnubins_gamma: int = 200
    nnubins_r: int = 1000

    # per-radiative-deactivation macro-atom log (LOG_MACROATOM,
    # macroatom.cc:677-683 / 905-918): writes macroatom.out rows,
    # bounded to ma_log_cap rows per timestep (device ring buffer)
    log_macroatom: bool = False
    ma_log_cap: int = 65536

    # --- data
    data_path: Optional[str] = None  # reference-format data/ dir (optional)

    @property
    def tmin(self) -> float:
        return self.tmin_days * DAY

    @property
    def tmax(self) -> float:
        return self.tmax_days * DAY

    @property
    def nusyn_min(self) -> float:
        return self.nusyn_min_mev * MEV / H

    @property
    def nusyn_max(self) -> float:
        return self.nusyn_max_mev * MEV / H


def read_input_txt(path: str, cfg: Optional[SimConfig] = None) -> SimConfig:
    """Parse a reference-format positional input.txt into a SimConfig
    (read_parameterfile, input.cc:1874-2143). Unused/legacy lines are
    skipped just as the reference does."""
    cfg = cfg or SimConfig()
    with open(path) as f:
        lines = [ln.split("#")[0].strip() for ln in f.readlines()]
    vals = [ln for ln in lines if ln]

    def floats(i):
        return [float(x) for x in vals[i].split()]

    cfg.seed = int(float(vals[0]))
    cfg.ntimesteps = int(vals[1])
    it, ft = (int(x) for x in vals[2].split())
    # the driver loop runs while nts < ftstep (sn3d.cc:1037), so ftstep
    # is exclusive
    cfg.itstep, cfg.ftstep = it, ft
    cfg.tmin_days, cfg.tmax_days = floats(3)
    cfg.nusyn_min_mev, cfg.nusyn_max_mev = floats(4)
    # vals[5] nsyn_time, vals[6] synthesis start/end times: unused here
    cfg.model_type = int(vals[7])
    cfg.do_rlc_est = int(vals[8]) - 1  # input.cc:1978
    # vals[9] n_out_it, vals[10] CLIGHT factor
    cfg.gamma_grey = float(vals[11])
    sd = floats(12)
    cfg.syn_dir = (sd[0], sd[1], sd[2])
    cfg.opacity_case = int(vals[13])
    cfg.rho_crit_para = float(vals[14])
    # vals[15] debug packet, vals[16] resume flag, vals[17] rfcut
    cfg.num_lte_timesteps = int(vals[18])
    thick = floats(19)
    cfg.cell_is_optically_thick = thick[0]
    cfg.num_grey_timesteps = int(thick[1])
    # vals[20] max_bf_continua, vals[21] nprocs_exspec, vals[22] do_emission_res
    kd = floats(23)
    cfg.kpktdiffusion_timescale = kd[0]
    cfg.n_kpktdiffusion_timesteps = int(kd[1])
    return cfg


def read_vpkt_txt(path: str, cfg: Optional[SimConfig] = None) -> SimConfig:
    """Parse a reference-format vpkt.txt observer file
    (read_parameterfile_vpkt, vpkt.cc:667-770): number of observers,
    their cos(theta) list, their phi list [degrees], then the
    opacity-exclusion / time-window / frequency-range sections (the
    latter configure the reference's compile-time binned outputs and
    map onto vpkt_tau_max / vpkt_nnubins here).

    Observers are placed in the syn_dir = z frame: direction =
    (sin th cos phi, sin th sin phi, cos th)."""
    import numpy as np

    cfg = cfg or SimConfig()
    with open(path) as f:
        toks = f.read().split()
    pos = 0

    def take(n):
        nonlocal pos
        out = toks[pos:pos + n]
        pos += n
        return out

    nobs = int(take(1)[0])
    cth = np.clip([float(x) for x in take(nobs)], -0.9999, 0.9999)
    phi = np.deg2rad([float(x) for x in take(nobs)])
    sth = np.sqrt(1.0 - cth**2)
    cfg.vpkt_on = True
    cfg.vpkt_obs = tuple(
        (float(sth[i] * np.cos(phi[i])), float(sth[i] * np.sin(phi[i])),
         float(cth[i])) for i in range(nobs))
    # opacity-exclusion spectra list (only the all-opacities spectrum
    # is produced here)
    if int(take(1)[0]) == 1:
        nspectra = int(take(1)[0])
        take(nspectra)
    # time window override
    override, _tmin_d, _tmax_d = take(3)
    # custom frequency ranges: skipped (full [nu_min_r, nu_max_r] grid)
    if pos < len(toks) and int(take(1)[0]) == 1:
        nrange = int(take(1)[0])
        take(2 * nrange)
    # thick-cell override line: "overrride_thickcell_tau tau" — two
    # tokens that come BEFORE tau_max_vpkt (vpkt.cc:784-796)
    if pos + 1 < len(toks):
        override_thick, thick_tau = take(2)
        if int(override_thick) == 1:
            cfg.vpkt_thickcell_tau = float(thick_tau)
    # maximum optical depth: vpkt discarded past this (vpkt.cc:797)
    if pos < len(toks):
        cfg.vpkt_tau_max = float(take(1)[0])
    # velocity-grid-map flag + optional time range / wavelength ranges
    # (vpkt.cc:801-834); parsed for completeness, image grid configured
    # via vpkt_vgrid_on
    if pos < len(toks) and int(take(1)[0]) == 1:
        cfg.vpkt_vgrid_on = True
        if pos + 1 < len(toks):
            tmin_d, tmax_d = take(2)
            cfg.vpkt_vgrid_tmin_d = float(tmin_d)
            cfg.vpkt_vgrid_tmax_d = float(tmax_d)
        if pos < len(toks):
            nrg = int(take(1)[0])
            rng_l = [float(x) for x in take(2 * nrg)]
            cfg.vpkt_vgrid_lambda_aa = tuple(
                (rng_l[2 * i], rng_l[2 * i + 1]) for i in range(nrg))
    return cfg
