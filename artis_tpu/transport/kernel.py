"""Event-stepped vectorised Monte Carlo transport kernel.

This is the TPU-native replacement for the reference's hot loop
(update_packets.cc:234-333 + do_gamma gammapkt.cc:533-700 +
do_rpkt rpkt.cc:623-819 + update_pellet update_packets.cc:71-135 +
do_kpkt_bb kpkt.cc:428-475). Instead of advancing one packet at a time
through nested while loops, every iteration of a single
``lax.while_loop`` advances *all* active packets by one event:

  phase A (zero time):  pellet decays, non-thermal deposition,
                        k-packet -> r-packet conversion
  phase B (transport):  gamma / r-packet moves: min(boundary distance,
                        interaction distance, end-of-timestep distance)

Heterogeneous packet types are handled with masks on the same vector
lanes (VPU-friendly), estimators accumulate via scatter-adds into
per-cell arrays, and all randomness is counter-based per packet so
results are independent of batch order and sharding.

Everything here operates in simulation units (units.py): c == 1,
lengths in c*tmin, times in tmin, energies in e0.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry as geo
from ..constants import CLIGHT, H, KB, ME, MH, MEV, PI, SIGMA_T
from ..nucdata import (DECAYTYPE_ALPHA, DECAYTYPE_BETAMINUS,
                       DECAYTYPE_BETAPLUS)
from ..packets import (PacketBatch, TYPE_ESCAPE, TYPE_GAMMA, TYPE_KPKT,
                       TYPE_MA, TYPE_NONTHERMAL_PREDEPOSIT,
                       TYPE_NTLEPTON, TYPE_PRE_KPKT,
                       TYPE_RADIOACTIVE_PELLET, TYPE_RPKT,
                       EMTYPE_FREEFREE, ABSTYPE_ESCAT,
                       ABSTYPE_FREEFREE)
from ..rng import packet_uniforms, uniform_pos

MEC2 = ME * CLIGHT * CLIGHT
BIG = jnp.float32(1e30)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TransportParams:
    """Per-run constants needed inside the kernel (device scalars +
    small tables). Built once by the driver."""
    x_unit: jax.Array  # [cm] length unit (c * tmin)
    nu_min_r: jax.Array  # [Hz] optical packet range
    nu_max_r: jax.Array
    gamma_grey: jax.Array  # <0: physical gamma opacities; >=0 grey cm^2/g
    max_path_step: jax.Array  # sim units
    # bound-bound line list (descending nu; empty arrays in grey mode)
    line_nu: jax.Array  # [nlines] f32 [Hz]
    line_taufac_lu: jax.Array  # [nlines] Sobolev tau = (taufac_lu*n_l -
    line_taufac_ul: jax.Array  # taufac_ul*n_u) * t_sim  (precomputed
    #                            B_lu/B_ul * h c/(4 pi) * tmin factors)
    line_lower: jax.Array  # [nlines] int32 global level index
    line_upper: jax.Array  # [nlines] int32
    # macro-atom static line orderings (see plasma/macroatom.py)
    ma_byup_perm: jax.Array  # [nlines] int32
    ma_up_start: jax.Array  # [nlevels+1] int32
    ma_bylo_perm: jax.Array  # [nlines] int32
    ma_lo_start: jax.Array  # [nlevels+1] int32
    # non-thermal ionisation targets: upper-ion ground level per ion
    # (-1 when there is no upper ion); used by the Spencer-Fano
    # deposition channels
    nt_target_level: jax.Array  # [nions] int32
    # bound-free continua (phixs.py); dummies when no phixs data
    ma_bytarget_perm: jax.Array  # [ncont] int32
    ma_target_start: jax.Array  # [nlevels+1] int32
    level_cont: jax.Array  # [nlevels] int32 (-1 = not ionising)
    cont_nu_edge: jax.Array  # [ncont] f32 [Hz]
    cont_level: jax.Array  # [ncont] int32 lower level
    cont_upperlevel: jax.Array  # [ncont] int32 target level
    cont_sigma: jax.Array  # [ncont, NP] f32 [cm^2]
    cont_nuinc: jax.Array  # f32 grid spacing of x = nu/nu_edge
    # bf opacity binning parameters
    bf_lognu_min: jax.Array  # f32
    bf_dlognu: jax.Array  # f32
    bf_dlognu_sel: jax.Array  # f32
    # Planck inverse-CDF table
    planck_x: jax.Array  # [P] log-spaced x = h nu / k T
    planck_cdf: jax.Array  # [P]
    kpkt_diffusion_dt: jax.Array  # sim-time diffusion delay this step
    # binned radfield estimator grid (radfield.cc MULTIBIN); bins are
    # log-spaced over [nu_min_r, nu_max_r]
    rf_lognu_min: jax.Array  # f32
    rf_dlognu: jax.Array  # f32
    # virtual-packet observer setup (vpkt.cc): observer directions,
    # arrival-time bin edges (sim units) and the log-nu grid of the
    # observer spectra; tau cut for the ray-march early exit
    vpkt_obs: jax.Array  # [nobs, 3] f32
    vpkt_t_edges: jax.Array  # [VT+1] f32
    vpkt_lognu_min: jax.Array  # f32
    vpkt_dlognu: jax.Array  # f32
    vpkt_tau_max: jax.Array  # f32
    # syn-mode emissivity binning (emissivities.cc analogue)
    syn_dir: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, 0.0, 1.0],
                                          jnp.float32))
    syn_lognu_min: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0))
    syn_dlognu: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(1.0))
    # vpkt velocity-grid image windows (vpkt.cc:441-560): frequency
    # ranges [nr, 2], arrival-time window (sim units), vmax (v/c)
    vgrid_nu_ranges: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 2), jnp.float32))
    vgrid_t_range: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, 1e30], jnp.float32))
    vgrid_vmax: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.1))
    # INSTANT_PARTICLE_DEPOSITION=false support: non-thermal particles
    # lose energy at endot = {5e11 (alpha), 4e10 (beta)} MeV/s * rho
    # and deposit at a sampled point along the track
    # (do_nonthermal_predeposit, update_packets.cc:16-69)
    instant_deposit: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.bool_(True))
    tmin_seconds: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(1.0))
    # static row-packs for the macro-atom machine (one row-gather
    # replaces 5-8 scalar gathers; see _event_step phase A2b):
    # per-level spans+ionisation target, per-CSR-position line
    # constants (both orderings), per-CSR-position continuum constants
    ma_span_pack: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 8), jnp.float32))
    ma_ltgt_pack: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 8), jnp.float32))
    ma_ctgt_pack: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 4), jnp.float32))
    # natural-order line/continuum constant rows: (nu, lower, upper, 0)
    # and (nu_edge, cont_level, cont_upperlevel, 0) — one row-gather
    # where the kernel previously paid 1-3 scalar gathers
    ln_pack: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 4), jnp.float32))
    cn_pack: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.zeros((1, 4), jnp.float32))


def make_planck_table(npts: int = 256) -> tuple[np.ndarray, np.ndarray]:
    """CDF of the Planck distribution x^3/(e^x - 1) on a log x grid.

    Used to sample thermal emission frequencies by inverse transform —
    replaces the reference's rejection loop (sample_planck,
    kpkt.cc:428-446) which cannot be vectorised efficiently.
    """
    x = np.geomspace(1e-5, 60.0, npts)
    pdf = x**3 / np.expm1(x)
    cdf = np.concatenate([[0.0], np.cumsum(
        0.5 * (pdf[1:] + pdf[:-1]) * np.diff(x))])
    cdf /= cdf[-1]
    return x.astype(np.float32), cdf.astype(np.float32)


def zero_estimators(nmodel: int, radfield_nbins: int = 0,
                    vpkt_shape=None,
                    nlines_stat: int = 0,
                    ion_stats_nions: int = 0,
                    syn_emiss_bins: int = 0,
                    vgrid_shape=None,
                    n_bfcont: int = 0,
                    jb_nsel: int = 0,
                    ma_log_cap: int = 0,
                    bf_fine_bins: int = 0) -> dict[str, jax.Array]:
    z = lambda: jnp.float32(0.0)
    out = {}
    if ma_log_cap > 0:
        # LOG_MACROATOM per-radiative-deactivation rows
        # (macroatom.cc:677-683): int cols [mgi, level_in, level_out,
        # activatingline, jumps]; float cols [nu_cmf_in, nu_cmf_out,
        # nu_rf_in, nu_rf_out]. A bounded device ring the driver
        # drains into macroatom.out each timestep; rows past the cap
        # are dropped.
        out["ma_log_i"] = jnp.zeros((ma_log_cap, 5), jnp.int32)
        out["ma_log_f"] = jnp.zeros((ma_log_cap, 4), jnp.float32)
        out["ma_log_n"] = jnp.int32(0)
    if jb_nsel > 0:
        # per-line Jb_lu estimators for the selected detailed lines
        # (update_lineestimator, radfield.cc:878-890) stored as
        # interval DIFFERENCE arrays: each event's crossed-line index
        # range [lo, hi) adds +w at lo and -w at hi; the driver
        # prefix-sums over the selected-line axis and scales by the
        # per-line 1/nu. Two scatter-adds per event replace the
        # reference's per-crossed-line increment.
        out["jb_diff"] = jnp.zeros((nmodel + 1, jb_nsel + 1),
                                   jnp.float32)
        out["jb_cnt"] = jnp.zeros((nmodel + 1, jb_nsel + 1),
                                  jnp.int32)
    if vgrid_shape is not None:
        # velocity-plane image grids [nobs, nranges, NV, NV] Stokes
        # I/Q/U (vpkt_grid, vpkt.cc:441-560 / add_to_vpkt_grid)
        out["vgrid_I"] = jnp.zeros(vgrid_shape, jnp.float32)
        out["vgrid_Q"] = jnp.zeros(vgrid_shape, jnp.float32)
        out["vgrid_U"] = jnp.zeros(vgrid_shape, jnp.float32)
    if syn_emiss_bins > 0:
        # syn-mode Compton + pair-production emissivity estimators
        # toward syn_dir (compton_emiss_cont / pp_emiss_cont,
        # emissivities.cc:14-140); binned over log nu_syn instead of
        # the reference's gamma-line index grid
        out["compton_emiss"] = jnp.zeros((nmodel + 1, syn_emiss_bins),
                                         jnp.float32)
        out["pp_emiss"] = jnp.zeros(nmodel + 1, jnp.float32)
    if ion_stats_nions > 0:
        # per-(cell, ion) energy-flow statistics (TRACK_ION_STATS,
        # stats.h:12-45; 32 columns in the reference enum layout,
        # the subset filled is documented in output.append_ion_stats)
        out["ion_stats"] = jnp.zeros((nmodel + 1, ion_stats_nions, 32),
                                     jnp.float32)
    if nlines_stat > 0:
        # per-line emission/absorption counters (linestat.out,
        # sn3d.cc:62-84; ecounter/acounter accumulation)
        out["line_em"] = jnp.zeros(nlines_stat, jnp.float32)
        out["line_ab"] = jnp.zeros(nlines_stat, jnp.float32)
    if vpkt_shape is not None:
        # observer Stokes I/Q/U spectra [nobs, ntimebins, nnubins]
        # (vspecpol accumulators, vpkt.cc:483-560)
        out["vpkt_I"] = jnp.zeros(vpkt_shape, jnp.float32)
        out["vpkt_Q"] = jnp.zeros(vpkt_shape, jnp.float32)
        out["vpkt_U"] = jnp.zeros(vpkt_shape, jnp.float32)
    if radfield_nbins > 0:
        # binned radfield J/nuJ estimators (radfield.cc:831-876); the
        # keys' presence switches on the per-bin scatter in the kernel
        out["J_bin"] = jnp.zeros((nmodel + 1, radfield_nbins),
                                 jnp.float32)
        out["nuJ_bin"] = jnp.zeros((nmodel + 1, radfield_nbins),
                                   jnp.float32)
    if n_bfcont > 0:
        if bf_fine_bins > 0:
            # detailed bf-rate estimators, factored TPU-first: the
            # kernel accumulates the sigma-free path integrand
            # dist*e/nu*dopp on a fine log-nu grid (ONE column
            # scatter per iteration); the driver contracts it with
            # the per-continuum sigma table once per timestep on the
            # MXU ([cells, bins] @ [bins, ncont]). Replaces the
            # per-iteration [N, ncont] gather+scatter (the measured
            # ~40 ms/iteration hot spot of estimator-enabled runs);
            # sigma is evaluated at bin centres (0.4% log-nu
            # resolution at 1024 bins vs update_bfestimators'
            # per-event sigma, radfield.cc:764-828)
            out["J_bf_fine"] = jnp.zeros((nmodel + 1, bf_fine_bins),
                                         jnp.float32)
        else:
            # per-event exact-sigma accumulation (kept for the
            # sharded/domain paths)
            out["bfrate"] = jnp.zeros((nmodel + 1, n_bfcont),
                                      jnp.float32)
    return out | {
        "J": jnp.zeros(nmodel + 1, jnp.float32),
        "nuJ": jnp.zeros(nmodel + 1, jnp.float32),
        "ffheat": jnp.zeros(nmodel + 1, jnp.float32),
        "colheat": jnp.zeros(nmodel + 1, jnp.float32),
        "dep_cell": jnp.zeros(nmodel + 1, jnp.float32),
        "gamma_dep": z(), "positron_dep": z(), "electron_dep": z(),
        "alpha_dep": z(), "gamma_emission": z(), "electron_emission": z(),
        "alpha_emission": z(), "cmf_lum": z(),
        "pellet_decays": jnp.int32(0), "escounter": jnp.int32(0),
        "cellcrossings": jnp.int32(0), "nesc": jnp.int32(0),
        "interactions": jnp.int32(0), "iterations": jnp.int32(0),
        "ma_activations": jnp.int32(0), "ma_deact_rad": jnp.int32(0),
        "ma_deact_col": jnp.int32(0), "ma_jumps": jnp.int32(0),
        # 1:1 parity with the reference's event counters
        # (stats.h:48-84; pkt_action_counters_printout stats.cc:171):
        # every reference counter with a kernel-side event has a row
        **{k: jnp.int32(0) for k in (
            "ma_act_collexc", "ma_act_collion", "ma_act_ntcollexc",
            "ma_act_ntcollion", "ma_act_bf", "ma_deact_colldeexc",
            "ma_deact_collrecomb", "ma_deact_bb", "ma_deact_fb",
            "ma_internaluphigher", "ma_internaldownlower",
            "k_to_r_ff", "k_to_r_fb", "k_to_r_bb", "k_from_ff",
            "k_from_bf", "nt_from_gamma", "nt_to_ionization",
            "nt_to_excitation", "nt_to_kpkt",
            "k_from_earlierdecay", "resonancescatterings",
            "upscatter", "downscatter")},
    }


# ---------------------------------------------------------------------------
# gamma-ray physics (gammapkt.cc / photo_electric.cc re-derived)
# ---------------------------------------------------------------------------

def sigma_compton_partial(x, f):
    """Integrated Klein-Nishina cross section from energy-loss factor 1
    to f, for photon energy x = h nu / m_e c^2 (gammapkt.cc:323-333)."""
    term1 = ((x * x) - (2.0 * x) - 2.0) * jnp.log(f) / (x * x)
    term2 = ((f * f) - 1.0) / (f * f) / 2.0
    term3 = ((f - 1.0) / x) * ((1.0 / x) + (2.0 / f) + 1.0 / (x * f))
    return 3.0 * SIGMA_T * (term1 + term2 + term3) / (8.0 * x)


def sigma_compton_total(nu_cmf):
    """KN total cross section per electron [cm^2] with the Thomson
    low-energy limit (sig_comp, gammapkt.cc:335-361)."""
    x = H * nu_cmf / MEC2
    fmax = 1.0 + 2.0 * x
    kn = sigma_compton_partial(jnp.maximum(x, 1e-4), fmax)
    return jnp.where(x < 1e-2, SIGMA_T, kn)


def compton_choose_f(x, u, niter: int = 24):
    """Invert sigma_partial(x, f) = u * sigma_partial(x, fmax) by
    bisection (choose_f, gammapkt.cc:363-397), vectorised with a fixed
    iteration count."""
    fmax = 1.0 + 2.0 * x
    norm = u * sigma_compton_partial(x, fmax)

    def body(_, fb):
        f_min, f_max = fb
        ftry = 0.5 * (f_min + f_max)
        s = sigma_compton_partial(x, ftry)
        hi = s > norm
        return jnp.where(hi, f_min, ftry), jnp.where(hi, ftry, f_max)

    f_min, f_max = jax.lax.fori_loop(
        0, niter, body, (jnp.ones_like(x), fmax))
    return 0.5 * (f_min + f_max)


def thomson_angle(u):
    """Sample mu from the dipole (Thomson) phase function by the
    standard cubic inversion (thomson_angle, gammapkt.cc:399-419)."""
    b = (8.0 * u) - 4.0
    t = jnp.sqrt(b * b + 4.0) - b
    t = jnp.cbrt(t / 2.0)
    return (1.0 / t) - t


def sigma_photoelectric_cgs(nu_cmf, rho, ffegrp, gamma_grey):
    """Photoelectric absorption coefficient [1/cm] in the cmf
    (sig_photo_electric, photo_electric.cc:10-49): Si- and Fe-like
    power-law fits weighted by the Fe-group fraction; or a grey value
    when gamma_grey >= 0."""
    nu100kev = nu_cmf / 2.41326e19
    sig_si = 1.16e-24 * jnp.power(jnp.maximum(nu100kev, 1e-6), -3.13) \
        * rho / MH / 28.0
    sig_fe = 25.7e-24 * jnp.power(jnp.maximum(nu100kev, 1e-6), -3.0) \
        * rho / MH / 56.0
    phys = sig_fe * ffegrp + sig_si * (1.0 - ffegrp)
    return jnp.where(gamma_grey < 0, phys, gamma_grey * rho)


def sigma_pairprod_cgs(nu_cmf, rho, ffegrp, gamma_grey):
    """Pair-production coefficient [1/cm] in the cmf
    (sig_pair_prod, photo_electric.cc:51-114)."""
    nu_ratio = nu_cmf / 2.41326e20  # units of 1 MeV-equivalent frequency
    lowband = 1.0063 * (nu_ratio - 1.022)
    highband = 0.0481 + 0.301 * (nu_ratio - 1.5)
    fac = jnp.where(nu_cmf > 3.61990e20, highband, lowband)
    sig_si = fac * 196.0e-27 * rho / MH / 28.0
    sig_fe = fac * 784.0e-27 * rho / MH / 56.0
    sig = sig_fe * ffegrp + sig_si * (1.0 - ffegrp)
    sig = jnp.where(nu_cmf > 2.46636e20, sig, 0.0)
    return jnp.where(gamma_grey < 0, jnp.maximum(sig, 0.0), 0.0)


# ---------------------------------------------------------------------------
# thermal (Planck) frequency sampling
# ---------------------------------------------------------------------------

ROWW = 128  # TPU-native gather row width: fetching a whole <=128-wide
#             row costs the same as one scalar gather (lane tile), so
#             every table the kernel touches is laid out in rows


def pack_cdf(arr, G: int):
    """Host/build-time packing of cumulative rows [nm1, G, K] into the
    row-gatherable block layout used by :func:`cdf_search`:
      blk [nm1, G*nb, ROWW]  (padded with the row total)
      end [nm1, G, nb]       (block-end partial sums; None if K<=ROWW)
    Leading dim stays nm1 so domain decomposition shards it."""
    import numpy as _np
    a = _np.asarray(arr, _np.float32)
    nm1, g, K = a.shape
    assert g == G
    if K <= ROWW:
        return a, None
    nb = -(-K // ROWW)
    pad = _np.pad(a, ((0, 0), (0, 0), (0, nb * ROWW - K)),
                  mode="edge")
    blk = pad.reshape(nm1, G * nb, ROWW)
    end = pad.reshape(nm1, G, nb, ROWW)[..., -1]
    return blk, end


def cdf_search(blk, end, mgi, g, target, *, G: int, K: int):
    """First index i in [0, K) with cum_row[i] >= target, for the
    cumulative rows packed by :func:`pack_cdf`; row = (mgi, g).
    One row-gather for K <= 128, two otherwise — replaces per-lane
    binary searches (each step of which costs a full gather on TPU).
    """
    nm1 = blk.shape[0]
    if end is None:
        rows = blk.reshape(nm1 * G, K)[mgi * G + g]
        idx = jnp.sum((rows < target[:, None]).astype(jnp.int32),
                      axis=1)
        return jnp.clip(idx, 0, K - 1)
    nb = end.shape[2]
    ends = end.reshape(nm1 * G, nb)[mgi * G + g]  # [N, nb]
    b = jnp.sum((ends < target[:, None]).astype(jnp.int32), axis=1)
    b = jnp.clip(b, 0, nb - 1)
    rows = blk.reshape(nm1 * G * nb, ROWW)[(mgi * G + g) * nb + b]
    off = jnp.sum((rows < target[:, None]).astype(jnp.int32), axis=1)
    return jnp.clip(b * ROWW + jnp.clip(off, 0, ROWW - 1), 0, K - 1)


def bin_fetch(tbl2, mgi, b):
    """tbl2[mgi, b] per lane for a [R, K] table with per-lane (row,
    bin) indices: one row-gather over 128-wide blocks + an in-register
    one-hot extract, instead of a scalar gather. K must be a multiple
    of 128 when K > 128."""
    R, K = tbl2.shape
    if K <= ROWW:
        return onehot_extract(tbl2[mgi], b)
    nbk = K // ROWW
    rows = tbl2.reshape(R * nbk, ROWW)[
        mgi * nbk + jnp.clip(b // ROWW, 0, nbk - 1)]
    return onehot_extract(rows, b % ROWW)


def onehot_extract(rows, idx):
    """rows [N, W], idx [N] -> rows[n, idx[n]] without a gather (the
    one-hot multiply-reduce stays in registers)."""
    W = rows.shape[1]
    oh = (jnp.arange(W, dtype=jnp.int32)[None, :] == idx[:, None])
    return jnp.sum(jnp.where(oh, rows, 0.0), axis=1)


# cell_pack channel layout: ALL per-cell scalars the kernel needs,
# packed into one row so the whole set costs a single row-gather per
# iteration (the TPU gather cost model: one <=128-wide row == one
# scalar gather; see tools/microbench_step.py / opbench findings)
CP_MGI, CP_RHO, CP_FFE, CP_NNETOT_SIG, CP_CHI_GREY, CP_THICK, \
    CP_TE, CP_CHI_TH, CP_KFF, CP_COOL_FF, CP_COOL_FB, CP_COOL_EXC, \
    CP_COOL_ION, CP_NT_FI, CP_NT_FE, CP_NT_TOTW, CP_PLANCK_CLO, \
    CP_PLANCK_CHI, CP_POSMIN_X, CP_POSMIN_Y, CP_POSMIN_Z, CP_WID \
    = range(22)
CP_W = 24


def build_cell_pack(tables: dict, planck_x, planck_cdf,
                    nu_min_r: float, nu_max_r: float) -> np.ndarray:
    """[ncells_prop, CP_W] f32 per-PROPAGATION-cell scalar rows (host
    build, once per timestep). Channel 0 is the model-grid index (the
    empty-cell sentinel row nmodel for empty cells); the rest are the
    per-cell scalars the kernel previously fetched with ~15 separate
    gathers per iteration."""
    cm = np.asarray(tables["cell_mgi"])
    n = len(cm)
    cols = np.zeros((n, CP_W), np.float32)
    cols[:, CP_MGI] = cm

    def bymgi(key, col):
        if key in tables:
            cols[:, col] = np.asarray(tables[key], np.float32)[cm]

    bymgi("rho", CP_RHO)
    bymgi("ffegrp", CP_FFE)
    bymgi("nnetot_sig", CP_NNETOT_SIG)
    bymgi("chi_grey", CP_CHI_GREY)
    bymgi("thick", CP_THICK)
    bymgi("Te", CP_TE)
    bymgi("chi_thomson", CP_CHI_TH)
    bymgi("kff_base", CP_KFF)
    bymgi("kp_cool_ff", CP_COOL_FF)
    bymgi("nt_frac_ion", CP_NT_FI)
    bymgi("nt_frac_exc", CP_NT_FE)
    for key, col in (("kp_w_fb", CP_COOL_FB),
                     ("kp_w_collexc", CP_COOL_EXC),
                     ("kp_w_collion", CP_COOL_ION),
                     ("nt_ion_cum", CP_NT_TOTW)):
        if key in tables:
            cols[:, col] = np.asarray(
                tables[key], np.float32)[cm][:, -1]
    # per-cell Planck CDF window [c_lo, c_hi] for the cell's Te (the
    # only T the kernel samples thermal emission at), so per-event
    # sampling is a single inverse-CDF interp
    Te = np.maximum(cols[:, CP_TE], 1.0)
    px = np.asarray(planck_x, np.float64)
    pc = np.asarray(planck_cdf, np.float64)
    x_lo = H * nu_min_r / (KB * Te)
    x_hi = H * nu_max_r / (KB * Te)
    cols[:, CP_PLANCK_CLO] = np.interp(x_lo, px, pc)
    cols[:, CP_PLANCK_CHI] = np.interp(x_hi, px, pc)
    pos_min = np.asarray(tables["pos_min"], np.float32)
    ndim = pos_min.shape[1]
    cols[:, CP_POSMIN_X:CP_POSMIN_X + ndim] = pos_min
    cols[:, CP_WID] = np.asarray(tables["wid"], np.float32)
    return cols


def _nbits(n: int) -> int:
    """Binary-search step count for a table of static size n."""
    import math
    return max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)


def bisect_count_gt_desc(arr, vals, n: int):
    """Index of the first entry of DESCENDING ``arr`` that is <= val
    (== count of entries > val), per lane, by binary search: O(log n)
    vector gathers instead of the O(N x n) broadcast compare, which is
    the difference between viable and catastrophic at reference
    linelist scale (1e5-1e7 lines, input.cc:1053-1065)."""
    lo = jnp.zeros(vals.shape, jnp.int32)
    hi = jnp.full(vals.shape, n, jnp.int32)

    def body(_, lh):
        lo_i, hi_i = lh
        mid = (lo_i + hi_i) // 2
        pred = arr[jnp.clip(mid, 0, n - 1)] > vals
        return (jnp.where(pred, mid + 1, lo_i),
                jnp.where(pred, hi_i, mid))

    lo, _ = jax.lax.fori_loop(0, _nbits(n), body, (lo, hi))
    return lo


def searchsorted_cmp(xs, q, side: str = "left"):
    """TPU-fast searchsorted on a small sorted table: a broadcast
    compare + row reduction (fuses on the VPU) instead of
    jnp.searchsorted's sequential scan, which costs ~8 ms per call at
    megabatch sizes inside a while_loop on TPU."""
    if side == "left":
        return jnp.sum((xs[None, :] < q[:, None]).astype(jnp.int32),
                       axis=1)
    return jnp.sum((xs[None, :] <= q[:, None]).astype(jnp.int32),
                   axis=1)


def interp_bs(xq, xs, ys):
    """Linear interpolation of a monotone-ascending table (xs, ys) at
    xq via per-lane binary search: O(log P) vector gathers instead of
    the O(N x P) broadcast compare (the table fits VMEM, so the
    gathers are on-chip)."""
    n = xs.shape[0]
    lo = jnp.zeros(xq.shape, jnp.int32)
    hi = jnp.full(xq.shape, n, jnp.int32)

    def body(_, lh):
        lo_i, hi_i = lh
        mid = (lo_i + hi_i) // 2
        pred = xs[jnp.clip(mid, 0, n - 1)] <= xq
        return (jnp.where(pred, mid + 1, lo_i),
                jnp.where(pred, hi_i, mid))

    lo, _ = jax.lax.fori_loop(0, _nbits(n), body, (lo, hi))
    j = jnp.clip(lo, 1, n - 1)
    x0 = xs[j - 1]
    x1 = xs[j]
    y0 = ys[j - 1]
    y1 = ys[j]
    w = jnp.clip((xq - x0) / jnp.maximum(x1 - x0, 1e-30), 0.0, 1.0)
    return y0 + w * (y1 - y0)


def small_select(idx, *tabs):
    """Select tab[idx] per lane from SMALL shared tables by one-hot
    multiply-reduce — a few [N, P] vector ops instead of a gather
    (each gather costs ~2 ms at megabatch size on TPU)."""
    P = tabs[0].shape[0]
    oh = (jnp.arange(P, dtype=jnp.int32)[None, :] == idx[:, None])
    return tuple(jnp.sum(jnp.where(oh, t[None, :], 0), axis=1)
                 for t in tabs)


def interp_cmp(xq, xs, ys):
    """Linear interpolation of a small monotone table, gather-free:
    broadcast compare-reduce for the index, one-hot selects for the
    bracketing values."""
    j = jnp.clip(searchsorted_cmp(xs, xq, "right"), 1,
                 xs.shape[0] - 1)
    x0, y0 = small_select(j - 1, xs, ys)
    x1, y1 = small_select(j, xs, ys)
    w = jnp.clip((xq - x0) / jnp.maximum(x1 - x0, 1e-30), 0.0, 1.0)
    return y0 + w * (y1 - y0)


def sample_planck_nu_cp(u, T, c_lo, c_hi, params: TransportParams):
    """Inverse-CDF Planck sample restricted to [nu_min_r, nu_max_r]
    (replaces sample_planck, kpkt.cc:428-446). The per-cell CDF window
    [c_lo, c_hi] comes precomputed from the cell_pack row, so the
    per-event work is a single small-table interp."""
    target = c_lo + u * (c_hi - c_lo)
    logx = interp_cmp(target, params.planck_cdf,
                      jnp.log(params.planck_x))
    Tsafe = jnp.maximum(T, 1.0)
    nu = jnp.exp(logx) * jnp.float32(KB / H) * Tsafe
    return jnp.clip(nu, params.nu_min_r, params.nu_max_r)


def sample_recomb_nu(cont_idx, Te, u, params: TransportParams):
    """Sample the emission frequency of a radiative recombination from
    the continuum emissivity sigma(nu) nu^3 exp(-h(nu-nu_edge)/kTe)
    (select_continuum_nu, ratecoeff.cc:628-720), via a two-pass scan
    over the cross-section grid."""
    NP = params.cont_sigma.shape[1]
    nu_edge = params.cont_nu_edge[cont_idx]
    Tsafe = jnp.maximum(Te, 1.0)
    a = jnp.float32(H / KB) * nu_edge / Tsafe  # exponent scale

    def w_at(i):
        x = 1.0 + params.cont_nuinc * i
        sig = params.cont_sigma[cont_idx, i]
        return sig * x**3 * jnp.exp(-a * (x - 1.0))

    def sum_body(i, acc):
        return acc + w_at(i)

    total = jax.lax.fori_loop(0, NP, sum_body, jnp.zeros_like(nu_edge))
    target = u * total

    def pick_body(i, st):
        acc, idx = st
        acc2 = acc + w_at(i)
        idx = jnp.where((acc2 >= target) & (idx < 0), i, idx)
        return acc2, idx

    _, idx = jax.lax.fori_loop(
        0, NP, pick_body,
        (jnp.zeros_like(nu_edge), jnp.full_like(cont_idx, -1)))
    idx = jnp.clip(idx, 0, NP - 1)
    return nu_edge * (1.0 + params.cont_nuinc * idx.astype(jnp.float32))


def sample_recomb_nu_table(cont_idx, mgi, u, params: TransportParams,
                           recomb_cum, nu_edge=None):
    """Table-accelerated variant of :func:`sample_recomb_nu`: the
    per-(cell, continuum) cumulative emissivity over the sigma grid is
    precomputed once per timestep (driver._tables) and sampled with a
    SINGLE row-gather + in-register compare-count — the TPU analogue
    of the reference's per-cell-history cumulative emissivity cache
    (select_continuum_nu, ratecoeff.cc:628-720)."""
    NP = recomb_cum.shape[2]
    ncont = recomb_cum.shape[1]
    cidx = jnp.clip(cont_idx, 0, ncont - 1)
    rows = recomb_cum.reshape(-1, NP)[mgi * ncont + cidx]  # [N, NP]
    target = (u * rows[:, NP - 1])[:, None]
    idx = jnp.clip(jnp.sum((rows < target).astype(jnp.int32), axis=1),
                   0, NP - 1)
    if nu_edge is None:
        nu_edge = params.cont_nu_edge[cont_idx]
    return nu_edge * (1.0 + params.cont_nuinc * idx.astype(jnp.float32))


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _move(pos, dirvec, dist, t, nu_rf, e_rf, nu_cmf_old, relativistic):
    """Move a packet ``dist`` (rest frame) and recompute cmf quantities
    at the new position/time (move_pkt_withtime, vectors.h:113-144).
    nu_cmf is clamped to be non-increasing to suppress rounding."""
    new_pos = pos + dirvec * dist[..., None]
    new_t = t + dist
    dopp = geo.doppler_packet(new_pos, dirvec, new_t, relativistic)
    nu_cmf = jnp.minimum(nu_rf * dopp, nu_cmf_old)
    e_cmf = e_rf * dopp
    return new_pos, new_t, nu_cmf, e_cmf, dopp


def _emit_isotropic(pos, t, u1, u2, relativistic):
    """Sample isotropic cmf direction, return (dir_rf, doppler_factor)
    (emitt_rpkt, rpkt.cc:975-1025)."""
    dir_cmf = geo.isotropic_direction(u1, u2)
    vel = geo.flow_velocity(pos, t)
    dir_rf = geo.angle_ab(dir_cmf, -vel)
    dir_rf = geo.normalize3(dir_rf)
    dopp = geo.doppler_nucmf_on_nurf(dir_rf, vel, relativistic)
    return dir_rf, dopp


# ---------------------------------------------------------------------------
# the event step
# ---------------------------------------------------------------------------

def _event_step(pk: PacketBatch, est: dict, tables: dict,
                params: TransportParams, t2, nts_is_first, base_key,
                grid_type: str, ncoord: int, relativistic: bool,
                detailed: bool, polarization: bool = False,
                vpkt: bool = False):
    """Advance every active packet by one event / conversion.

    With ``detailed`` (static flag, opacity_case 4), r-packets in
    non-thick cells undergo full frequency-dependent transport:
    Thomson + free-free continuum plus the Sobolev line walk through
    the frequency-sorted line list (get_event, rpkt.cc:67-328) — one
    line encounter per kernel iteration, with the exponential optical
    depth budget redrawn per iteration (statistically identical by
    memorylessness).
    """
    N = pk.n
    u = packet_uniforms(base_key, pk.pkt_id, pk.rng_count, salt=0, n=14)

    cellc = jnp.clip(pk.cell, 0, tables["cell_mgi"].shape[0] - 1)
    has_cp = "cell_pack" in tables
    if has_cp:
        # ONE row-gather fetches every per-cell scalar (see CP_*
        # channel layout above); per-iteration gathers are the
        # dominant kernel cost on TPU
        cp = tables["cell_pack"][cellc]
        mgi = cp[:, CP_MGI].astype(jnp.int32)
    else:
        cp = None
        mgi = tables["cell_mgi"][cellc]

    def cell_scalar(key, col):
        return cp[:, col] if has_cp else tables[key][mgi]

    nmodel = tables["chi_grey"].shape[0] - 1
    active = ((pk.ptype != TYPE_ESCAPE) & (pk.ptype >= 0)
              & (pk.prop_time < t2))
    if "cell_mine" in tables:
        # grid domain decomposition with halo ownership (domain.py):
        # a device advances any packet whose cell lies in its owned
        # range EXTENDED by the halo — boundary packets random-walk
        # across the seam without paying a migration round per
        # crossing; only packets leaving the halo freeze until the
        # sorted all-to-all hands them to their owner
        mine = tables["cell_mine"][
            jnp.clip(pk.cell, 0, tables["cell_mine"].shape[0] - 1)]
        active &= mine != 0
    elif "cell_owner" in tables:
        # grid domain decomposition (domain.py): only the device that
        # owns the packet's cell advances it; foreign packets stay
        # frozen until the sorted all-to-all migration hands them to
        # their owner (the TPU-native answer to the reference's
        # replicated-grid transport, SURVEY.md §5.7)
        own = tables["cell_owner"][
            jnp.clip(pk.cell, 0, tables["cell_owner"].shape[0] - 1)]
        active &= own == tables["dd_rank"][0]

    new = {f.name: getattr(pk, f.name)
           for f in dataclasses.fields(PacketBatch)}

    # per-line emission/absorption counters (linestat.out accumulation)
    if "line_em" in est:
        est_line_em = est["line_em"]
        est_line_ab = est["line_ab"]
    # per-(cell, ion) energy-flow stats (TRACK_ION_STATS)
    if "ion_stats" in est:
        est_ion = est["ion_stats"]

        def _lvl_ion(levels):
            li = tables["level_ion"]
            return li[jnp.clip(levels, 0, li.shape[0] - 1)]

    def upd(mask, **kw):
        for k, v in kw.items():
            m = mask
            if new[k].ndim == 2:
                m = mask[:, None]
            new[k] = jnp.where(m, v, new[k])

    scal = {k: jnp.float32(0.0) for k in
            ("gamma_dep", "positron_dep", "electron_dep", "alpha_dep",
             "gamma_emission", "electron_emission", "alpha_emission",
             "cmf_lum")}
    cnt = {k: jnp.int32(0) for k in
           ("pellet_decays", "escounter", "cellcrossings", "nesc",
            "interactions", "ma_activations", "ma_deact_rad",
            "ma_deact_col", "ma_jumps",
            "ma_act_collexc", "ma_act_collion", "ma_act_ntcollexc",
            "ma_act_ntcollion", "ma_act_bf", "ma_deact_colldeexc",
            "ma_deact_collrecomb", "ma_deact_bb", "ma_deact_fb",
            "ma_internaluphigher", "ma_internaldownlower",
            "k_to_r_ff", "k_to_r_fb", "k_to_r_bb", "k_from_ff",
            "k_from_bf", "nt_from_gamma", "nt_to_ionization",
            "nt_to_excitation", "nt_to_kpkt",
            "k_from_earlierdecay", "resonancescatterings",
            "upscatter", "downscatter")}

    def msum(mask, x):
        return jnp.sum(jnp.where(mask, x, 0.0))

    def mcount(mask):
        return jnp.sum(mask.astype(jnp.int32))

    ts = pk.prop_time

    # =====================================================================
    # phase A1: pellets (update_pellet, update_packets.cc:71-135)
    # =====================================================================
    is_pellet = active & (pk.ptype == TYPE_RADIOACTIVE_PELLET)
    tdecay = pk.tdecay

    # (a) decays after this timestep: ride the flow to t2
    m_flow = is_pellet & (tdecay > t2)
    upd(m_flow, pos=pk.pos * (t2 / ts)[:, None], prop_time=t2)

    # (c, mask first) decayed before tmin (first timestep only):
    # these become Lucy-2004 PRE_KPKT packets below and must NOT also
    # take the normal decay branch
    m_pre = is_pellet & (tdecay <= ts) & nts_is_first

    # (b) decays within (ts, t2]; pellets whose tdecay is already in
    # the past (possible only on a mid-run cold start, e.g. itstep > 0
    # without a checkpoint) decay immediately at the current time so
    # they can never wedge the event loop
    tdecay = jnp.maximum(tdecay, ts)
    m_decay = is_pellet & (tdecay <= t2) & ~m_flow & ~m_pre
    pos_dec = pk.pos * (tdecay / ts)[:, None]
    cnt["pellet_decays"] += mcount(m_decay)

    m_particle = m_decay & pk.from_particle
    is_bplus = pk.pellet_decaytype == DECAYTYPE_BETAPLUS
    is_bminus = pk.pellet_decaytype == DECAYTYPE_BETAMINUS
    is_alpha = pk.pellet_decaytype == DECAYTYPE_ALPHA
    scal["positron_dep"] += msum(m_particle & is_bplus, pk.e_cmf)
    scal["electron_emission"] += msum(m_particle & is_bminus, pk.e_cmf)
    scal["alpha_emission"] += msum(m_particle & is_alpha, pk.e_cmf)
    upd(m_particle & is_bplus, ptype=TYPE_NTLEPTON, pos=pos_dec,
        prop_time=tdecay)
    upd(m_particle & (is_bminus | is_alpha),
        ptype=TYPE_NONTHERMAL_PREDEPOSIT, pos=pos_dec, prop_time=tdecay,
        em_time=tdecay, em_pos=pos_dec)

    # gamma decay (pellet_gamma_decay, gammapkt.cc:256-321); the line
    # frequency was pre-sampled at pellet init (packets.py), since it
    # depends only on the nuclide
    m_gamma = m_decay & ~pk.from_particle
    scal["gamma_emission"] += msum(m_gamma, pk.e_cmf)
    nu_line = pk.nu_decay
    has_lines = pk.nu_decay > 0
    dir_rf, dopp = _emit_isotropic(pos_dec, tdecay, u[:, 1], u[:, 2],
                                   relativistic)
    m_gline = m_gamma & has_lines
    upd(m_gline, ptype=TYPE_GAMMA, pos=pos_dec, prop_time=tdecay,
        dirvec=dir_rf, nu_cmf=nu_line, nu_rf=nu_line / dopp,
        e_rf=pk.e_cmf / dopp, last_cross=geo.BOUNDARY_NONE,
        em_time=tdecay, em_pos=pos_dec)
    # no known gamma spectrum -> thermalise (gammapkt.cc:266-270)
    upd(m_gamma & ~has_lines, ptype=TYPE_KPKT,
        nscatterings=jnp.int32(0), pos=pos_dec,
        prop_time=tdecay)

    # (c) decayed before tmin (first timestep only): Lucy 2004 losses
    # e_cmf *= tdecay/tmin (update_packets.cc:117-130); sim-time
    # tmin == 1, and the RAW pk.tdecay must be used — the overdue
    # clamp above would erase the energy reduction
    upd(m_pre, ptype=TYPE_PRE_KPKT, e_cmf=pk.e_cmf * pk.tdecay,
        prop_time=jnp.float32(1.0))
    cnt["k_from_earlierdecay"] += mcount(m_pre)

    # =====================================================================
    # phase A2: non-thermal deposit (do_nonthermal_predeposit,
    # update_packets.cc:16-69) — instant deposition mode
    # =====================================================================
    m_nt = active & (pk.ptype == TYPE_NONTHERMAL_PREDEPOSIT)
    # non-instant mode (INSTANT_PARTICLE_DEPOSITION=false,
    # do_nonthermal_predeposit, update_packets.cc:16-69): the particle
    # (physical kinetic energy h*nu_cmf) loses energy at
    # endot = {5e11 alpha, 4e10 beta} MeV/s * rho; a discrete
    # absorption happens at a uniformly-sampled remaining energy
    ts_nt = pk.prop_time
    rho_nt = cell_scalar("rho", CP_RHO)
    endot = jnp.where(is_alpha, 5.0e11, 4.0e10) * jnp.float32(MEV) \
        * jnp.maximum(rho_nt, 1e-30)
    particle_en = jnp.float32(H) * pk.nu_cmf
    dt_abs = (u[:, 1] * particle_en / endot) / params.tmin_seconds
    t_abs = ts_nt + dt_abs
    m_dep = m_nt & (params.instant_deposit | (t_abs <= t2))
    t_dep = jnp.where(params.instant_deposit, ts_nt, t_abs)
    scal["alpha_dep"] += msum(m_dep & is_alpha, pk.e_cmf)
    scal["electron_dep"] += msum(m_dep & is_bminus, pk.e_cmf)
    scal["positron_dep"] += msum(m_dep & is_bplus, pk.e_cmf)
    upd(m_dep, ptype=TYPE_NTLEPTON,
        pos=pk.pos * (t_dep / jnp.maximum(ts_nt, 1e-30))[:, None],
        prop_time=t_dep)
    # not absorbed this timestep: ride the flow, reduced KE
    m_ride = m_nt & ~m_dep
    upd(m_ride,
        nu_cmf=jnp.maximum(
            (particle_en - endot * (t2 - ts_nt)
             * params.tmin_seconds) / jnp.float32(H), 1e5),
        pos=pk.pos * (t2 / jnp.maximum(ts_nt, 1e-30))[:, None],
        prop_time=t2)

    # NT leptons (do_ntlepton, nonthermal.cc:1877-1980): with the
    # Spencer-Fano solution, deposited energy splits into ionisation
    # (-> macro-atom in the upper ion), optionally excitation (-> MA
    # at a sampled line's upper level; NT_EXCITATION_ON — upstream
    # currently hardcodes frac_excitation = 0, nonthermal.cc:1898),
    # and heating (-> k-packet). Without the solver (grey mode /
    # nonthermal off) everything heats.
    m_lep = active & (pk.ptype == TYPE_NTLEPTON)
    if detailed:
        # "macroatom should not be activated in thick cells"
        # (do_ntlepton, nonthermal.cc:1883): in grey-approximation
        # cells all NT energy heats — ionisation/excitation channels
        # are gated off
        lep_thick = cell_scalar("thick", CP_THICK) == 1
        nt_fi = jnp.where(lep_thick, 0.0,
                          cell_scalar("nt_frac_ion", CP_NT_FI))
        nions_nt = tables["nt_ion_cum"].shape[1]
        lep_ion = m_lep & (u[:, 8] < nt_fi)
        # select the ion by binary search of the cumulative
        # energy-weighted NT ionisation rates (select_nt_ionization2,
        # nonthermal.cc:1858-1875)
        tot_w_nt = (cp[:, CP_NT_TOTW] if has_cp
                    else tables["nt_ion_cum"][mgi, nions_nt - 1])

        def nt_compute(_):
            # one row-gather over the per-cell cumulative ion weights
            # (nions <= 128 in practice), one-hot target lookup, and
            # the optional Auger row — all behind a lax.cond
            target_nt = jnp.clip(u[:, 9], 0.0, 1.0) * tot_w_nt
            if nions_nt <= ROWW:
                rows_nt = tables["nt_ion_cum"][mgi]  # [N, nions]
                ntlo = jnp.sum((rows_nt < target_nt[:, None])
                               .astype(jnp.int32), axis=1)
            else:
                def nt_body(_, lohi):
                    lo_i, hi_i = lohi
                    mid = (lo_i + hi_i) // 2
                    below = tables["nt_ion_cum"][
                        mgi, jnp.clip(mid, 0, nions_nt - 1)] \
                        < target_nt
                    return (jnp.where(below, mid + 1, lo_i),
                            jnp.where(below, hi_i, mid))

                ntlo, _ = jax.lax.fori_loop(
                    0, _nbits(nions_nt), nt_body,
                    (jnp.zeros_like(pk.cell),
                     jnp.full_like(pk.cell, nions_nt - 1)))
            nt_ion = jnp.clip(ntlo, 0,
                              params.nt_target_level.shape[0] - 1)
            nt_lvl = small_select(nt_ion,
                                  params.nt_target_level)[0]
            if "nt_auger_cum" in tables:
                # Auger multi-electron ionisation: sample the number
                # of extra ejected electrons from the energy-weighted
                # probabilities and jump to ion+1+a's ground state
                # (nt_random_upperion, nonthermal.cc:1657-1676)
                na1 = tables["nt_auger_cum"].shape[2]
                nm1_a = tables["nt_auger_cum"].shape[0]
                arow = tables["nt_auger_cum"].reshape(
                    nm1_a * nions_nt, na1)[mgi * nions_nt + nt_ion]
                tot_a = arow[:, -1]
                targ_a = jnp.clip(u[:, 13], 0.0, 1.0) * tot_a
                a_sel = jnp.clip(
                    jnp.sum((targ_a[:, None] >= arow)
                            .astype(jnp.int32), axis=1), 0, na1 - 1)
                lvl_auger = tables["nt_target_auger"].reshape(-1)[
                    jnp.clip(nt_ion * na1 + a_sel, 0,
                             nions_nt * na1 - 1)]
                nt_lvl = jnp.where((tot_a > 0) & (lvl_auger >= 0),
                                   lvl_auger, nt_lvl)
            return nt_lvl

        nt_lvl = jax.lax.cond(
            jnp.any(lep_ion), nt_compute,
            lambda _: jnp.full_like(pk.cell, -1), 0)
        lep_ion = lep_ion & (nt_lvl >= 0) & (tot_w_nt > 0)
        upd(lep_ion, ptype=TYPE_MA, ma_level=jnp.maximum(nt_lvl, 0),
            next_trans=jnp.int32(-1), nscatterings=jnp.int32(0))
        if "ion_stats" in est:
            # ION_NTION(6), ENERGYIN_NTCOLLION(27), ENERGYIN_TOTAL(28)
            ion_nt = _lvl_ion(jnp.maximum(nt_lvl, 0))
            w_nt = jnp.where(lep_ion, pk.e_cmf, 0.0)
            for col in (6, 27, 28):
                est_ion = est_ion.at[mgi, ion_nt, col].add(w_nt)
        lep_exc = jnp.zeros_like(m_lep)
        if "nt_exc_cum" in tables:
            # NT excitation channel (do_ntlepton's NT_EXCITATION_ON
            # branch, nonthermal.cc:1936-1974): with probability
            # frac_excitation (given not ionisation), pick the line by
            # binary search of the cumulative per-line deposition
            # fractions and activate its upper level
            nt_fe = jnp.where(lep_thick, 0.0,
                              cell_scalar("nt_frac_exc", CP_NT_FE))
            nexc = tables["nt_exc_cum"].shape[1]
            lep_exc = (m_lep & ~lep_ion
                       & (u[:, 8] < nt_fi + nt_fe))

            def exc_compute(_):
                tot_w_exc = tables["nt_exc_cum"][mgi, nexc - 1]
                target_exc = jnp.clip(u[:, 9], 0.0, 1.0) * tot_w_exc

                def exc_body(_, lohi):
                    lo_i, hi_i = lohi
                    mid = (lo_i + hi_i) // 2
                    below = tables["nt_exc_cum"][
                        mgi, jnp.clip(mid, 0, nexc - 1)] < target_exc
                    return (jnp.where(below, mid + 1, lo_i),
                            jnp.where(below, hi_i, mid))

                exclo, _ = jax.lax.fori_loop(
                    0, _nbits(nexc), exc_body,
                    (jnp.zeros_like(pk.cell),
                     jnp.full_like(pk.cell, nexc - 1)))
                return (tables["nt_exc_upper"][
                    jnp.clip(exclo, 0, nexc - 1)], tot_w_exc)

            exc_upper, tot_w_exc = jax.lax.cond(
                jnp.any(lep_exc), exc_compute,
                lambda _: (jnp.zeros_like(pk.cell),
                           jnp.zeros_like(pk.e_cmf)), 0)
            lep_exc = lep_exc & (tot_w_exc > 0)
            upd(lep_exc, ptype=TYPE_MA, ma_level=exc_upper,
                next_trans=jnp.int32(-1), nscatterings=jnp.int32(0))
        upd(m_lep & ~lep_ion & ~lep_exc, ptype=TYPE_KPKT,
            nscatterings=jnp.int32(0))
        cnt["nt_to_ionization"] += mcount(lep_ion)
        cnt["ma_act_ntcollion"] += mcount(lep_ion)
        cnt["nt_to_excitation"] += mcount(lep_exc)
        cnt["ma_act_ntcollexc"] += mcount(lep_exc)
        cnt["nt_to_kpkt"] += mcount(m_lep & ~lep_ion & ~lep_exc)
    else:
        upd(m_lep, ptype=TYPE_KPKT, nscatterings=jnp.int32(0))
        cnt["nt_to_kpkt"] += mcount(m_lep)

    # =====================================================================
    # phase A2b: macro-atom jump (do_macroatom, macroatom.cc:416-901):
    # one (ion,level)-space jump per iteration, sampling the process
    # and target line from the precomputed per-(cell,level) tables
    # =====================================================================
    if detailed:
        nlev = params.ma_up_start.shape[0] - 1
        m_ma = active & (pk.ptype == TYPE_MA)
        lvl = jnp.clip(pk.ma_level, 0, nlev - 1)
        MA_JUMP_CAP = 16
        ma_capped = pk.nscatterings >= MA_JUMP_CAP
        packed_ma = "ma_sel_blk" in tables

        def _ma_proc_choice(pc):
            """Process choice + resonance-trap guard from the [N, 8]
            cumulative process row (see comment in the unpacked
            branch below)."""
            ma_total = pc[:, 7]
            target_p = u[:, 10] * ma_total
            k_proc = jnp.clip(
                jnp.sum((target_p[:, None] >= pc).astype(jnp.int32),
                        axis=1), 0, 7)
            p_ch = jnp.diff(pc, axis=1,
                            prepend=jnp.zeros_like(pc[:, :1]))
            d_cum = jnp.cumsum(
                jnp.stack([p_ch[:, 0], p_ch[:, 1], p_ch[:, 4],
                           p_ch[:, 5]], axis=1), axis=1)
            d_tot = d_cum[:, 3]
            kd = jnp.clip(jnp.sum(((u[:, 10] * d_tot)[:, None]
                                   >= d_cum).astype(jnp.int32),
                                  axis=1), 0, 3)
            k_deact = jnp.where(kd == 0, 0,
                                jnp.where(kd == 1, 1,
                                          jnp.where(kd == 2, 4, 5)))
            k_proc = jnp.where(ma_capped & (d_tot > 0), k_deact,
                               k_proc)
            stuckf = (ma_total <= 0) | (ma_capped & (d_tot <= 0))
            return k_proc, stuckf

        if packed_ma:
            # ---- packed macro-atom machine: every lookup is a
            # row-gather (9 per iteration, only when macro-atoms are
            # in flight — the whole block sits behind a lax.cond)
            ncont_k2 = params.ma_ctgt_pack.shape[0]
            Kmax_ma = tables["ma_sel_blk"].shape[1] // 5 * ROWW \
                if tables.get("ma_sel_end") is not None \
                else tables["ma_sel_blk"].shape[2]

            def cum_at(blk, end, G, g, pos):
                nm1_ = blk.shape[0]
                if end is None:
                    K_ = blk.shape[2]
                    rows = blk.reshape(nm1_ * G, K_)[mgi * G + g]
                    return onehot_extract(rows, pos)
                nbk = end.shape[2]
                rows = blk.reshape(nm1_ * G * nbk, ROWW)[
                    (mgi * G + g) * nbk
                    + jnp.clip(pos // ROWW, 0, nbk - 1)]
                return onehot_extract(rows, pos % ROWW)

            def ma_compute(_):
                pc = tables["ma_proc_cum"][mgi, lvl]  # [N,8] row
                k_proc, stuckf = _ma_proc_choice(pc)
                sp = params.ma_span_pack[lvl]  # [N, 8] row
                is_up = k_proc == 3
                is_cont_sel = (k_proc == 4) | (k_proc == 6)
                span_s = jnp.where(
                    is_cont_sel, sp[:, 4],
                    jnp.where(is_up, sp[:, 2], sp[:, 0])
                ).astype(jnp.int32)
                span_e = jnp.where(
                    is_cont_sel, sp[:, 5],
                    jnp.where(is_up, sp[:, 3], sp[:, 1])
                ).astype(jnp.int32)
                span_e = jnp.maximum(span_e, span_s + 1)
                # group row in the merged 5-group selection table:
                # 0 raddeexc, 1 downsame, 2 upsame, 3 radrecomb,
                # 4 downlower
                g5 = jnp.where(
                    k_proc == 2, 1,
                    jnp.where(k_proc == 3, 2,
                              jnp.where(k_proc == 4, 3,
                                        jnp.where(k_proc == 6, 4, 0))
                              )).astype(jnp.int32)
                blk = tables["ma_sel_blk"]
                end = tables.get("ma_sel_end")
                base_w = jnp.where(
                    span_s > 0,
                    cum_at(blk, end, 5, g5,
                           jnp.maximum(span_s - 1, 0)), 0.0)
                end_w = cum_at(blk, end, 5, g5, span_e - 1)
                tot_w = end_w - base_w
                target_w = base_w + u[:, 11] * tot_w
                k_pos = cdf_search(blk, end, mgi, g5, target_w,
                                   G=5, K=Kmax_ma)
                k_pos = jnp.clip(k_pos, span_s, span_e - 1)
                lt = params.ma_ltgt_pack[
                    jnp.clip(k_pos, 0,
                             params.ma_ltgt_pack.shape[0] - 1)]
                ct = params.ma_ctgt_pack[
                    jnp.clip(k_pos, 0, ncont_k2 - 1)]
                k_line = jnp.where(is_up, lt[:, 0],
                                   lt[:, 1]).astype(jnp.int32)
                low_l = jnp.where(is_up, lt[:, 2],
                                  lt[:, 4]).astype(jnp.int32)
                up_l = jnp.where(is_up, lt[:, 3],
                                 lt[:, 5]).astype(jnp.int32)
                nu_ma = jnp.where(is_up, lt[:, 6], lt[:, 7])
                k_cont = ct[:, 0].astype(jnp.int32)
                cont_lvl_t = ct[:, 1].astype(jnp.int32)
                nu_edge_c = ct[:, 3]
                if "recomb_cum" in tables:
                    nu_rec = sample_recomb_nu_table(
                        k_cont, mgi, u[:, 6], params,
                        tables["recomb_cum"], nu_edge=nu_edge_c)
                else:
                    nu_rec = sample_recomb_nu(
                        k_cont, cell_scalar("Te", CP_TE), u[:, 6],
                        params)
                has_cont_f = sp[:, 6] >= 0
                up_target = jnp.maximum(sp[:, 7], 0.0) \
                    .astype(jnp.int32)
                return (k_proc, stuckf, k_line, k_cont, nu_ma,
                        nu_rec, low_l, up_l, cont_lvl_t, up_target,
                        has_cont_f)

            def ma_skip(_):
                zi = jnp.zeros_like(pk.cell)
                zb = jnp.zeros(pk.cell.shape, bool)
                zf1 = jnp.ones_like(pk.e_cmf)
                return (zi, zb, zi, zi, zf1, zf1, zi, zi, zi, zi, zb)

            (k_proc, ma_stuckf, k_line, k_cont, nu_ma, nu_rec, low_l,
             up_l, cont_lvl_t, up_target, has_cont) = jax.lax.cond(
                jnp.any(m_ma), ma_compute, ma_skip, 0)
            ma_stuck = m_ma & ma_stuckf
            is_up = k_proc == 3
        else:
            pc = tables["ma_proc_cum"][mgi, lvl]  # [N, 8] cumulative
            k_proc, ma_stuckf = _ma_proc_choice(pc)
            ma_stuck = m_ma & ma_stuckf
            # (resonance-trap guard: see _ma_proc_choice — after
            # MA_JUMP_CAP internal jumps the choice is restricted to
            # the deactivation channels so a trapped lane cannot
            # stall the megabatch the way it could not stall the
            # reference's per-packet loop, do_macroatom
            # macroatom.cc:416+)

            # line/continuum selection: binary search the cumulative
            # weight row over this level's CSR span (replaces the
            # linear scans in do_macroatom_internal_down_same,
            # macroatom.cc:174-220)
            is_up = k_proc == 3  # MA_UPSAME
            is_cont_sel = (k_proc == 4) | (k_proc == 6)
            span_s = jnp.where(
                is_cont_sel, params.ma_target_start[lvl],
                jnp.where(is_up, params.ma_lo_start[lvl],
                          params.ma_up_start[lvl]))
            span_e = jnp.where(
                is_cont_sel, params.ma_target_start[lvl + 1],
                jnp.where(is_up, params.ma_lo_start[lvl + 1],
                          params.ma_up_start[lvl + 1]))
            span_e = jnp.maximum(span_e, span_s + 1)

            def cumw(i):
                li = jnp.clip(i, 0,
                              tables["ma_w_raddeexc"].shape[1] - 1)
                ci = jnp.clip(i, 0,
                              tables["ma_w_radrecomb"].shape[1] - 1)
                vr = tables["ma_w_raddeexc"][mgi, li]
                vd = tables["ma_w_downsame"][mgi, li]
                vu = tables["ma_w_upsame"][mgi, li]
                vrec = tables["ma_w_radrecomb"][mgi, ci]
                vdl = tables["ma_w_downlower"][mgi, ci]
                out = jnp.where(k_proc == 3, vu,
                                jnp.where(k_proc == 2, vd, vr))
                out = jnp.where(k_proc == 4, vrec, out)
                out = jnp.where(k_proc == 6, vdl, out)
                return out

            base_w = jnp.where(span_s > 0, cumw(span_s - 1), 0.0)
            tot_w = cumw(span_e - 1) - base_w
            target_w = base_w + u[:, 11] * tot_w

            def bs_body(_, lohi):
                lo_i, hi_i = lohi
                mid = (lo_i + hi_i) // 2
                below = cumw(mid) < target_w
                return (jnp.where(below, mid + 1, lo_i),
                        jnp.where(below, hi_i, mid))

            lo_i, hi_i = jax.lax.fori_loop(
                0, _nbits(params.line_nu.shape[0]), bs_body,
                (span_s, span_e - 1))
            k_pos = jnp.clip(lo_i, span_s, span_e - 1)
            k_line = jnp.where(is_up, params.ma_bylo_perm[k_pos],
                               params.ma_byup_perm[k_pos])
            k_line = jnp.clip(k_line, 0, params.line_nu.shape[0] - 1)
            k_cont = params.ma_bytarget_perm[
                jnp.clip(k_pos, 0,
                         params.ma_bytarget_perm.shape[0] - 1)]
            k_cont = jnp.clip(k_cont, 0,
                              params.cont_nu_edge.shape[0] - 1)
            nu_ma = params.line_nu[k_line]
            low_l = params.line_lower[k_line]
            up_l = params.line_upper[k_line]
            cont_lvl_t = params.cont_level[k_cont]
            Te_ma0 = cell_scalar("Te", CP_TE)
            if "recomb_cum" in tables:
                nu_rec = sample_recomb_nu_table(
                    k_cont, mgi, u[:, 6], params,
                    tables["recomb_cum"])
            else:
                nu_rec = sample_recomb_nu(k_cont, Te_ma0, u[:, 6],
                                          params)
            lc_idx = params.level_cont[lvl]
            has_cont = lc_idx >= 0
            up_target = params.cont_upperlevel[
                jnp.clip(lc_idx, 0, params.cont_nu_edge.shape[0] - 1)]

        # actions
        ma_rad = m_ma & ~ma_stuck & (k_proc == 0)
        ma_col = m_ma & (ma_stuck | (k_proc == 1) | (k_proc == 5))
        ma_down = m_ma & ~ma_stuck & (k_proc == 2)
        ma_up_j = m_ma & ~ma_stuck & (k_proc == 3)
        ma_radrec = m_ma & ~ma_stuck & (k_proc == 4)
        ma_downlower = m_ma & ~ma_stuck & (k_proc == 6)
        ma_uphigher = m_ma & ~ma_stuck & (k_proc == 7)

        # radiative deexcitation -> r-packet in the selected line
        # (do_macroatom_raddeexcitation, macroatom.cc:222-296)
        dir_ma, dopp_ma = _emit_isotropic(pk.pos, pk.prop_time,
                                          u[:, 4], u[:, 5],
                                          relativistic)
        # emitt_rpkt (rpkt.cc:975-1008) resets the Stokes vector to
        # (1, 0, 0) on every re-emission — stale Q/U from a previous
        # electron-scatter chain must not survive a line absorption
        upd(ma_rad, ptype=TYPE_RPKT, nu_cmf=nu_ma,
            nu_rf=nu_ma / dopp_ma, e_rf=pk.e_cmf / dopp_ma,
            dirvec=dir_ma, last_cross=geo.BOUNDARY_NONE,
            em_time=pk.prop_time, em_pos=pk.pos,
            next_trans=k_line + 1,
            stokes_q=jnp.float32(0.0), stokes_u=jnp.float32(0.0),
            nscatterings=jnp.int32(0), emissiontype=k_line)
        if "line_em" in est:
            est_line_em = est_line_em.at[
                jnp.clip(k_line, 0, est_line_em.shape[0] - 1)].add(
                jnp.where(ma_rad, 1.0, 0.0))
        # radiative recombination -> r-packet at a continuum frequency
        # (do_macroatom_radrecomb, macroatom.cc:298-380)
        upd(ma_radrec, ptype=TYPE_RPKT, nu_cmf=nu_rec,
            nu_rf=nu_rec / dopp_ma, e_rf=pk.e_cmf / dopp_ma,
            dirvec=dir_ma, last_cross=geo.BOUNDARY_NONE,
            em_time=pk.prop_time, em_pos=pk.pos,
            next_trans=jnp.int32(-1),
            stokes_q=jnp.float32(0.0), stokes_u=jnp.float32(0.0),
            nscatterings=jnp.int32(0),
            emissiontype=-1 - k_cont)
        # collisional deexcitation/recombination -> k-packet
        # (macroatom.cc:689-757)
        upd(ma_col, ptype=TYPE_KPKT, next_trans=jnp.int32(-1))
        # internal jumps (same ion, lower ion, upper ion); count jumps
        # within this activation for the resonance-trap guard
        upd(ma_down, ma_level=low_l)
        upd(ma_up_j, ma_level=up_l)
        upd(ma_downlower, ma_level=cont_lvl_t)
        upd(m_ma & ~ma_rad & ~ma_col & ~ma_radrec,
            nscatterings=pk.nscatterings + 1)
        upd(ma_uphigher & has_cont, ma_level=up_target)
        # a level without a continuum cannot ionise; thermalise
        upd(ma_uphigher & ~has_cont, ptype=TYPE_KPKT,
            next_trans=jnp.int32(-1))

        if "ion_stats" in est:
            # energy OUT of the active ion at deactivation
            # (stats.h:18-21, 29) + ION_RADRECOMB_MACROATOM(0)
            ion_cur = _lvl_ion(lvl)
            e = pk.e_cmf
            for mask, cols in (
                    (ma_rad, (18, 29)),
                    (ma_radrec, (0, 19, 29)),
                    (m_ma & ~ma_stuck & (k_proc == 1), (20, 29)),
                    (m_ma & ~ma_stuck & (k_proc == 5), (21, 29))):
                w = jnp.where(mask, e, 0.0)
                for col in cols:
                    est_ion = est_ion.at[mgi, ion_cur, col].add(w)

        colheat_contrib = jnp.where(ma_col, pk.e_cmf, 0.0)
        cnt["ma_deact_rad"] += mcount(ma_rad | ma_radrec)
        cnt["ma_deact_col"] += mcount(ma_col)
        cnt["ma_deact_bb"] += mcount(ma_rad)
        cnt["ma_deact_fb"] += mcount(ma_radrec)
        cnt["ma_deact_colldeexc"] += mcount(
            m_ma & ~ma_stuck & (k_proc == 1))
        cnt["ma_deact_collrecomb"] += mcount(
            m_ma & ~ma_stuck & (k_proc == 5))
        cnt["ma_internaluphigher"] += mcount(ma_uphigher)
        cnt["ma_internaldownlower"] += mcount(ma_downlower)
        # emitted-vs-absorbed comparison: at MA activation nu_cmf is
        # the absorbed line's cmf frequency, so the deexcitation line
        # classifies as resonance / up / down scatter
        # (do_macroatom_raddeexcitation, macroatom.cc:253-260)
        cnt["resonancescatterings"] += mcount(
            ma_rad & (nu_ma == pk.nu_cmf))
        cnt["upscatter"] += mcount(ma_rad & (nu_ma > pk.nu_cmf))
        cnt["downscatter"] += mcount(ma_rad & (nu_ma < pk.nu_cmf))
        cnt["ma_jumps"] += mcount(ma_down | ma_up_j | ma_downlower
                                  | ma_uphigher)
        upd(ma_down | ma_up_j | ma_downlower
            | (ma_uphigher & has_cont),
            ma_jumps_cur=pk.ma_jumps_cur + 1)
        if "ma_log_i" in est:
            # LOG_MACROATOM rows at radiative bb deactivation
            # (macroatom.cc:677-683); activation snapshot fields carry
            # level_in / activatingline / nu_in; host maps levels to
            # (Z, ionstage) when draining into macroatom.out
            cap_ml = est["ma_log_i"].shape[0]
            base_ml = est["ma_log_n"]
            r_ml = jnp.cumsum(ma_rad.astype(jnp.int32)) - 1
            slot_ml = jnp.where(ma_rad, base_ml + r_ml, cap_ml)
            rows_i = jnp.stack(
                [mgi, pk.ma_activ_level, lvl, pk.ma_activ_line,
                 pk.ma_jumps_cur], axis=1).astype(jnp.int32)
            rows_f = jnp.stack(
                [pk.ma_activ_nu_cmf, nu_ma, pk.ma_activ_nu_rf,
                 nu_ma / dopp_ma], axis=1).astype(jnp.float32)
            est["ma_log_i"] = est["ma_log_i"].at[slot_ml].set(
                rows_i, mode="drop")
            est["ma_log_f"] = est["ma_log_f"].at[slot_ml].set(
                rows_f, mode="drop")
            est["ma_log_n"] = base_ml + mcount(ma_rad)

    if not detailed:
        colheat_contrib = jnp.float32(0.0) * pk.e_cmf

    # =====================================================================
    # phase A3: k-packets. In grey/thick cells (and for pre-tmin
    # packets) they re-emit as Planck r-packets (do_kpkt_bb,
    # kpkt.cc:428-475). In detailed cells the cooling channel is
    # sampled (do_kpkt, kpkt.cc:477-851): free-free emission or
    # collisional excitation -> macro-atom. (The free-bound and
    # collisional-ionisation channels activate with the
    # photoionisation machinery.)
    # =====================================================================
    ptype_now = new["ptype"]
    is_thick = cell_scalar("thick", CP_THICK) == 1
    m_kpkt_all = active & ((ptype_now == TYPE_PRE_KPKT)
                           | (ptype_now == TYPE_KPKT))
    # kpkt diffusion-time delay (do_kpkt, kpkt.cc:505-515): TYPE_KPKT
    # packets wait deltat = kpktdiffusion_timescale * timestep width
    # before re-emitting; if that crosses t2 they ride the flow and
    # stay k-packets into the next timestep (kpkt.cc:821-846)
    is_k = ptype_now == TYPE_KPKT
    t0_k = new["prop_time"]
    t0_safe = jnp.maximum(t0_k, 1e-30)
    t_kd = t0_k + params.kpkt_diffusion_dt
    m_defer = m_kpkt_all & is_k & (t_kd > t2)
    upd(m_defer, pos=new["pos"] * (t2 / t0_safe)[:, None],
        prop_time=t2)
    m_kpkt_all = m_kpkt_all & ~m_defer
    t_k = jnp.where(is_k, t_kd, t0_k)
    pos_k = new["pos"] * jnp.where(is_k, t_kd / t0_safe, 1.0)[:, None]
    upd(m_kpkt_all & is_k, pos=pos_k, prop_time=t_k)
    Te = cell_scalar("Te", CP_TE)
    dir_k, dopp_k = _emit_isotropic(pos_k, t_k, u[:, 4], u[:, 5],
                                    relativistic)
    if detailed:
        nmodel_k = tables["chi_grey"].shape[0] - 1
        in_det_cell = ~is_thick & (mgi < nmodel_k)
        nlines_k = tables["kp_w_collexc"].shape[1]
        ncont_k = tables["kp_w_fb"].shape[1]
        if has_cp:
            cool_ff = cp[:, CP_COOL_FF]
            cool_fb = cp[:, CP_COOL_FB]
            cool_exc = cp[:, CP_COOL_EXC]
            cool_ion = cp[:, CP_COOL_ION]
        else:
            cool_ff = tables["kp_cool_ff"][mgi]
            cool_fb = tables["kp_w_fb"][mgi, ncont_k - 1]
            cool_exc = tables["kp_w_collexc"][mgi, nlines_k - 1]
            cool_ion = tables["kp_w_collion"][mgi, ncont_k - 1]
        # second half of the resonance-trap guard (see phase A2b): a
        # packet that burned its macro-atom jump budget must not be
        # pumped back into the trap by collisional excitation, so its
        # cooling channel is drawn from the radiative channels only
        # (ff/fb) — the LTE source-function limit for a
        # thermalisation-dominated region. Fresh k-packets are
        # unaffected (the counter is reset on every radiative event).
        kp_capped = pk.nscatterings >= 16
        cool_exc_s = jnp.where(kp_capped, 0.0, cool_exc)
        cool_ion_s = jnp.where(kp_capped, 0.0, cool_ion)
        cool_tot = cool_ff + cool_fb + cool_exc_s + cool_ion_s
        m_kcool = (m_kpkt_all & (ptype_now == TYPE_KPKT) & in_det_cell
                   & (cool_tot > 0))
        m_kbb = m_kpkt_all & ~m_kcool

        # cooling channel sampling (do_kpkt, kpkt.cc:518-851)
        ch = u[:, 3] * cool_tot
        k_ff = m_kcool & (ch < cool_ff)
        k_fb = m_kcool & ~k_ff & (ch < cool_ff + cool_fb)
        k_exc = m_kcool & ~k_ff & ~k_fb & (ch < cool_ff + cool_fb
                                           + cool_exc_s)
        k_ion = m_kcool & ~k_ff & ~k_fb & ~k_exc

        def ksel(table, width, mask_u):
            target_k = jnp.clip(u[:, 12], 0.0, 1.0) * (
                table[mgi, width - 1])

            def kbs_body(_, lohi):
                lo_i, hi_i = lohi
                mid = (lo_i + hi_i) // 2
                below = table[mgi, jnp.clip(mid, 0, width - 1)] \
                    < target_k
                return (jnp.where(below, mid + 1, lo_i),
                        jnp.where(below, hi_i, mid))

            klo, _ = jax.lax.fori_loop(
                0, _nbits(width), kbs_body,
                (jnp.zeros_like(pk.cell),
                 jnp.full_like(pk.cell, width - 1)))
            return jnp.clip(klo, 0, width - 1)

        # ff emission: nu ~ exp(-h nu / k Te) (kpkt.cc:602-607)
        nu_ff = jnp.maximum(-jnp.float32(KB / H) * Te
                            * jnp.log(uniform_pos(u[:, 6])), 1e11)
        upd(k_ff, ptype=TYPE_RPKT, nu_cmf=nu_ff, nu_rf=nu_ff / dopp_k,
            e_rf=new["e_cmf"] / dopp_k, dirvec=dir_k,
            last_cross=geo.BOUNDARY_NONE, em_time=t_k,
        em_pos=pk.pos,
            nscatterings=jnp.int32(0), next_trans=jnp.int32(-1),
            stokes_q=jnp.float32(0.0), stokes_u=jnp.float32(0.0),
            emissiontype=jnp.int32(EMTYPE_FREEFREE))

        # channel-target selection: the three cumulative tables
        # (collexc over lines, fb + collion over continua) are merged
        # into one 3-group pack so every k-packet pays ONE cdf_search
        # + two constant-row gathers — behind a lax.cond that skips
        # the block entirely on iterations without eligible k-packets
        if "kp_sel_blk" in tables:
            kblk = tables["kp_sel_blk"]
            kend = tables.get("kp_sel_end")
            Kmax_kp = (kblk.shape[1] // 3 * ROWW
                       if kend is not None else kblk.shape[2])

            def kp_compute(_):
                g3 = jnp.where(k_fb, 1,
                               jnp.where(k_ion, 2, 0)).astype(jnp.int32)
                tot3 = jnp.where(k_fb, cool_fb,
                                 jnp.where(k_ion, cool_ion, cool_exc))
                target3 = jnp.clip(u[:, 12], 0.0, 1.0) * tot3
                ksel_i = cdf_search(kblk, kend, mgi, g3, target3,
                                    G=3, K=Kmax_kp)
                ln = params.ln_pack[
                    jnp.clip(ksel_i, 0, params.ln_pack.shape[0] - 1)]
                cont_idx = jnp.clip(ksel_i, 0,
                                    params.cn_pack.shape[0] - 1)
                cn = params.cn_pack[cont_idx]
                exc_upper = ln[:, 2].astype(jnp.int32)
                ci_upper = cn[:, 2].astype(jnp.int32)
                if "recomb_cum" in tables:
                    nu_fb_i = sample_recomb_nu_table(
                        cont_idx, mgi, u[:, 6], params,
                        tables["recomb_cum"], nu_edge=cn[:, 0])
                else:
                    nu_fb_i = sample_recomb_nu(cont_idx, Te, u[:, 6],
                                               params)
                return cont_idx, exc_upper, ci_upper, nu_fb_i

            def kp_skip(_):
                zi = jnp.zeros_like(pk.cell)
                return zi, zi, zi, jnp.ones_like(pk.e_cmf)

            k_fb_cont, exc_upper_t, ci_upper_t, nu_fb = jax.lax.cond(
                jnp.any(k_fb | k_exc | k_ion), kp_compute, kp_skip, 0)
        else:
            # fb emission: select the continuum, sample nu from its
            # recombination emissivity (kpkt.cc:612-695)
            k_fb_cont = jnp.clip(
                ksel(tables["kp_w_fb"], ncont_k, k_fb), 0,
                params.cont_nu_edge.shape[0] - 1)
            if "recomb_cum" in tables:
                nu_fb = sample_recomb_nu_table(k_fb_cont, mgi,
                                               u[:, 6], params,
                                               tables["recomb_cum"])
            else:
                nu_fb = sample_recomb_nu(k_fb_cont, Te, u[:, 6],
                                         params)
            k_sel = jnp.clip(
                ksel(tables["kp_w_collexc"], nlines_k, k_exc),
                0, params.line_upper.shape[0] - 1)
            exc_upper_t = params.line_upper[k_sel]
            k_ion_cont = jnp.clip(
                ksel(tables["kp_w_collion"], ncont_k, k_ion), 0,
                params.cont_upperlevel.shape[0] - 1)
            ci_upper_t = params.cont_upperlevel[k_ion_cont]

        upd(k_fb, ptype=TYPE_RPKT, nu_cmf=nu_fb, nu_rf=nu_fb / dopp_k,
            e_rf=new["e_cmf"] / dopp_k, dirvec=dir_k,
            last_cross=geo.BOUNDARY_NONE, em_time=t_k,
        em_pos=pk.pos,
            nscatterings=jnp.int32(0), next_trans=jnp.int32(-1),
            stokes_q=jnp.float32(0.0), stokes_u=jnp.float32(0.0),
            emissiontype=-1 - k_fb_cont)

        # collisional excitation: line -> macro-atom upper level
        # (kpkt.cc:696-760)
        upd(k_exc, ptype=TYPE_MA, ma_level=exc_upper_t,
            next_trans=jnp.int32(-1))
        if "ion_stats" in est:
            # ENERGYIN_COLLEXC(24), ENERGYIN_TOTAL(28)
            ion_ke = _lvl_ion(exc_upper_t)
            w_ke = jnp.where(k_exc, new["e_cmf"], 0.0)
            for col in (24, 28):
                est_ion = est_ion.at[mgi, ion_ke, col].add(w_ke)

        # collisional ionisation: continuum -> macro-atom in the upper
        # ion target level (kpkt.cc:762-820)
        upd(k_ion, ptype=TYPE_MA, ma_level=ci_upper_t,
            next_trans=jnp.int32(-1))
        cnt["k_to_r_ff"] += mcount(k_ff)
        cnt["k_to_r_fb"] += mcount(k_fb)
        cnt["ma_act_collexc"] += mcount(k_exc)
        cnt["ma_act_collion"] += mcount(k_ion)
        if "ion_stats" in est:
            # ENERGYIN_COLLION(25), ENERGYIN_TOTAL(28)
            ion_ki = _lvl_ion(ci_upper_t)
            w_ki = jnp.where(k_ion, new["e_cmf"], 0.0)
            for col in (25, 28):
                est_ion = est_ion.at[mgi, ion_ki, col].add(w_ki)
    else:
        m_kbb = m_kpkt_all

    if has_cp:
        p_clo = cp[:, CP_PLANCK_CLO]
        p_chi = cp[:, CP_PLANCK_CHI]
    else:
        xs_p, cdf_p = params.planck_x, params.planck_cdf
        Tsafe_p = jnp.maximum(Te, 1.0)
        p_clo = interp_cmp(H * params.nu_min_r / (KB * Tsafe_p),
                           xs_p, cdf_p)
        p_chi = interp_cmp(H * params.nu_max_r / (KB * Tsafe_p),
                           xs_p, cdf_p)
    nu_pl = sample_planck_nu_cp(u[:, 3], Te, p_clo, p_chi, params)
    cnt["k_to_r_bb"] += mcount(m_kbb)
    upd(m_kbb, ptype=TYPE_RPKT, nu_cmf=nu_pl, nu_rf=nu_pl / dopp_k,
        e_rf=new["e_cmf"] / dopp_k, dirvec=dir_k,
        last_cross=geo.BOUNDARY_NONE, em_time=t_k,
        em_pos=pk.pos,
        nscatterings=jnp.int32(0), next_trans=jnp.int32(-1),
        stokes_q=jnp.float32(0.0), stokes_u=jnp.float32(0.0),
        emissiontype=jnp.int32(EMTYPE_FREEFREE))
    m_kpkt = m_kpkt_all
    cnt["interactions"] += mcount(m_kpkt)

    # =====================================================================
    # phase B: gamma and r-packet transport (one event)
    # Only packets that were already GAMMA/RPKT at the start of the
    # iteration move in this iteration (fresh conversions move next
    # iteration, matching the reference's re-dispatch).
    # =====================================================================
    m_gam = active & (pk.ptype == TYPE_GAMMA)
    m_rpkt = active & (pk.ptype == TYPE_RPKT)
    m_move = m_gam | m_rpkt

    pos_b = pk.pos
    t_b = pk.prop_time
    dir_b = pk.dirvec

    tau_next = -jnp.log(uniform_pos(u[:, 6]))

    # boundary distance
    if grid_type == "spherical":
        sdist, snext, lc_new = geo.boundary_cross_spherical(
            pos_b, dir_b, t_b, pk.cell, pk.last_cross,
            tables["cell_mgi"].shape[0], tables["pos_min"][:, 0],
            tables["wid"],
            rmin_pre=cp[:, CP_POSMIN_X] if has_cp else None,
            wid_pre=cp[:, CP_WID] if has_cp else None)
    else:
        sdist, snext, lc_new = geo.boundary_cross_uniform(
            pos_b, dir_b, t_b, pk.cell, pk.last_cross,
            ncoord, tables["pos_min"], tables["wid"],
            cmin_pre=(cp[:, CP_POSMIN_X:CP_POSMIN_X + 3]
                      if has_cp else None),
            wid_pre=cp[:, CP_WID] if has_cp else None)

    clamped = sdist > params.max_path_step
    sdist = jnp.where(clamped, params.max_path_step, sdist)
    snext = jnp.where(clamped, pk.cell, snext)

    dopp_here = geo.doppler_packet(pos_b, dir_b, t_b, relativistic)

    # interaction coefficients per sim length (rest frame)
    rho = cell_scalar("rho", CP_RHO)
    ffe = cell_scalar("ffegrp", CP_FFE)
    x_unit = params.x_unit
    # gamma (do_gamma, gammapkt.cc:576-600)
    kap_compton = jnp.where(
        params.gamma_grey < 0,
        sigma_compton_total(pk.nu_cmf)
        * cell_scalar("nnetot_sig", CP_NNETOT_SIG)
        / SIGMA_T, 0.0) * dopp_here
    kap_pe = sigma_photoelectric_cgs(pk.nu_cmf, rho, ffe,
                                     params.gamma_grey) * x_unit * dopp_here
    kap_pp = sigma_pairprod_cgs(pk.nu_cmf, rho, ffe,
                                params.gamma_grey) * x_unit * dopp_here
    kap_gamma_tot = kap_compton + kap_pe + kap_pp

    # r-packet grey opacity (do_rpkt_step, rpkt.cc:704-727): empty cells
    # free-stream; thick/grey cells scatter with kappa_grey * rho
    chi_rpkt = cell_scalar("chi_grey", CP_CHI_GREY) * dopp_here
    is_empty = mgi >= nmodel

    kap_tot = jnp.where(m_gam, kap_gamma_tot, chi_rpkt)
    kap_tot = jnp.where(is_empty, 0.0, kap_tot)
    edist = jnp.where(kap_tot > 0, tau_next / jnp.maximum(kap_tot, 1e-30),
                      BIG)
    tdist = jnp.maximum(t2 - t_b, 0.0)

    if detailed:
        # ---- full frequency-dependent r-packet transport:
        # the Sobolev line walk (get_event, rpkt.cc:67-328) as a
        # bounded vectorised loop over up to LWALK lines per kernel
        # iteration, accumulating continuum + line optical depth
        # against one exponential budget — the exact reference
        # algorithm, batched.
        is_thick_c = cell_scalar("thick", CP_THICK) == 1
        m_det = m_rpkt & ~is_empty & ~is_thick_c
        nlines = params.line_nu.shape[0]
        LWALK = 24

        # next candidate line (closest_transition, rpkt.cc:26-65):
        # trust the stored index; re-sync by binary search when flagged
        # first line with nu < nu_cmf in the descending-nu line list
        if "lw_nu_blk" in tables and not relativistic:
            # two-level search over the shared 128-wide nu blocks:
            # the block whose end first drops below nu_cmf, then a
            # compare-count within that one row-gathered block
            LWNU_s = tables["lw_nu_blk"]  # [nb, 128]
            nb_s = LWNU_s.shape[0]
            ends_s = LWNU_s[:, ROWW - 1]  # [nb] descending
            b_s = jnp.sum((ends_s[None, :] > pk.nu_cmf[:, None])
                          .astype(jnp.int32), axis=1)
            b_s = jnp.clip(b_s, 0, nb_s - 1)
            row_s = LWNU_s[b_s]  # [N, 128] row-gather
            j_sync = jnp.minimum(
                b_s * ROWW + jnp.sum(
                    (row_s > pk.nu_cmf[:, None]).astype(jnp.int32),
                    axis=1), nlines)
        else:
            j_sync = bisect_count_gt_desc(params.line_nu, pk.nu_cmf,
                                          nlines)
        j0 = jnp.where(pk.next_trans >= 0, pk.next_trans, j_sync)

        # continuum opacity: Thomson + free-free (calculate_kappa_ff,
        # rpkt.cc:1027-1073); kff_base has the nu^-3 scale folded in
        Te_b = jnp.maximum(cell_scalar("Te", CP_TE), 1.0)
        nu15 = jnp.maximum(pk.nu_cmf, 1e12) / 1e15
        kff = cell_scalar("kff_base", CP_KFF) \
            * jnp.power(nu15, -3.0) \
            * (-jnp.expm1(-jnp.float32(H / KB) * pk.nu_cmf / Te_b))
        chi_th = cell_scalar("chi_thomson", CP_CHI_TH)
        # bound-free opacity from the per-cell frequency-binned table
        # (replaces calculate_kappa_bf_gammacontr, rpkt.cc:1075-1207)
        nbf_bins = tables["chi_bf"].shape[1]
        bfbin = ((jnp.log(jnp.maximum(pk.nu_cmf, 1.0))
                  - params.bf_lognu_min)
                 / params.bf_dlognu).astype(jnp.int32)
        chi_bf_v = jnp.where(
            (bfbin >= 0) & (bfbin < nbf_bins),
            bin_fetch(tables["chi_bf"], mgi,
                      jnp.clip(bfbin, 0, nbf_bins - 1)), 0.0)
        chi_cont = jnp.maximum((chi_th + kff + chi_bf_v) * dopp_here,
                               1e-30)

        dist_limit = jnp.minimum(sdist, tdist)
        WK_WALKING, WK_CONT, WK_BB, WK_LIMIT = 0, 1, 2, 3
        use_cum_walk = ("lw_D_blk" in tables) and not relativistic

        def walk_body(_, st):
            jw, ldist_prev, tau_acc, kind, ev_dist, ev_line = st
            walking = kind == WK_WALKING
            jc = jnp.clip(jw, 0, nlines - 1)
            nu_t = params.line_nu[jc]
            have_line = jw < nlines
            if relativistic:
                # exact SR resonance distance (closed form; c == 1 and
                # v = r/t): with k = nu_line/nu_rf and mu r = dir.pos,
                #   s = ((t - mu r)^2 / k^2 - (t^2 - r^2)) / (2(t-mu r))
                # (replaces the reference's iterative tardis formula,
                # rpkt.cc:123-136)
                k_ratio = nu_t / jnp.maximum(pk.nu_rf, 1.0)
                mu_r = geo.dot3(dir_b, pos_b)
                r2 = geo.dot3(pos_b, pos_b)
                tmr = jnp.maximum(t_b - mu_r, 1e-12)
                ldist_raw = (tmr**2 / jnp.maximum(k_ratio, 1e-12) ** 2
                             - (t_b**2 - r2)) / (2.0 * tmr)
            else:
                ldist_raw = t_b * (pk.nu_cmf / jnp.maximum(nu_t, 1.0)
                                   - 1.0)
            ldist_j = jnp.where(have_line, jnp.maximum(ldist_raw, 0.0),
                                BIG)
            ldist_j = jnp.maximum(ldist_j, ldist_prev)

            # continuum event before the line / the limit?
            d_cont = ldist_prev + (tau_next - tau_acc) / chi_cont
            cont_ev = walking & (d_cont < jnp.minimum(ldist_j,
                                                      dist_limit))
            # boundary/timestep reached before the line?
            lim_ev = walking & ~cont_ev & (ldist_j > dist_limit)
            # otherwise the line is reached: Sobolev tau decides
            reach = walking & ~cont_ev & ~lim_ev & have_line
            n_l = tables["levelpops"][mgi, params.line_lower[jc]]
            n_u = tables["levelpops"][mgi, params.line_upper[jc]]
            tau_l = jnp.maximum(
                params.line_taufac_lu[jc] * n_l
                - params.line_taufac_ul[jc] * n_u, 0.0) \
                * (t_b + ldist_prev)
            tau_acc2 = tau_acc + chi_cont * (ldist_j - ldist_prev)
            bb = reach & (tau_acc2 + tau_l >= tau_next)
            passed = reach & ~bb

            kind = jnp.where(cont_ev, WK_CONT,
                             jnp.where(lim_ev, WK_LIMIT,
                                       jnp.where(bb, WK_BB, kind)))
            ev_dist = jnp.where(cont_ev, d_cont,
                                jnp.where(bb, ldist_j, ev_dist))
            ev_line = jnp.where(bb, jc, ev_line)
            jw = jnp.where(passed | bb, jw + 1, jw)
            tau_acc = jnp.where(passed, tau_acc2 + tau_l, tau_acc)
            ldist_prev = jnp.where(passed, ldist_j, ldist_prev)
            return (jw, ldist_prev, tau_acc, kind, ev_dist, ev_line)

        if use_cum_walk:
            # ---- analytic Sobolev walk: resolve the WHOLE inter-event
            # line walk with a two-level block search over the per-cell
            # cumulative line optical depth. Key identity
            # (non-relativistic homologous flow): the resonance time
            # factor is exactly t(s_k) = t_b * nu_cmf / nu_k, so the
            # accumulated Sobolev depth of lines (j0..j) is
            # t_nu * (D[j] - D[j0]) with the per-timestep table
            # D[cell, j] = cumsum of tau_base[cell, k] / nu_k over the
            # frequency-sorted list. P(j) = chi_cont*ldist(j) +
            # t_nu*D(j) is monotone in j, so the event block is the
            # first block whose END crosses the budget, then one
            # in-register pass over the 128-line block pins the line.
            # Everything is laid out in 128-wide rows because on TPU a
            # whole-row gather costs the same as one scalar gather:
            # the complete walk costs ~6 row-gathers, one iteration
            # per physical event, at ANY linelist length. Physics
            # identical to get_event (rpkt.cc:67-328).
            LWD = tables["lw_D_blk"]      # [nm1, nb, 128] hi part
            LWDl = tables["lw_D_lo_blk"]  # [nm1, nb, 128] lo part
            LWT = tables["lw_tau_blk"]    # [nm1, nb, 128]
            LWNU = tables["lw_nu_blk"]    # [nb, 128] shared
            D_ends = tables["lw_D_end"]   # [nm1, nb]
            Dl_ends = tables["lw_D_lo_end"]
            T_ends = tables["lw_tau_end"]
            nm1_w = LWD.shape[0]
            nbw = LWNU.shape[0]
            LWD2 = LWD.reshape(nm1_w * nbw, ROWW)
            LWDl2 = LWDl.reshape(nm1_w * nbw, ROWW)
            LWT2 = LWT.reshape(nm1_w * nbw, ROWW)
            t_nu = t_b * pk.nu_cmf
            j0c = jnp.clip(j0, 0, nlines)
            iota = jnp.arange(ROWW, dtype=jnp.int32)

            def ld_of_nu(nu_j):
                nu_c, tb = pk.nu_cmf, t_b
                if nu_j.ndim == 2:
                    nu_c, tb = nu_c[:, None], tb[:, None]
                ld = tb * (nu_c / jnp.maximum(nu_j, 1.0) - 1.0)
                return jnp.maximum(ld, 0.0)

            # D0 = D at the walk start (one row-gather + extract).
            # ALL comparisons below use double-single DIFFERENCES
            # (hi2-hi1) + (lo2-lo1) vs D0: the absolute D spans ~1e14
            # in relative magnitude on production linelists, so plain
            # f32 sums lose the entire weak-line forest (see
            # driver._build_line_walk_blocks)
            b0 = j0c // ROWW
            row0 = mgi * nbw + b0
            D0 = onehot_extract(LWD2[row0], j0c % ROWW)
            D0l = onehot_extract(LWDl2[row0], j0c % ROWW)

            # level 1: first block (>= b0) whose end crosses
            nu_ends = LWNU[:, ROWW - 1]            # [nb] shared
            d_end_rows = D_ends[mgi]               # [N, nb] row-gather
            dl_end_rows = Dl_ends[mgi]
            t_end_rows = T_ends[mgi]               # [N, nb]
            iota_b = jnp.arange(nbw, dtype=jnp.int32)
            ld_ends = jnp.maximum(
                t_b[:, None] * (pk.nu_cmf[:, None]
                                / jnp.maximum(nu_ends, 1.0)[None, :]
                                - 1.0), 0.0)
            end_is_pad = (iota_b * ROWW + ROWW - 1) >= nlines
            ld_ends = jnp.where(end_is_pad[None, :], BIG, ld_ends)
            dD_ends = ((d_end_rows - D0[:, None])
                       + (dl_end_rows - D0l[:, None]))
            P_ends = chi_cont[:, None] * ld_ends \
                + t_nu[:, None] * dD_ends
            ok_b = ((iota_b[None, :] >= b0[:, None])
                    & (P_ends >= tau_next[:, None]))
            b_ev = jnp.argmax(ok_b, axis=1).astype(jnp.int32)

            # level 2: pin the crossing inside the block
            row_ev = mgi * nbw + b_ev
            rowD = LWD2[row_ev]
            rowDl = LWDl2[row_ev]
            rowT = LWT2[row_ev]
            rowNU = LWNU[b_ev]
            pos = b_ev[:, None] * ROWW + iota[None, :]
            ld_blk = jnp.where(pos >= nlines, BIG, ld_of_nu(rowNU))
            dD_blk = ((rowD - D0[:, None]) + (rowDl - D0l[:, None]))
            P_blk = chi_cont[:, None] * ld_blk + t_nu[:, None] * dD_blk
            ok_j = ((pos >= j0c[:, None])
                    & (P_blk >= tau_next[:, None]))
            off = jnp.argmax(ok_j, axis=1).astype(jnp.int32)
            jc_e = jnp.minimum(b_ev * ROWW + off, nlines)

            has_prev = jc_e > j0c
            # previous line: same block (off > 0) or the end of the
            # previous block — both available in registers
            in_blk = off > 0
            offp = jnp.maximum(off - 1, 0)
            bp = jnp.maximum(b_ev - 1, 0)
            dD_prev = jnp.where(
                in_blk,
                onehot_extract(rowD, offp) - D0
                + (onehot_extract(rowDl, offp) - D0l),
                onehot_extract(d_end_rows, bp) - D0
                + (onehot_extract(dl_end_rows, bp) - D0l))
            tau_b_prev = jnp.where(in_blk, onehot_extract(rowT, offp),
                                   onehot_extract(t_end_rows, bp))
            nu_prev_r = jnp.where(
                in_blk, onehot_extract(rowNU, offp),
                small_select(bp, nu_ends)[0])
            nu_prev = jnp.maximum(nu_prev_r, 1.0)
            jprev = jnp.clip(jc_e - 1, 0, nlines - 1)
            tau_prev = tau_b_prev * t_nu / nu_prev

            def ldist_of(j):
                # only used at jprev below (register values)
                return jnp.where(j >= nlines, BIG, ld_of_nu(nu_prev))

            A_prev = (chi_cont * ld_of_nu(nu_prev)
                      + t_nu * dD_prev)
            # continuum crossing within the stretch before line jc, or
            # Sobolev absorption AT line jc-1 (the budget is exhausted
            # inside that line's depth)
            bb = has_prev & (A_prev + tau_prev >= tau_next)
            s_bb = ldist_of(jprev)
            tau_after = jnp.where(has_prev, A_prev + tau_prev, 0.0)
            s_start = jnp.where(has_prev, s_bb, 0.0)
            s_cont = s_start + (tau_next - tau_after) / chi_cont
            ev_dist_c = jnp.where(bb, s_bb, jnp.maximum(s_cont, 0.0))
            hit = ev_dist_c <= dist_limit
            # boundary/time lanes re-sync the line index from nu_cmf
            # on their next iteration (closest_transition semantics,
            # rpkt.cc:26-65) instead of paying a second search here
            walk_kind = jnp.where(hit & bb, WK_BB,
                                  jnp.where(hit, WK_CONT, WK_LIMIT))
            walk_line = jprev
            j_new = jnp.where(hit, jc_e, -1)
            kexh = jnp.zeros_like(m_det)
            edist_det = jnp.where(hit, ev_dist_c, BIG)
        else:
            zf = jnp.zeros_like(t_b)
            walk = jax.lax.fori_loop(
                0, LWALK, walk_body,
                (j0, zf, zf, jnp.zeros_like(pk.cell), zf + BIG, j0))
            j_new, walk_ldist, _, walk_kind, walk_dist, walk_line = walk

            # WALKING after LWALK lines: plain move to the last passed
            # line
            kexh = walk_kind == WK_WALKING
            edist_det = jnp.where(kexh, jnp.maximum(walk_ldist, 1e-7),
                                  jnp.where(walk_kind == WK_LIMIT, BIG,
                                            walk_dist))
        edist = jnp.where(m_det, edist_det, edist)
    else:
        m_det = jnp.zeros_like(m_rpkt)

    take_boundary = m_move & (sdist <= jnp.minimum(edist, tdist))
    take_event = m_move & ~take_boundary & (edist <= tdist)
    take_time = m_move & ~take_boundary & ~take_event

    dist = jnp.where(take_boundary, sdist,
                     jnp.where(take_event, edist, tdist))

    if detailed and "jb_diff" in est and not relativistic:
        # per-line Jb_lu estimators (update_lineestimator,
        # rpkt.cc:205-270 + radfield.cc:878): every line crossed on
        # this move contributes t_res * c * e_cmf(res) / nu_line,
        # which in homologous flow is the per-packet constant
        # t_b * e_cmf0 times the per-line 1/nu_line (applied by the
        # driver). The crossed lines are the contiguous index range
        # [j0, j_end): j_end = lines redshifted past during `dist`,
        # plus the activating line itself on a bound-bound event.
        nu_q = pk.nu_cmf * t_b / jnp.maximum(t_b + dist, 1e-30)
        j_lim = bisect_count_gt_desc(params.line_nu, nu_q,
                                     params.line_nu.shape[0])
        j_end = jnp.maximum(j0, j_lim) \
            + (take_event & (walk_kind == WK_BB)).astype(jnp.int32)
        selj = tables["jb_sel"]  # [S] ascending kernel line indices
        lo_s = jnp.sum(selj[None, :] < j0[:, None], axis=1)
        hi_s = jnp.sum(selj[None, :] < j_end[:, None], axis=1)
        w_jb = jnp.where(m_det, t_b * pk.e_cmf, 0.0)
        nsel1 = est["jb_diff"].shape[1]
        lo_s = jnp.clip(lo_s, 0, nsel1 - 1)
        hi_s = jnp.clip(hi_s, 0, nsel1 - 1)
        cnt_w = jnp.where(m_det, (hi_s > lo_s).astype(jnp.int32), 0)
        est["jb_diff"] = est["jb_diff"].at[mgi, lo_s].add(w_jb) \
            .at[mgi, hi_s].add(-w_jb)
        est["jb_cnt"] = est["jb_cnt"].at[mgi, lo_s].add(cnt_w) \
            .at[mgi, hi_s].add(-cnt_w)

    # estimators use midpoint cmf values (do_rpkt_step moves in halves
    # around update_estimators, rpkt.cc:737-742)
    pos_mid = pos_b + dir_b * (0.5 * dist)[:, None]
    t_mid = t_b + 0.5 * dist
    dopp_mid = geo.doppler_packet(pos_mid, dir_b, t_mid, relativistic)
    e_cmf_mid = pk.e_rf * dopp_mid
    nu_cmf_mid = pk.nu_rf * dopp_mid
    contrib_mask = m_rpkt & ~is_empty
    dJ = jnp.where(contrib_mask, dist * e_cmf_mid, 0.0)

    if "compton_emiss" in est:
        # Compton emissivity toward syn_dir (compton_emiss_cont,
        # emissivities.cc:14-110), with the cell's nne folded in at
        # accumulation time instead of at normalisation
        syn_b = jnp.broadcast_to(params.syn_dir, pos_mid.shape)
        vel_mid = geo.flow_velocity(pos_mid, t_mid)
        cmf_dir = geo.normalize3(geo.angle_ab(dir_b, vel_mid))
        cmf_syn = geo.normalize3(geo.angle_ab(syn_b, vel_mid))
        mu_cmf = jnp.clip(geo.dot3(cmf_dir, cmf_syn), -1.0, 1.0)
        f_c = 1.0 + (jnp.float32(H / (ME * CLIGHT**2)) * nu_cmf_mid
                     * (1.0 - mu_cmf))
        dsig = (jnp.float32(0.0596831 * SIGMA_T) / (f_c * f_c)
                * (f_c + 1.0 / f_c + mu_cmf * mu_cmf - 1.0))
        nne_len = (cell_scalar("nnetot_sig", CP_NNETOT_SIG)
                   / jnp.float32(SIGMA_T))
        emiss_c = (pk.e_rf * dsig * dist * dopp_mid * dopp_mid / f_c
                   * nne_len)
        freq_out = nu_cmf_mid / f_c
        nsynb = est["compton_emiss"].shape[1]
        ibin_s = ((jnp.log(jnp.maximum(freq_out, 1.0))
                   - params.syn_lognu_min)
                  / params.syn_dlognu).astype(jnp.int32)
        contrib_gam = m_gam & (mgi < nmodel)
        ok_s = contrib_gam & (ibin_s >= 0) & (ibin_s < nsynb)
        est_out_ce = est["compton_emiss"].at[
            mgi, jnp.clip(ibin_s, 0, nsynb - 1)].add(
            jnp.where(ok_s, emiss_c, 0.0))
        # pair-production 511 keV emissivity (pp_emiss_cont,
        # emissivities.cc:112-137; 2.46636e20 Hz = 2 m_e c^2 / h)
        emiss_pp = (kap_pp * (jnp.float32(2.46636e20)
                              / jnp.maximum(nu_cmf_mid, 1e10))
                    * pk.e_rf * dist)
        est_out_pp = est["pp_emiss"].at[mgi].add(
            jnp.where(contrib_gam, emiss_pp, 0.0))
    if detailed:
        # free-free heating estimator: distance * e_cmf * kappa_ff
        # (update_estimators, rpkt.cc:578-582)
        ffheat_contrib = jnp.where(m_det, dJ * kff, 0.0)
    else:
        ffheat_contrib = jnp.float32(0.0) * dJ

    # full move
    pos_n, t_n, nu_cmf_n, e_cmf_n, dopp_n = _move(
        pos_b, dir_b, dist, t_b, pk.nu_rf, pk.e_rf, pk.nu_cmf,
        relativistic)
    upd(m_move, pos=pos_n, prop_time=t_n, nu_cmf=nu_cmf_n, e_cmf=e_cmf_n)

    # ---- boundary branch
    esc = take_boundary & (snext == -99)
    cross = take_boundary & (snext != -99) & (snext != pk.cell)
    upd(cross, cell=snext, last_cross=lc_new)
    upd(take_boundary & ~esc & (snext == pk.cell), last_cross=lc_new)
    upd(esc, ptype=TYPE_ESCAPE, escape_type=pk.ptype, escape_time=t_n)
    cnt["cellcrossings"] += mcount(cross)
    cnt["nesc"] += mcount(esc)
    scal["cmf_lum"] += msum(esc & m_rpkt, e_cmf_n)

    # ---- time branch: clamp clock exactly to t2
    upd(take_time, prop_time=t2)

    # ---- event branch
    # gamma events (do_gamma, gammapkt.cc:650-695)
    ev_gam = take_event & m_gam
    zev = u[:, 7] * kap_gamma_tot
    ev_compton = ev_gam & (zev < kap_compton)
    ev_pe = ev_gam & ~ev_compton & (zev < kap_compton + kap_pe)
    ev_pp = ev_gam & ~ev_compton & ~ev_pe

    # Compton scattering (compton_scatter, gammapkt.cc:421-531)
    xx = H * nu_cmf_n / MEC2
    f = compton_choose_f(jnp.maximum(xx, 1e-4), u[:, 8])
    f = jnp.where(xx < 1e-2, 1.0, f)
    prob_gamma = 1.0 / f
    stay_gamma = (xx < 1e-2) | (u[:, 9] < prob_gamma)

    m_stay = ev_compton & stay_gamma
    nu_cmf_sc = nu_cmf_n / f
    vel = geo.flow_velocity(pos_n, t_n)
    cmf_dir = geo.angle_ab(dir_b, vel)
    cos_theta = jnp.where(xx < 1e-2, thomson_angle(u[:, 0]),
                          1.0 - (f - 1.0) / jnp.maximum(xx, 1e-10))
    new_dir_cmf = geo.scatter_dir(cmf_dir, jnp.clip(cos_theta, -1.0, 1.0),
                                  u[:, 1])
    final_dir = geo.normalize3(geo.angle_ab(new_dir_cmf, -vel))
    dopp_sc = geo.doppler_nucmf_on_nurf(final_dir, vel, relativistic)
    upd(m_stay, nu_cmf=nu_cmf_sc, dirvec=final_dir,
        nu_rf=nu_cmf_sc / dopp_sc, e_rf=e_cmf_n / dopp_sc,
        last_cross=geo.BOUNDARY_NONE)

    m_elec = ev_compton & ~stay_gamma
    upd(m_elec, ptype=TYPE_NTLEPTON, absorptiontype=jnp.int32(-3))

    # photoelectric -> non-thermal lepton (gammapkt.cc:670-680)
    upd(ev_pe, ptype=TYPE_NTLEPTON, absorptiontype=jnp.int32(-4))

    # pair production (pair_prod, photo_electric.cc:116-166)
    prob_gamma_pp = 1.022 * MEV / (H * jnp.maximum(nu_cmf_n, 1.0))
    pp_gamma = ev_pp & (u[:, 8] <= prob_gamma_pp)
    pp_lepton = ev_pp & ~pp_gamma
    upd(pp_lepton, ptype=TYPE_NTLEPTON, absorptiontype=jnp.int32(-5))
    nu_511 = jnp.float32(0.511 * MEV / H)
    dir_pp, dopp_pp = _emit_isotropic(pos_n, t_n, u[:, 9], u[:, 0],
                                      relativistic)
    upd(pp_gamma, nu_cmf=nu_511, dirvec=dir_pp, nu_rf=nu_511 / dopp_pp,
        e_rf=e_cmf_n / dopp_pp, last_cross=geo.BOUNDARY_NONE)

    # gamma deposition accounting (do_packet, update_packets.cc:148-155)
    gam_deposited = m_gam & (new["ptype"] != TYPE_GAMMA) \
        & (new["ptype"] != TYPE_ESCAPE)
    cnt["nt_from_gamma"] += mcount(
        gam_deposited & (new["ptype"] == TYPE_NTLEPTON))
    scal["gamma_dep"] += msum(gam_deposited, e_cmf_n)
    dep_contrib = jnp.where(gam_deposited, e_cmf_n, 0.0) \
        + jnp.where(m_nt | (m_particle & is_bplus), pk.e_cmf, 0.0)

    # single fused scatter for all per-cell estimators: TPU scatters
    # cost ~1 ms each at megabatch size inside the event loop, so the
    # five estimator columns go through one scatter of [N, 5] rows
    cell_contrib = jnp.stack(
        [dJ, dJ * nu_cmf_mid, ffheat_contrib, colheat_contrib,
         dep_contrib], axis=1)
    cell_acc = jnp.zeros((est["J"].shape[0], 5), jnp.float32) \
        .at[mgi].add(cell_contrib)
    est_J = est["J"] + cell_acc[:, 0]
    est_nuJ = est["nuJ"] + cell_acc[:, 1]
    est_ffheat = est["ffheat"] + cell_acc[:, 2]
    est_colheat = est["colheat"] + cell_acc[:, 3]
    est_dep = est["dep_cell"] + cell_acc[:, 4]

    if "J_bin" in est:
        # binned radfield estimators (update_radfield_estimators,
        # radfield.cc:831-876): same path contribution, resolved on
        # the log-nu bin of the comoving frequency
        nbins_rf = est["J_bin"].shape[1]
        ibin = ((jnp.log(jnp.maximum(nu_cmf_mid, 1.0))
                 - params.rf_lognu_min)
                / params.rf_dlognu).astype(jnp.int32)
        valid_b = contrib_mask & (ibin >= 0) & (ibin < nbins_rf)
        flat_b = mgi * nbins_rf + jnp.clip(ibin, 0, nbins_rf - 1)
        bin_contrib = jnp.stack(
            [jnp.where(valid_b, dJ, 0.0),
             jnp.where(valid_b, dJ * nu_cmf_mid, 0.0)], axis=1)
        bin_acc = jnp.zeros((est["J_bin"].shape[0] * nbins_rf, 2),
                            jnp.float32).at[flat_b].add(bin_contrib)
        est_J_bin = est["J_bin"] + bin_acc[:, 0].reshape(
            est["J_bin"].shape)
        est_nuJ_bin = est["nuJ_bin"] + bin_acc[:, 1].reshape(
            est["nuJ_bin"].shape)

    if "J_bf_fine" in est and detailed:
        # sigma-free bf path integrand on the chi_bf log-nu grid (see
        # zero_estimators): one flat column scatter per iteration
        nbf_f = est["J_bf_fine"].shape[1]
        fb = ((jnp.log(jnp.maximum(nu_cmf_mid, 1.0))
               - params.bf_lognu_min)
              / params.bf_dlognu).astype(jnp.int32)
        ok_fb = m_det & (fb >= 0) & (fb < nbf_f)
        w_fb = jnp.where(ok_fb,
                         dist * e_cmf_mid
                         / jnp.maximum(nu_cmf_mid, 1.0) * dopp_mid,
                         0.0)
        flat_fb = mgi * nbf_f + jnp.clip(fb, 0, nbf_f - 1)
        est["J_bf_fine"] = (est["J_bf_fine"].reshape(-1)
                            .at[flat_fb].add(w_fb)
                            .reshape(est["J_bf_fine"].shape))

    if "bfrate" in est and detailed:
        # detailed per-continuum bf-rate estimators
        # (update_bfestimators, radfield.cc:764-828):
        #   bfrate[cell, cont] += sigma_cont(nu_cmf) * dist * e_cmf
        #                         / nu_cmf * dopp
        # with sigma from the tabulated cross sections (linear interp
        # on the shared x = nu/nu_edge grid,
        # photoionization_crosssection_fromtable); the stimulated-
        # recombination correction factor is ~1 for h nu >> k T_e
        # (UVOIR edges) and is omitted (SEPARATE_STIMRECOMB
        # convention, rpkt.cc:1129-1135)
        ncont_b = est["bfrate"].shape[1]
        NPx = params.cont_sigma.shape[1]
        nu_b = jnp.maximum(nu_cmf_mid, 1.0)[:, None]  # [N, 1]
        x_b = nu_b / params.cont_nu_edge[None, :ncont_b]  # [N, nc]
        fi = (x_b - 1.0) / params.cont_nuinc
        i0 = jnp.clip(fi.astype(jnp.int32), 0, NPx - 2)
        frac = jnp.clip(fi - i0.astype(jnp.float32), 0.0, 1.0)
        sig_flat = params.cont_sigma[:ncont_b].reshape(-1)
        base = (jnp.arange(ncont_b, dtype=jnp.int32) * NPx)[None, :]
        s0 = sig_flat[base + i0]
        s1 = sig_flat[base + i0 + 1]
        sig_b = s0 + frac * (s1 - s0)
        in_table = (x_b >= 1.0) & (fi <= jnp.float32(NPx - 1))
        w_bf = jnp.where(m_det,
                         dist * e_cmf_mid / jnp.maximum(nu_cmf_mid, 1.0)
                         * dopp_mid, 0.0)
        contr_bf = jnp.where(in_table, sig_b, 0.0) * w_bf[:, None]
        est_bfrate = est["bfrate"].at[mgi].add(contr_bf)

    # r-packet thick-cell scattering (rpkt_event_thickcell,
    # rpkt.cc:491-509): coherent isotropic re-emission
    ev_r = take_event & m_rpkt & ~m_det
    dir_r, dopp_r = _emit_isotropic(pos_n, t_n, u[:, 8], u[:, 9],
                                    relativistic)
    n_line_pass = jnp.int32(0)
    line_pass = jnp.zeros_like(m_rpkt)
    if detailed:
        # ---- detailed r-packet events (rpkt_event_continuum
        # rpkt.cc:330-447 + bound-bound rpkt_event_boundbound
        # rpkt.cc:449-489)
        ev_det = take_event & m_det
        ev_cont = ev_det & (walk_kind == WK_CONT)
        bb_hit = ev_det & (walk_kind == WK_BB)
        # walk exhausted its line budget: a plain move past the lines
        # already accounted, no interaction
        line_pass = ev_det & kexh

        # bound-bound absorption activates the macro-atom in the
        # line's upper level (rpkt_event_boundbound, rpkt.cc:449-489)
        wl_c = jnp.clip(walk_line, 0, nlines - 1)
        if params.ln_pack.shape[0] == nlines:
            bb_upper = params.ln_pack[wl_c][:, 2].astype(jnp.int32)
        else:
            bb_upper = params.line_upper[wl_c]
        upd(bb_hit, ptype=TYPE_MA, ma_level=bb_upper,
            next_trans=wl_c + 1, nscatterings=jnp.int32(0),
            absorptiontype=wl_c, absorption_nu=pk.nu_rf)
        cnt["ma_activations"] += mcount(bb_hit)
        if "line_ab" in est:
            est_line_ab = est_line_ab.at[wl_c].add(
                jnp.where(bb_hit, 1.0, 0.0))
        if "ion_stats" in est:
            # ION_BOUNDBOUND_MACROATOM(4), _ABSORBED(5),
            # ENERGYIN_RADEXC(22), ENERGYIN_TOTAL(28)
            ion_bb = _lvl_ion(bb_upper)
            w_bb = jnp.where(bb_hit, pk.e_cmf, 0.0)
            for col in (4, 5, 22, 28):
                est_ion = est_ion.at[mgi, ion_bb, col].add(w_bb)
        upd(line_pass, next_trans=j_new)

        # continuum event: electron scatter vs free-free vs bound-free
        # (rpkt_event_continuum, rpkt.cc:330-447)
        zc = u[:, 7] * chi_cont
        ev_escat = ev_cont & (zc < chi_th * dopp_here)
        ev_ff = ev_cont & ~ev_escat & (zc < (chi_th + kff) * dopp_here)
        ev_bf = ev_cont & ~ev_escat & ~ev_ff
        if polarization:
            # polarised dipole scattering with Stokes tracking
            # (escat_rpkt, polarization.cc:6-157)
            from .polarization import escat_stokes
            u_pol = packet_uniforms(base_key, pk.pkt_id, pk.rng_count,
                                    salt=7, n=36)
            dir_p, q_p, u_p, dopp_p = escat_stokes(
                dir_b, pk.stokes_q, pk.stokes_u, pos_n, t_n, u_pol,
                relativistic)
            upd(ev_escat, dirvec=dir_p, nu_rf=nu_cmf_n / dopp_p,
                e_rf=e_cmf_n / dopp_p, last_cross=geo.BOUNDARY_NONE,
                nscatterings=pk.nscatterings + 1, em_time=t_n,
                em_pos=pos_n,
                next_trans=j_new, stokes_q=q_p, stokes_u=u_p,
                absorptiontype=jnp.int32(ABSTYPE_ESCAT))
        else:
            upd(ev_escat, dirvec=dir_r, nu_rf=nu_cmf_n / dopp_r,
                e_rf=e_cmf_n / dopp_r, last_cross=geo.BOUNDARY_NONE,
                nscatterings=pk.nscatterings + 1, em_time=t_n,
                em_pos=pos_n,
                next_trans=j_new,
                absorptiontype=jnp.int32(ABSTYPE_ESCAT))
        upd(ev_ff, ptype=TYPE_KPKT, next_trans=jnp.int32(-1),
            nscatterings=jnp.int32(0),
            absorptiontype=jnp.int32(ABSTYPE_FREEFREE))
        cnt["escounter"] += mcount(ev_escat)
        cnt["k_from_ff"] += mcount(ev_ff)

        # bound-free absorption: select the continuum from the coarse
        # per-(cell, nu-bin) cumulative weights, then activate the
        # macro-atom in the upper ion with probability nu_edge/nu (the
        # rest of the photon energy is thermal: -> k-packet)
        # (rpkt.cc:398-447)
        nsel = tables["bf_sel_cum"].shape[1]
        ncont_b = tables["bf_sel_cum"].shape[2]
        selbin = jnp.clip(
            ((jnp.log(jnp.maximum(nu_cmf_n, 1.0)) - params.bf_lognu_min)
             / params.bf_dlognu_sel).astype(jnp.int32), 0, nsel - 1)
        nm1_bf = tables["bf_sel_cum"].shape[0]
        if params.cn_pack.shape[0] >= ncont_b:
            # packed: the per-(cell, nu-bin) cumulative row is one
            # row-gather (+cmp) when it fits 128 continua, and the
            # whole selection hides behind a lax.cond on any(ev_bf)
            def bf_compute(_):
                if ncont_b <= ROWW:
                    rows_bf = tables["bf_sel_cum"].reshape(
                        nm1_bf * nsel, ncont_b)[mgi * nsel + selbin]
                    tgt = (jnp.clip(u[:, 12], 0.0, 1.0)
                           * rows_bf[:, ncont_b - 1])[:, None]
                    bfi = jnp.clip(
                        jnp.sum((rows_bf < tgt).astype(jnp.int32),
                                axis=1), 0, ncont_b - 1)
                else:
                    nbb = -(-ncont_b // ROWW)
                    padded = jnp.pad(
                        tables["bf_sel_cum"],
                        ((0, 0), (0, 0), (0, nbb * ROWW - ncont_b)),
                        mode="edge")
                    endb = padded.reshape(
                        nm1_bf, nsel, nbb, ROWW)[..., -1]
                    ends_row = endb.reshape(
                        nm1_bf * nsel, nbb)[mgi * nsel + selbin]
                    bfi = cdf_search(
                        padded.reshape(nm1_bf, nsel * nbb, ROWW),
                        endb, mgi, selbin,
                        jnp.clip(u[:, 12], 0.0, 1.0)
                        * ends_row[:, nbb - 1],
                        G=nsel, K=nbb * ROWW)
                bfi = jnp.clip(bfi, 0, params.cn_pack.shape[0] - 1)
                cnb = params.cn_pack[bfi]
                return (bfi, cnb[:, 0],
                        cnb[:, 2].astype(jnp.int32))

            def bf_skip(_):
                zi = jnp.zeros_like(pk.cell)
                return zi, jnp.ones_like(pk.e_cmf), zi

            bf_cont, bf_nu_edge, bf_upper = jax.lax.cond(
                jnp.any(ev_bf), bf_compute, bf_skip, 0)
        else:
            row_tot = tables["bf_sel_cum"][mgi, selbin, ncont_b - 1]
            bf_target = jnp.clip(u[:, 12], 0.0, 1.0) * row_tot

            def bfs_body(_, lohi):
                lo_i, hi_i = lohi
                mid = (lo_i + hi_i) // 2
                below = tables["bf_sel_cum"][
                    mgi, selbin,
                    jnp.clip(mid, 0, ncont_b - 1)] < bf_target
                return (jnp.where(below, mid + 1, lo_i),
                        jnp.where(below, hi_i, mid))

            bflo, _ = jax.lax.fori_loop(
                0, _nbits(ncont_b), bfs_body,
                (jnp.zeros_like(pk.cell), jnp.full_like(pk.cell,
                                                        ncont_b - 1)))
            bf_cont = jnp.clip(bflo, 0,
                               params.cont_nu_edge.shape[0] - 1)
            bf_nu_edge = params.cont_nu_edge[bf_cont]
            bf_upper = params.cont_upperlevel[bf_cont]
        prob_ma_bf = bf_nu_edge / jnp.maximum(nu_cmf_n, 1.0)
        bf_to_ma = ev_bf & (u[:, 3] < prob_ma_bf)
        upd(bf_to_ma, ptype=TYPE_MA, ma_level=bf_upper,
            next_trans=jnp.int32(-1), nscatterings=jnp.int32(0))
        if "ion_stats" in est:
            # ION_PHOTOION(7), ENERGYIN_PHOTOION(23), ENERGYIN_TOTAL
            ion_bf = _lvl_ion(bf_upper)
            w_bf = jnp.where(bf_to_ma, pk.e_cmf, 0.0)
            for col in (7, 23, 28):
                est_ion = est_ion.at[mgi, ion_bf, col].add(w_bf)
        upd(ev_bf & ~bf_to_ma, ptype=TYPE_KPKT,
            next_trans=jnp.int32(-1), nscatterings=jnp.int32(0))
        cnt["ma_act_bf"] += mcount(bf_to_ma)
        cnt["k_from_bf"] += mcount(ev_bf & ~bf_to_ma)
        n_line_pass = mcount(line_pass)

        # macro-atom activation snapshot (for the LOG_MACROATOM
        # per-deactivation rows): any lane that became a macro-atom
        # this iteration (bb/bf absorption, k-packet collexc/collion,
        # NT ionisation/excitation) records its entry level and
        # frequencies; only bb absorption has an activating line
        became_ma = active & (new["ptype"] == TYPE_MA) \
            & (pk.ptype != TYPE_MA)
        upd(became_ma,
            ma_activ_level=new["ma_level"],
            ma_activ_line=jnp.where(bb_hit, wl_c, jnp.int32(-99)),
            ma_activ_nu_cmf=new["nu_cmf"],
            ma_activ_nu_rf=new["nu_rf"],
            ma_jumps_cur=jnp.int32(0))

        # remember the candidate line index for packets that moved
        # without a line event (boundary/time branches); lines passed
        # during the walk are included
        upd(m_det & (take_boundary | take_time), next_trans=j_new)
        # entering an empty or thick cell invalidates the line position
        # (closest_transition_empty resync, rpkt.cc:511-555)
        new_cell = jnp.clip(new["cell"], 0,
                            tables["cell_mgi"].shape[0] - 1)
        if has_cp:
            cp2 = tables["cell_pack"][new_cell]
            new_mgi = cp2[:, CP_MGI].astype(jnp.int32)
            new_thick = cp2[:, CP_THICK] == 1
        else:
            new_mgi = tables["cell_mgi"][new_cell]
            new_thick = tables["thick"][new_mgi] == 1
        left_detailed = cross & m_rpkt & (
            (new_mgi >= nmodel) | new_thick)
        upd(left_detailed, next_trans=jnp.int32(-1))

    upd(ev_r, dirvec=dir_r, nu_rf=nu_cmf_n / dopp_r,
        e_rf=e_cmf_n / dopp_r, last_cross=geo.BOUNDARY_NONE,
        nscatterings=pk.nscatterings + 1, em_time=t_n,
        em_pos=pos_n)
    cnt["escounter"] += mcount(ev_r)
    cnt["interactions"] += mcount(take_event) - n_line_pass

    # bump the RNG counter for every packet touched this iteration
    new["rng_count"] = jnp.where(active, pk.rng_count + 1, pk.rng_count)
    new["interactions"] = jnp.where(
        (take_event & ~line_pass) | m_kpkt, pk.interactions + 1,
        new["interactions"])

    # =====================================================================
    # virtual packets (rlc_emiss_vpkt, vpkt.cc:76-374) as deterministic
    # peel-off estimators: every re-emission / electron scatter this
    # iteration contributes w = e * p(obs) * exp(-tau_obs) to each
    # observer's (time, nu) spectrum. tau_obs is a bounded ray-march to
    # the grid edge through the per-cell opacities, with lines treated
    # by the binned expansion opacity (chi_line_exp) — the TPU-native
    # replacement for the reference's exact per-ray line walk
    # (check_tau, vpkt.cc:374-441) that keeps the march a fixed-length
    # fori_loop. Early exit at tau > vpkt_tau_max (vpkt.cc:151).
    # =====================================================================
    if vpkt and "vpkt_I" in est:
        if detailed:
            # the reference peels at electron scatters (rpkt.cc:362),
            # kpkt ff/fb emission (kpkt.cc:633,693) and MA radiative
            # deactivation (macroatom.cc:294,378) — NOT at thick-cell
            # grey scatters (rpkt_event_thickcell has no vpkt call,
            # rpkt.cc:491-509) and NOT at do_kpkt_bb Planck
            # re-emission (kpkt.cc:448-475 has no
            # vpkt_call_estimators); creation in a thick cell and
            # rays entering thick cells are killed inside the march
            vp_iso = k_ff | k_fb | ma_rad | ma_radrec
            vp_dip = ev_escat
        else:
            vp_iso = m_kbb
            vp_dip = ev_r
        vp_any = vp_iso | vp_dip
        pos_e, t_e = new["pos"], new["prop_time"]
        nu_e, e_e = new["nu_cmf"], new["e_cmf"]
        cell_e = new["cell"]

        # exact per-ray Sobolev line depth (check_tau, vpkt.cc:374-441
        # parity): along a straight observer ray in non-relativistic
        # homologous flow nu_cmf decreases monotonically and
        # t(s) * nu_cmf(s) is invariant, so every line k with
        # nu_k in (nu_end, nu_start] of a cell segment is crossed
        # exactly once with tau_k = tau_base[cell, k] * t_nu / nu_k.
        # The summed segment depth is then t_nu * (D[j2] - D[j1]) of
        # the SAME per-cell cumulative table the transport walk uses
        # (lw_D_blk) — two row-gathers per march step, no binning.
        # The binned expansion opacity (chi_line_exp) remains the
        # fallback (relativistic mode), where the invariant is only
        # first-order.
        use_exact_vline = (detailed and not relativistic
                           and "lw_D_blk" in tables)
        if use_exact_vline:
            LWD_v = tables["lw_D_blk"]
            LWDl_v = tables["lw_D_lo_blk"]
            nbw_v = LWD_v.shape[1]
            LWD2_v = LWD_v.reshape(-1, ROWW)
            LWDl2_v = LWDl_v.reshape(-1, ROWW)
            LWNU_v = tables["lw_nu_blk"]  # [nb, 128] descending
            ends_v = LWNU_v[:, ROWW - 1]
            nlines_v = params.line_nu.shape[0]

            def vline_count_gt(nu):
                """j = number of lines with nu_line > nu (index into
                the descending-sorted list / exclusive prefix D)."""
                b = jnp.clip(
                    jnp.sum((ends_v[None, :] > nu[:, None])
                            .astype(jnp.int32), axis=1),
                    0, LWNU_v.shape[0] - 1)
                row = LWNU_v[b]  # [N, 128] row-gather
                return jnp.minimum(
                    b * ROWW + jnp.sum(
                        (row > nu[:, None]).astype(jnp.int32),
                        axis=1), nlines_v)

            def vline_D_at(mgi_l, j):
                """(hi, lo) double-single D at index j — differences
                must be taken as (hi2-hi1)+(lo2-lo1) (see
                driver._build_line_walk_blocks)."""
                jc_ = jnp.clip(j, 0, nlines_v)
                r = mgi_l * nbw_v + jc_ // ROWW
                c = jc_ % ROWW
                return (onehot_extract(LWD2_v[r], c),
                        onehot_extract(LWDl2_v[r], c))

        def vpkt_tau(obs_b, nu_obs):
            n_march = 2 * ncoord + 8
            ncell_tot = tables["cell_mgi"].shape[0]
            if use_exact_vline:
                dpp0 = geo.doppler_packet(pos_e, obs_b, t_e,
                                          relativistic)
                nu0 = nu_obs * dpp0
                t_nu_v = t_e * nu0
                # the observer ray inherits the packet's post-event
                # walk position (rlc_emiss_vpkt copies next_trans,
                # vpkt.cc:93-96 + closest_transition(nu, next_trans)):
                # a just-re-emitted resonance photon must NOT
                # self-absorb in its own line, and lines the packet
                # already walked past are excluded
                j_start = jnp.maximum(
                    vline_count_gt(nu0),
                    jnp.clip(new["next_trans"], 0, nlines_v))
            else:
                j_start = jnp.zeros_like(cell_e)

            def march(_, st):
                posm, tm, cellm, lcm, taum, alive, jprev = st
                if grid_type == "spherical":
                    sd, snx, lc_n = geo.boundary_cross_spherical(
                        posm, obs_b, tm, cellm, lcm, ncell_tot,
                        tables["pos_min"][:, 0], tables["wid"])
                else:
                    sd, snx, lc_n = geo.boundary_cross_uniform(
                        posm, obs_b, tm, cellm, lcm, ncoord,
                        tables["pos_min"], tables["wid"])
                cell_l = jnp.clip(cellm, 0, ncell_tot - 1)
                if has_cp:
                    cp_l = tables["cell_pack"][cell_l]
                    mgi_l = cp_l[:, CP_MGI].astype(jnp.int32)
                else:
                    mgi_l = tables["cell_mgi"][cell_l]

                def march_scalar(key, col):
                    return (cp_l[:, col] if has_cp
                            else tables[key][mgi_l])

                pm = posm + obs_b * (0.5 * sd)[:, None]
                t_m = tm + 0.5 * sd
                dpp = geo.doppler_packet(pm, obs_b, t_m, relativistic)
                nu_c = nu_obs * dpp  # local comoving frequency
                thick_l = march_scalar("thick", CP_THICK) == 1
                chi_l = march_scalar("chi_grey", CP_CHI_GREY)
                if detailed:
                    Te_l = jnp.maximum(march_scalar("Te", CP_TE), 1.0)
                    kff_l = (march_scalar("kff_base", CP_KFF)
                             * (jnp.maximum(nu_c, 1e12) / 1e15) ** -3
                             * (-jnp.expm1(-jnp.float32(H / KB)
                                           * nu_c / Te_l)))
                    nbf_l = tables["chi_bf"].shape[1]
                    bl = ((jnp.log(jnp.maximum(nu_c, 1.0))
                           - params.bf_lognu_min)
                          / params.bf_dlognu).astype(jnp.int32)
                    in_b = (bl >= 0) & (bl < nbf_l)
                    blc = jnp.clip(bl, 0, nbf_l - 1)
                    chibf_l = jnp.where(
                        in_b, bin_fetch(tables["chi_bf"], mgi_l, blc),
                        0.0)
                    if use_exact_vline:
                        chiline_l = 0.0  # exact term added below
                    else:
                        chiline_l = jnp.where(
                            in_b, bin_fetch(tables["chi_line_exp"],
                                            mgi_l, blc), 0.0)
                    chi_det = (march_scalar("chi_thomson", CP_CHI_TH)
                               + kff_l + chibf_l + chiline_l)
                    chi_l = chi_det
                chi_l = jnp.where(mgi_l >= nmodel, 0.0, chi_l) * dpp
                tau_seg = chi_l * sd
                if use_exact_vline:
                    # exact Sobolev sum of the lines redshifted past
                    # within this cell segment: nu_cmf at the segment
                    # end bounds the crossed index range [jprev, jn)
                    dpp_e2 = geo.doppler_packet(
                        posm + obs_b * sd[:, None], obs_b, tm + sd,
                        relativistic)
                    nu_end = nu_obs * dpp_e2
                    jn = jnp.maximum(vline_count_gt(nu_end), jprev)
                    hi2, lo2 = vline_D_at(mgi_l, jn)
                    hi1, lo1 = vline_D_at(mgi_l, jprev)
                    tau_lines = jnp.maximum(
                        t_nu_v * ((hi2 - hi1) + (lo2 - lo1)), 0.0)
                    tau_seg = tau_seg + jnp.where(
                        mgi_l >= nmodel, 0.0, tau_lines)
                else:
                    jn = jprev
                # thick-cell kill (detailed mode only — grey-mode
                # cells are all flagged thick by construction): the
                # reference never creates vpkts in thick cells
                # (vpkt_call_estimators, vpkt.cc:846-849) and kills
                # any vpkt whose ray enters one (vpkt.cc:304-307).
                # Step 0's current cell is the creation cell, so one
                # rule covers both: infinite tau.
                in_thick = (thick_l & (mgi_l < nmodel)
                            if detailed
                            else jnp.zeros_like(thick_l))
                tau_n2 = taum + jnp.where(
                    alive, jnp.where(in_thick, jnp.float32(1e30),
                                     tau_seg), 0.0)
                escd = snx == -99
                alive_n = (alive & ~escd & ~in_thick
                           & (tau_n2 < params.vpkt_tau_max))
                return (posm + obs_b * sd[:, None], tm + sd,
                        jnp.where(escd, cellm, snx), lc_n, tau_n2,
                        alive_n, jn)

            st0 = (pos_e, t_e, cell_e,
                   jnp.full_like(cell_e, geo.BOUNDARY_NONE),
                   jnp.zeros_like(t_e), vp_any, j_start)
            return jax.lax.fori_loop(0, n_march, march, st0)[4]

        nobs = params.vpkt_obs.shape[0]
        VT = params.vpkt_t_edges.shape[0] - 1
        VNU = est["vpkt_I"].shape[2]
        est_vp = est["vpkt_I"]
        est_vq = est["vpkt_Q"]
        est_vu = est["vpkt_U"]
        if "vgrid_I" in est:
            est_vgi = est["vgrid_I"]
            est_vgq = est["vgrid_Q"]
            est_vgu = est["vgrid_U"]
        for o in range(nobs):
            obs_b = jnp.broadcast_to(params.vpkt_obs[o], pos_e.shape)
            vel_e = geo.flow_velocity(pos_e, t_e)
            dopp_o = jnp.maximum(
                geo.doppler_nucmf_on_nurf(obs_b, vel_e, relativistic),
                1e-6)
            nu_obs = nu_e / dopp_o
            e_obs = e_e / dopp_o
            if polarization:
                # full polarised peel: phase-function weight and
                # observer-frame Stokes from the packet's (Q, U)
                # through the Bulla+2015 frame chain
                # (rlc_emiss_vpkt, vpkt.cc:124-180)
                from .polarization import peel_stokes
                pn_dip, q_dip, u_dip = peel_stokes(
                    pk.dirvec, pk.stokes_q, pk.stokes_u, pos_e, t_e,
                    obs_b, relativistic)
                w_phase = jnp.where(
                    vp_dip, pn_dip, 1.0 / (4.0 * jnp.float32(PI)))
                q_peel = jnp.where(vp_dip, q_dip, 0.0)
                u_peel = jnp.where(vp_dip, u_dip, 0.0)
            else:
                cosT = geo.dot3(pk.dirvec, obs_b)
                # unpolarised dipole for e-scatter peels; isotropic
                # 1/4pi for thermal / macro-atom emission
                w_phase = jnp.where(
                    vp_dip,
                    3.0 / (16.0 * jnp.float32(PI)) * (1.0 + cosT**2),
                    1.0 / (4.0 * jnp.float32(PI)))
                q_peel = jnp.zeros_like(w_phase)
                u_peel = jnp.zeros_like(w_phase)
            tau_o = vpkt_tau(obs_b, nu_obs)
            # the reference ABORTS a vpkt whose accumulated tau
            # exceeds tau_max without binning anything (check_tau,
            # vpkt.cc:374-441 -> return at vpkt.cc:222,281): the
            # contribution is zero, not exp(-tau_at_kill). Our march
            # freezes tau at the kill point, so a killed ray's final
            # tau >= tau_max identifies it exactly.
            contrib = jnp.where(vp_any & (tau_o <= params.vpkt_tau_max),
                                e_obs * w_phase * jnp.exp(-tau_o), 0.0)
            t_arr = t_e - geo.dot3(pos_e, obs_b)
            it_v = jnp.sum((params.vpkt_t_edges[None, :]
                            <= t_arr[:, None]).astype(jnp.int32),
                           axis=1) - 1
            inu_v = ((jnp.log(jnp.maximum(nu_obs, 1.0))
                      - params.vpkt_lognu_min)
                     / params.vpkt_dlognu).astype(jnp.int32)
            ok_v = (vp_any & (it_v >= 0) & (it_v < VT)
                    & (inu_v >= 0) & (inu_v < VNU))
            flat_v = (jnp.clip(it_v, 0, VT - 1) * VNU
                      + jnp.clip(inu_v, 0, VNU - 1))

            def vrow(w):
                return (jnp.zeros((VT * VNU,), jnp.float32)
                        .at[flat_v].add(jnp.where(ok_v, w, 0.0))
                        .reshape(VT, VNU))

            est_vp = est_vp.at[o].add(vrow(contrib))
            est_vq = est_vq.at[o].add(vrow(contrib * q_peel))
            est_vu = est_vu.at[o].add(vrow(contrib * u_peel))

            if "vgrid_I" in est:
                # velocity-plane image: rotate the emission velocity
                # into the observer's projected frame
                # (add_to_vpkt_grid, vpkt.cc:520-560)
                NV = est["vgrid_I"].shape[2]
                NR = est["vgrid_I"].shape[1]
                vmax_v = params.vgrid_vmax
                nx, ny_, nz_ = obs_b[:, 0], obs_b[:, 1], obs_b[:, 2]
                denom = jnp.sqrt(jnp.maximum(1.0 - nx * nx, 1e-12))
                on_x = jnp.abs(jnp.abs(nx) - 1.0) < 1e-6
                sgn = jnp.sign(nx)
                vr1 = jnp.where(
                    on_x, sgn * vel_e[:, 1],
                    -ny_ * vel_e[:, 0]
                    + (nx + nz_ * nz_ / (1.0 + nx)) * vel_e[:, 1]
                    - ny_ * nz_ * (1.0 - nx) / denom * vel_e[:, 2])
                vr2 = jnp.where(
                    on_x, sgn * vel_e[:, 2],
                    -nz_ * vel_e[:, 0]
                    - ny_ * nz_ * (1.0 - nx) / denom * vel_e[:, 1]
                    + (nx + ny_ * ny_ / (1.0 + nx)) * vel_e[:, 2])
                vbin = 2.0 * vmax_v / NV
                i1g = ((vmax_v - vr1) / vbin).astype(jnp.int32)
                i2g = ((vmax_v - vr2) / vbin).astype(jnp.int32)
                in_img = ((jnp.abs(vr1) < vmax_v)
                          & (jnp.abs(vr2) < vmax_v)
                          & (t_arr >= params.vgrid_t_range[0])
                          & (t_arr <= params.vgrid_t_range[1]))
                flat_g = (jnp.clip(i1g, 0, NV - 1) * NV
                          + jnp.clip(i2g, 0, NV - 1))
                for r in range(NR):
                    in_r = (in_img & vp_any
                            & (nu_obs >= params.vgrid_nu_ranges[r, 0])
                            & (nu_obs <= params.vgrid_nu_ranges[r, 1]))

                    def grow(w):
                        return (jnp.zeros((NV * NV,), jnp.float32)
                                .at[flat_g].add(
                                    jnp.where(in_r, w, 0.0))
                                .reshape(NV, NV))

                    est_vgi = est_vgi.at[o, r].add(grow(contrib))
                    est_vgq = est_vgq.at[o, r].add(
                        grow(contrib * q_peel))
                    est_vgu = est_vgu.at[o, r].add(
                        grow(contrib * u_peel))

    est_out = dict(est)
    if vpkt and "vpkt_I" in est:
        est_out["vpkt_I"] = est_vp
        est_out["vpkt_Q"] = est_vq
        est_out["vpkt_U"] = est_vu
        if "vgrid_I" in est:
            est_out["vgrid_I"] = est_vgi
            est_out["vgrid_Q"] = est_vgq
            est_out["vgrid_U"] = est_vgu
    if "line_em" in est:
        est_out["line_em"] = est_line_em
        est_out["line_ab"] = est_line_ab
    if "ion_stats" in est:
        est_out["ion_stats"] = est_ion
    if "compton_emiss" in est:
        est_out["compton_emiss"] = est_out_ce
        est_out["pp_emiss"] = est_out_pp
    if "J_bin" in est:
        est_out["J_bin"] = est_J_bin
        est_out["nuJ_bin"] = est_nuJ_bin
    if "bfrate" in est and detailed:
        est_out["bfrate"] = est_bfrate
    est_out["J"] = est_J
    est_out["nuJ"] = est_nuJ
    est_out["dep_cell"] = est_dep
    est_out["ffheat"] = est_ffheat
    est_out["colheat"] = est_colheat
    for k, v in scal.items():
        est_out[k] = est[k] + v
    for k, v in cnt.items():
        est_out[k] = est[k] + v
    est_out["iterations"] = est["iterations"] + 1

    return PacketBatch(**new), est_out


# ---------------------------------------------------------------------------
# the per-timestep driver loop
# ---------------------------------------------------------------------------

TRANSPORTABLE = (TYPE_RADIOACTIVE_PELLET, TYPE_GAMMA, TYPE_RPKT,
                 TYPE_KPKT, TYPE_PRE_KPKT, TYPE_NTLEPTON,
                 TYPE_NONTHERMAL_PREDEPOSIT)


def packets_active(p: PacketBatch, t2) -> jax.Array:
    return ((p.ptype != TYPE_ESCAPE) & (p.ptype >= 0)
            & (p.prop_time < t2))


def run_timestep_chunk(pk: PacketBatch, est: dict, tables: dict,
                       params: TransportParams, t2, nts_is_first,
                       base_key, chunk_iters=512, *, grid_type: str,
                       ncoord: int, relativistic: bool = False,
                       detailed: bool = False,
                       polarization: bool = False,
                       vpkt: bool = False):
    """Advance all packets by up to ``chunk_iters`` events towards the
    end of the timestep (sim time t2).

    Replaces update_packets (update_packets.cc:234-333): the multi-pass
    sort + per-packet while loop becomes a while_loop whose body
    advances every unfinished packet by one event. The iteration count
    per device call is bounded so that single executions stay short
    (friendly to execution deadlines and preemption); the host driver
    re-invokes until ``n_active`` reaches zero — the analogue of the
    reference's outer multi-pass loop (update_packets.cc:249-320).

    Returns (packets, estimators, n_active). ``grid_type``
    ("spherical" | "uniform") and ``ncoord`` are static;
    ``chunk_iters`` is traced so the driver can adapt it without
    recompiling.
    """
    t2 = jnp.float32(t2)
    chunk_iters = jnp.asarray(chunk_iters, jnp.int32)

    def cond(carry):
        p, est_c, it = carry
        return jnp.any(packets_active(p, t2)) & (it < chunk_iters)

    def body(carry):
        p, est_c, it = carry
        p2, est2 = _event_step(p, est_c, tables, params, t2,
                               nts_is_first, base_key, grid_type,
                               ncoord, relativistic, detailed,
                               polarization, vpkt)
        return (p2, est2, it + 1)

    pk_out, est_out, _ = jax.lax.while_loop(
        cond, body, (pk, est, jnp.int32(0)))
    n_active = jnp.sum(packets_active(pk_out, t2).astype(jnp.int32))
    return pk_out, est_out, n_active


def run_timestep(pk: PacketBatch, tables: dict, params: TransportParams,
                 t2, nts_is_first, base_key, *, grid_type: str,
                 ncoord: int, relativistic: bool = False,
                 detailed: bool = False, max_iters: int = 2_000_000):
    """Single-call variant: propagate to the end of the timestep in one
    device execution (used by the multichip dry run and tests)."""
    est0 = zero_estimators(tables["chi_grey"].shape[0] - 1)
    pk_out, est_out, _ = run_timestep_chunk(
        pk, est0, tables, params, t2, nts_is_first, base_key, max_iters,
        grid_type=grid_type, ncoord=ncoord, relativistic=relativistic,
        detailed=detailed)
    return pk_out, est_out
