"""Photoionisation / recombination rate coefficients and bound-free
opacity tables.

Rebuild of the reference's rate-coefficient machinery (reference:
ratecoeff.cc). The reference precomputes temperature LUTs with GSL
integrators and caches them in ratecoeff.dat; here the integrals are
evaluated directly per timestep for every (cell, continuum) pair as
vectorised numpy sums over the cross-section grid — cheap enough that
no LUT or cache file is needed.

Formulas (ratecoeff.cc:249-420, dilute-blackbody radiation field):
  alpha_sp    = 4 pi sahafact(Te) int sigma (2/c^2) nu^2 e^(-h nu/kTe)
  bfcooling   = 4 pi sahafact(Te) int sigma (nu-nu_e)(2h/c^2) nu^2
                                      e^(-h nu/kTe)
  gamma_corr  = 4 pi W int sigma/(h nu) B_nu(T_R) (1 - e^(-h nu/kT_R))
  bfheating   = 4 pi W int sigma (1-nu_e/nu) B_nu(T_R)(1-e^(-h nu/kT_R))
  C_ion       = nne 1.55e13 T^-1/2 g sigma0 e^-f / f   (Seaton,
                macroatom.cc:1166-1196)
  C_rec       = nne^2 sahafact 1.55e13 T^-1/2 g sigma0 e^-f / f
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..atomic import AtomicData
from ..constants import CLIGHT, H, KB, SAHACONST
from ..phixs import PhixsData

TWOOVERCLIGHTSQUARED = 2.0 / CLIGHT**2


@dataclasses.dataclass
class PhotoionRates:
    """Per-(cell, continuum) rate coefficients [ncells, ncont]."""
    alpha_sp: np.ndarray  # spontaneous recombination [cm^3/s]
    bfcooling: np.ndarray  # bf cooling coeff [erg cm^3/s]
    gamma_corr: np.ndarray  # photoionisation rate per atom [1/s]
    bfheating: np.ndarray  # bf heating coeff [erg/s per atom]
    c_ion: np.ndarray  # collisional ionisation rate per atom [1/s]
    c_rec: np.ndarray  # collisional recombination per ion [1/s]
    sahafact: np.ndarray  # n_l/(n_u n_e) LTE factor


def _planck(nu, T):
    with np.errstate(over="ignore"):
        x = np.minimum(H * nu / (KB * T), 500.0)
        return 2.0 * H * nu**3 / CLIGHT**2 / np.expm1(np.maximum(x, 1e-30))


def _upsampled_grids(ph: PhixsData, UPS: int = 8):
    """Wien-resolved cross-section grids (timestep-independent;
    cached on the PhixsData instance). Returns (sig, nu, dnu, x_f),
    each [ncont, NPf] except x_f [NPf]."""
    cache = getattr(ph, "_rate_grid_cache", None)
    if cache is not None:
        return cache
    xg = ph.x_grid
    jf = np.arange((len(xg) - 1) * UPS + 1)
    j0 = np.minimum(jf // UPS, len(xg) - 2)
    wf = jf / UPS - j0
    x_f = xg[j0] * (1 - wf) + xg[j0 + 1] * wf
    sig = (ph.cont_sigma[:, j0] * (1 - wf)[None, :]
           + ph.cont_sigma[:, j0 + 1] * wf[None, :])
    nu = ph.cont_nu_edge[:, None] * x_f[None, :]
    dnu = np.gradient(nu, axis=1)
    object.__setattr__(ph, "_rate_grid_cache", (sig, nu, dnu, x_f))
    return sig, nu, dnu, x_f


# per-continuum LUT grid in u = h nu_edge / (k T): covers MINTEMP~1e3 K
# at hard X-ray edges down to MAXTEMP~1e5+ K at soft edges
_N_ULUT = 1536
_U_LO, _U_HI = 1e-4, 700.0


def _rate_luts(ph: PhixsData):
    """Per-continuum rate-integral LUTs over u = h nu_edge/(k T).

    Every fullspec integral in this module reduces to
        F(u) = sum_p K[i, p] * exp(-u * x[p])
    with a timestep-independent kernel K (the Planck factor times the
    stimulated-emission correction collapses: B_nu(T)(1-e^-x) =
    (2 h nu^3/c^2) e^-x). Tabulating F on a dense log-u grid once per
    run replaces the [ncells, ncont, NPf] exponential sweep per
    timestep with an [ncells, ncont] interpolation — the reference
    stores the same LUTs in ratecoeff.dat (TABLESIZE temperature
    grid, ratecoeff.cc:450-630); this grid is ~25x denser, so the
    interpolation error (<1e-4) is far below the 2-6% agreement of
    the direct integrals with the reference's tables."""
    cache = getattr(ph, "_rate_lut_cache", None)
    if cache is not None:
        return cache
    sig, nu, dnu, x_f = _upsampled_grids(ph)
    # K_a: alpha_sp / photoionisation kernel; K_b: bf-cooling /
    # bf-heating kernel (see compute_rates formulas)
    K_a = sig * TWOOVERCLIGHTSQUARED * nu**2 * dnu
    K_b = (sig * (nu - ph.cont_nu_edge[:, None]) * 2.0 * H
           / CLIGHT**2 * nu**2 * dnu)
    logu = np.linspace(np.log(_U_LO), np.log(_U_HI), _N_ULUT)
    E = np.exp(-np.outer(x_f, np.exp(logu)))  # [NPf, NU]
    Fa = K_a @ E  # [ncont, NU]
    Fb = K_b @ E
    tiny = 1e-300
    cache = (logu, np.log(np.maximum(Fa, tiny)),
             np.log(np.maximum(Fb, tiny)))
    object.__setattr__(ph, "_rate_lut_cache", cache)
    return cache


def _lut_eval(logF: np.ndarray, logu_grid: np.ndarray,
              u: np.ndarray) -> np.ndarray:
    """Interpolate per-continuum log-F rows at u [ncells, ncont]."""
    lu = np.log(np.clip(u, _U_LO, _U_HI))
    step = logu_grid[1] - logu_grid[0]
    f = (lu - logu_grid[0]) / step
    i0 = np.clip(f.astype(np.int64), 0, len(logu_grid) - 2)
    w = f - i0
    cols = np.broadcast_to(np.arange(logF.shape[0])[None, :], u.shape)
    v = (logF[cols, i0] * (1.0 - w) + logF[cols, i0 + 1] * w)
    return np.exp(v)


def compute_rates(ad: AtomicData, ph: PhixsData, Te: np.ndarray,
                  TR: np.ndarray, W: np.ndarray,
                  nne: np.ndarray, radfield=None,
                  with_radiative: bool = True) -> PhotoionRates:
    """Evaluate all rate integrals for every cell x continuum.

    ``radfield``: optional fitted BinnedRadField; when given, the
    photoionisation and bf-heating integrals run over the multibin
    field instead of the fullspec dilute blackbody — the reference's
    DETAILED_BF_ESTIMATORS / NO_LUT mode
    (calculate_corrphotoioncoeff_integral, ratecoeff.cc:1184-1260).

    ``with_radiative=False`` skips the radiation-field integrals
    (gamma_corr / bfheating returned as zeros): they are
    T_e-independent, so T_e iterations (thermal.solve_Te) hoist them
    out of the loop and only re-evaluate the T_e-dependent pieces."""
    Te = np.maximum(np.asarray(Te, np.float64), 1.0)[:, None]
    TR = np.maximum(np.asarray(TR, np.float64), 1.0)[:, None]
    W = np.asarray(W, np.float64)[:, None]
    nne_c = np.asarray(nne, np.float64)[:, None]

    # Wien-resolved upsampled cross-section grids (the reference
    # integrates interpolated sigma with an adaptive GSL rule,
    # precalculate_rate_coefficient_integrals, ratecoeff.cc:450-630;
    # trapezoid on the 8x-refined grid matches to < 1%) — cached,
    # they are timestep-independent
    sig, nu, dnu, x_f = _upsampled_grids(ph)

    g_l = ad.level_g[ph.cont_level]
    g_u = ad.level_g[ph.cont_upperlevel]
    E_thresh = ph.cont_nu_edge * H

    # sahafact [ncells, nc] (calculate_sahafact, ltepop.cc:538-556)
    with np.errstate(over="ignore"):
        sfac = (SAHACONST * (g_l / g_u)[None, :] * Te**-1.5
                * np.exp(np.minimum(E_thresh[None, :] / (KB * Te), 500.0)))

    # fullspec integrals via the per-continuum u-LUTs (_rate_luts):
    # every integral is F(u) = sum K exp(-u x) with u = h nu_edge/kT,
    # so the per-timestep cost is one [ncells, ncont] interpolation
    # per rate instead of an [ncells, ncont, NPf] exponential sweep
    # (the 46 s/ts host wall at 512 cells x 767 continua, SCALE_DEMO)
    ncells = Te.shape[0]
    nc = ph.ncont
    logu_grid, logFa, logFb = _rate_luts(ph)
    u_Te = (H / KB) * ph.cont_nu_edge[None, :] / Te
    alpha_sp = 4.0 * np.pi * _lut_eval(logFa, logu_grid, u_Te)
    bfcool = 4.0 * np.pi * _lut_eval(logFb, logu_grid, u_Te)
    if with_radiative and radfield is None:
        # B_nu(T_R)(1 - e^{-h nu/k T_R}) = (2 h nu^3/c^2) e^{-u x},
        # so sigma/(h nu) * B stim collapses to sigma (2/c^2) nu^2
        # e^{-ux} = the K_a kernel, and sigma (1 - edge/nu) * B stim
        # to K_b: the dilute-field photoionisation and bf-heating
        # integrals are the SAME LUTs evaluated at u(T_R), scaled W
        u_TR = (H / KB) * ph.cont_nu_edge[None, :] / TR
        gamma = 4.0 * np.pi * W * _lut_eval(logFa, logu_grid, u_TR)
        bfheat = 4.0 * np.pi * W * _lut_eval(logFb, logu_grid, u_TR)
    else:
        gamma = np.zeros((ncells, nc))
        bfheat = np.zeros((ncells, nc))
    alpha_sp *= sfac
    bfcool *= sfac

    if with_radiative and radfield is not None:
        # integrate over the fitted multibin field: J_nu and the bin's
        # colour temperature give the stimulated-emission correction
        nu_flat = nu.ravel()
        J3 = radfield.Jnu_at(nu_flat).reshape(ncells, nc, -1)
        T3 = radfield.TR_at(nu_flat).reshape(ncells, nc, -1)
        with np.errstate(over="ignore", invalid="ignore"):
            stim3 = -np.expm1(-np.minimum(
                H * nu[None] / (KB * np.maximum(T3, 1.0)), 500.0))
        gamma = 4.0 * np.pi * np.sum(
            sig[None] / (H * nu[None]) * J3 * stim3 * dnu[None], axis=2)
        bfheat = 4.0 * np.pi * np.sum(
            sig[None] * (1.0 - ph.cont_nu_edge[None, :, None]
                         / nu[None]) * J3 * stim3 * dnu[None], axis=2)

    # Seaton collisional ionisation (macroatom.cc:1166-1196)
    stage = ad.ion_stage[ph.cont_upperion] - 1  # lower-ion stage
    g_seaton = np.select([stage == 1, stage == 2], [0.1, 0.2], 0.3)
    f1 = E_thresh[None, :] / (KB * Te)
    sig0 = ph.cont_sigma[:, 0]
    with np.errstate(over="ignore"):
        c_ion = (nne_c * 1.55e13 * Te**-0.5 * g_seaton[None, :]
                 * sig0[None, :] * np.exp(-np.minimum(f1, 500.0))
                 / np.maximum(f1, 1e-10))
    c_rec = c_ion * nne_c * sfac

    return PhotoionRates(alpha_sp=alpha_sp, bfcooling=bfcool,
                         gamma_corr=gamma, bfheating=bfheat,
                         c_ion=c_ion, c_rec=c_rec, sahafact=sfac)


# ---------------------------------------------------------------------------
# bound-free opacity + continuum selection tables for the transport kernel
# ---------------------------------------------------------------------------

def build_bf_opacity_tables(ad: AtomicData, ph: PhixsData,
                            levelpops: np.ndarray, Te: np.ndarray,
                            x_unit: float, nu_min: float, nu_max: float,
                            nbins: int = 1024, nsel_bins: int = 128):
    """Per-cell frequency-binned bound-free opacity.

    Replaces the reference's per-packet bf sum with a 1e-4-tolerance
    cache (calculate_kappa_bf_gammacontr, rpkt.cc:1075-1207) by
    per-timestep log-nu binned tables:

      chi_bf      [ncells, nbins]  opacity per sim length at bin centre
      sel_cum     [ncells, nsel_bins, ncont] cumulative selection
                  weights n_l sigma(nu) over edge-sorted continua
      log_nu_min, dlognu (floats), and the coarse-bin parameters.

    The LTE stimulated-emission correction (1 - e^(-h nu/k Te)) is
    applied to the opacity.
    """
    ncells = levelpops.shape[0]
    nl = np.asarray(levelpops, np.float64)[:, ph.cont_level]  # [nc_,ncont]
    Te = np.maximum(np.asarray(Te, np.float64), 1.0)

    lognu_min = np.log(nu_min)
    dlognu = (np.log(nu_max) - lognu_min) / nbins
    nu_bins = np.exp(lognu_min + (np.arange(nbins) + 0.5) * dlognu)

    # sigma of each continuum at each bin centre [ncont, nbins] —
    # timestep-independent (fixed bin grid), cached on the PhixsData
    key = (nbins, round(lognu_min, 9), round(dlognu, 12))
    sb_cache = getattr(ph, "_sig_bins_cache", None)
    if sb_cache is not None and sb_cache[0] == key:
        sig_bins = sb_cache[1]
    else:
        # vectorised over all continua at once: x[i, b] = nu_b/edge_i
        xg = ph.x_grid
        x = nu_bins[None, :] / ph.cont_nu_edge[:, None]
        f = np.clip(np.searchsorted(xg, x) - 1, 0, len(xg) - 2)
        w = np.clip((x - xg[f]) / (xg[f + 1] - xg[f]), 0.0, 1.0)
        rows = np.arange(ph.ncont)[:, None]
        sig_bins = (ph.cont_sigma[rows, f] * (1 - w)
                    + ph.cont_sigma[rows, f + 1] * w)
        sig_bins = np.where(x < 1.0, 0.0, sig_bins)
        above = x > xg[-1]
        sig_bins = np.where(
            above, ph.cont_sigma[:, -1:] * (xg[-1]
                                            / np.maximum(x, 1e-10))**3,
            sig_bins)
        object.__setattr__(ph, "_sig_bins_cache", (key, sig_bins))
    chi = nl @ sig_bins  # [ncells, nbins] (cm^-1 before stim corr)
    stim = -np.expm1(-H * nu_bins[None, :] / (KB * Te[:, None]))
    chi_bf = chi * stim * x_unit

    # coarse selection bins — f32 throughout: the kernel consumes the
    # table as f32, and the [ncells, B, ncont] intermediate dominates
    # the host memory traffic of this builder
    dlognu_sel = (np.log(nu_max) - lognu_min) / nsel_bins
    nu_sel = np.exp(lognu_min + (np.arange(nsel_bins) + 0.5) * dlognu_sel)
    sig_sel = np.stack([ph.sigma_at(i, nu_sel)
                        for i in range(ph.ncont)],
                       axis=0).astype(np.float32)  # [ncont, B]
    w = nl.astype(np.float32)[:, None, :] * sig_sel.T[None, :, :]
    sel_cum = np.cumsum(w, axis=2, dtype=np.float32)

    return {
        "chi_bf": chi_bf.astype(np.float32),
        "bf_sel_cum": sel_cum.astype(np.float32),
        "lognu_min": float(lognu_min),
        "dlognu": float(dlognu),
        "dlognu_sel": float(dlognu_sel),
    }
