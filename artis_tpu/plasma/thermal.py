"""Electron-temperature solve from thermal balance.

Rebuild of the reference's T_e finder (reference: thermalbalance.cc:
``call_T_e_finder`` 397-520, ``calculate_heating_rates`` 218-346,
``T_e_eqn_heating_minus_cooling`` 349-396) as a vectorised bisection
over ALL cells simultaneously (the reference runs a GSL Brent solve
per cell).

heating(T_e) = ffheating_estimator + sum_cont n_l(T_e) bfheating_coeff
               + colheating_estimator [+ non-thermal deposition frac]
cooling(T_e) = C_ff + C_fb + C_collexc + C_collion + adiabatic

Populations are re-solved (LTE Saha) at each trial temperature, as the
reference does via calculate_populations inside the root function.
"""

from __future__ import annotations

import numpy as np

from ..atomic import AtomicData
from ..constants import KB
from ..phixs import PhixsData
from . import lte, photoion
from .macroatom import C_0  # noqa: F401 (re-export convenience)


def cooling_rates(ad: AtomicData, ph: PhixsData, nl: np.ndarray,
                  pops: lte.IonPopulations, Te: np.ndarray,
                  rates: photoion.PhotoionRates, t_mid: float):
    """Total cooling rate density [erg/s/cm^3] per cell at Te.

    Reuses the kpkt cooling channel formulas (calculate_cooling_rates,
    kpkt.cc:84-167)."""
    Te = np.maximum(Te, 1.0)
    charges = (ad.ion_stage - 1).astype(np.float64)
    z2n = pops.ion_numberdens @ (charges**2)
    c_ff = 1.426e-27 * np.sqrt(Te) * z2n * pops.nne

    # fb cooling: bfcooling_coeff * n_upperion * nne per continuum
    # (upper-ion pops via a segment sum; no per-continuum loop)
    ion_of_level = np.repeat(np.arange(ad.nions_total),
                             np.diff(ad.ion_level_start))
    ionpop = np.zeros((len(Te), ad.nions_total))
    np.add.at(ionpop.T, ion_of_level, np.asarray(nl, np.float64).T)
    upion_pop = ionpop[:, ph.cont_upperion]
    c_fb = (rates.bfcooling * upion_pop * pops.nne[:, None]).sum(axis=1)

    # collisional excitation cooling: direct sum of
    # C_exc * eps_trans * n_l over lines (get_cooling_ion_coll_exc,
    # kpkt.cc; same formulas as macroatom.h:109-150)
    from ..constants import H_ionpot, KB as KB_
    Te_c = Te[:, None]
    lo, up = ad.line_lower, ad.line_upper
    eps_trans = (ad.level_energy[up] - ad.level_energy[lo])[None, :]
    eokt = eps_trans / (KB_ * Te_c)
    cs = ad.line_coll_str[None, :]
    forb = ad.line_forbidden[None, :]
    f_lu = ad.line_f[None, :]
    g_l = ad.level_g[lo][None, :]
    g_u = ad.level_g[up][None, :]
    sqTe = np.sqrt(Te_c)
    nne_c = pops.nne[:, None]
    with np.errstate(over="ignore", divide="ignore", invalid="ignore"):
        gaunt = np.where(eokt > 0.33421, 0.2,
                         0.276 * np.exp(np.minimum(eokt, 500.0))
                         * (-0.5772156649
                            - np.log(np.maximum(eokt, 1e-30))))
        vr_exc = (C_0 * nne_c * sqTe * 14.51039491 * f_lu
                  * (H_ionpot / eps_trans) ** 2 * eokt
                  * np.exp(-np.minimum(eokt, 500.0))
                  * np.maximum(gaunt, 0.2))
        axel_exc = (nne_c * 8.629e-6 * 0.01
                    * np.exp(-np.minimum(eokt, 500.0)) * g_u / sqTe)
        cs_exc = (nne_c * 8.629e-6 * cs
                  * np.exp(-np.minimum(eokt, 500.0)) / g_l / sqTe)
    C_exc = np.where(cs >= 0, cs_exc, np.where(forb, axel_exc, vr_exc))
    c_exc = (C_exc * eps_trans * nl[:, lo]).sum(axis=1)

    eps_tr = (ad.level_energy[ph.cont_upperlevel]
              - ad.level_energy[ph.cont_level])[None, :]
    c_ion = (nl[:, ph.cont_level] * rates.c_ion * eps_tr).sum(axis=1)
    return c_ff, c_fb, c_exc, c_ion


def solve_Te(ad: AtomicData, ph: PhixsData, elem_numberdens: np.ndarray,
             TR: np.ndarray, W: np.ndarray, ffheat_est: np.ndarray,
             colheat_est: np.ndarray, t_mid: float, vol_tmin: np.ndarray,
             tmin: float, mintemp: float, maxtemp: float,
             niter: int = 24,
             dep_heating: np.ndarray | None = None,
             radfield=None,
             fixed_nl: np.ndarray | None = None,
             fixed_nne: np.ndarray | None = None) -> np.ndarray:
    """Bisection on heating(T_e) - cooling(T_e) = 0 for every cell.

    ffheat_est/colheat_est are normalised estimator values
    [erg/s/cm^3]. ``dep_heating`` is the non-thermal deposition heating
    rate density per cell [erg/s/cm^3] — nt_frac_heating x
    deposition_rate_density, the dominant nebular heating term
    (calculate_heating_rates, thermalbalance.cc:370-390); it is
    T_e-independent and enters the heating sum directly. Returns T_e
    clamped to [mintemp, maxtemp]; cells with no bracket take the
    boundary with the smaller |imbalance| (call_T_e_finder's fallback,
    thermalbalance.cc:470-516).

    ``fixed_nl``/``fixed_nne``: hold the level populations and
    electron density FIXED across the root solve — the reference's
    behaviour (call_T_e_finder evaluates heating/cooling with the
    grid's stored populations; only the rate coefficients vary with
    the trial T_e). Essential in the NLTE/nebular regime, where the
    non-thermally-ionised populations are far from the LTE Saha set
    at any trial T_e: recomputing Saha inside the bisection (the
    LTE-phase behaviour, used when these are None) overstates both
    nne and the collisional-excitation cooling and pulls the balance
    point far below the reference's.
    """
    ncells = elem_numberdens.shape[0]
    trat = t_mid / tmin
    dep_h = (dep_heating if dep_heating is not None
             else np.zeros(ncells))

    # the radiation-field integrals (gamma_corr, bfheating) depend on
    # (T_R, W, radfield) only — hoist them out of the T_e bisection
    # (the reference's T_e finder likewise reuses the radfield-driven
    # corrphotoioncoeff across iterations, thermalbalance.cc:141-220).
    # With the raw multibin field these were ~26 repeated [cells x
    # cont x points] integrations per timestep.
    rad = photoion.compute_rates(ad, ph, TR, TR, W,
                                 np.zeros(ncells), radfield=radfield)

    if fixed_nl is not None:
        # ion/electron densities implied by the fixed population set
        ion_of_level = np.repeat(np.arange(ad.nions_total),
                                 np.diff(ad.ion_level_start))
        ion_nd_fix = np.zeros((ncells, ad.nions_total))
        np.add.at(ion_nd_fix.T, ion_of_level,
                  np.asarray(fixed_nl, np.float64).T)
        nne_fix = (fixed_nne if fixed_nne is not None
                   else ion_nd_fix @ (ad.ion_stage - 1.0))
        pops_fix = lte.IonPopulations(
            nne=np.asarray(nne_fix, np.float64),
            ion_numberdens=ion_nd_fix,
            partfuncs=np.ones((ncells, ad.nions_total)))

    def imbalance(Te):
        if fixed_nl is not None:
            pops, nl = pops_fix, fixed_nl
        else:
            pops = lte.solve_lte_populations(ad, elem_numberdens, Te)
            nl = lte.level_populations(ad, pops, Te)
        rates = photoion.compute_rates(ad, ph, Te, TR, W, pops.nne,
                                       with_radiative=False)
        rates.gamma_corr = rad.gamma_corr
        rates.bfheating = rad.bfheating
        # heating: ff (estimator) + bf (analytic, T_R based) + coll est
        # + non-thermal deposition heating (thermalbalance.cc:370-390)
        bfheat = (nl[:, ph.cont_level] * rates.bfheating).sum(axis=1)
        heating = ffheat_est + bfheat + colheat_est + dep_h
        c_ff, c_fb, c_exc, c_ion = cooling_rates(ad, ph, nl, pops, Te,
                                                 rates, t_mid)
        # adiabatic cooling (thermalbalance.cc:382-389):
        # p dV/V = n k T * 3/t
        nntot = elem_numberdens.sum(axis=1) + pops.nne
        cooling_ad = nntot * KB * Te * 3.0 / t_mid
        return heating - (c_ff + c_fb + c_exc + c_ion + cooling_ad)

    lo = np.full(ncells, mintemp)
    hi = np.full(ncells, maxtemp)
    f_lo = imbalance(lo)
    f_hi = imbalance(hi)
    bracketed = f_lo * f_hi < 0

    for _ in range(niter):
        mid = 0.5 * (lo + hi)
        f_mid = imbalance(mid)
        go_up = np.sign(f_mid) == np.sign(f_lo)
        lo = np.where(go_up, mid, lo)
        f_lo = np.where(go_up, f_mid, f_lo)
        hi = np.where(go_up, hi, mid)

    Te = 0.5 * (lo + hi)
    # no bracket: heating dominates everywhere -> maxtemp; cooling
    # dominates everywhere -> mintemp (call_T_e_finder's clamping,
    # thermalbalance.cc:470-516)
    Te = np.where(bracketed, Te, np.where(f_lo > 0, maxtemp, mintemp))
    return np.clip(Te, mintemp, maxtemp)


def heating_cooling_breakdown(ad: AtomicData, ph: PhixsData,
                              elem_numberdens: np.ndarray,
                              Te: np.ndarray, TR: np.ndarray,
                              W: np.ndarray, ffheat_est: np.ndarray,
                              colheat_est: np.ndarray, t_mid: float,
                              dep_heating: np.ndarray | None = None,
                              radfield=None,
                              fixed_nl: np.ndarray | None = None,
                              fixed_nne: np.ndarray | None = None
                              ) -> dict[str, np.ndarray]:
    """Per-cell heating/cooling components [erg/s/cm^3] at the solved
    T_e — the diagnostic rows the reference appends to
    estimators_XXXX.out (struct heatingcoolingrates,
    thermalbalance.h:4-14; written update_grid.cc:642-649).
    ``fixed_nl``/``fixed_nne``: evaluate with these populations
    instead of the LTE-at-Te set (see solve_Te)."""
    ncells = elem_numberdens.shape[0]
    Te = np.maximum(np.asarray(Te, np.float64), 1.0)
    if fixed_nl is not None:
        nl = fixed_nl
        ion_of_level = np.repeat(np.arange(ad.nions_total),
                                 np.diff(ad.ion_level_start))
        ion_nd = np.zeros((ncells, ad.nions_total))
        np.add.at(ion_nd.T, ion_of_level,
                  np.asarray(fixed_nl, np.float64).T)
        nne_fix = (fixed_nne if fixed_nne is not None
                   else ion_nd @ (ad.ion_stage - 1.0))
        pops = lte.IonPopulations(
            nne=np.asarray(nne_fix, np.float64),
            ion_numberdens=ion_nd,
            partfuncs=np.ones((ncells, ad.nions_total)))
    else:
        pops = lte.solve_lte_populations(ad, elem_numberdens, Te)
        nl = lte.level_populations(ad, pops, Te)
    rates = photoion.compute_rates(ad, ph, Te, TR, W, pops.nne,
                                   radfield=radfield)
    bfheat = (nl[:, ph.cont_level] * rates.bfheating).sum(axis=1)
    c_ff, c_fb, c_exc, c_ion = cooling_rates(ad, ph, nl, pops, Te,
                                             rates, t_mid)
    nntot = elem_numberdens.sum(axis=1) + pops.nne
    cooling_ad = nntot * KB * Te * 3.0 / t_mid
    return {
        "heat_ff": np.asarray(ffheat_est, np.float64),
        "heat_bf": bfheat,
        "heat_coll": np.asarray(colheat_est, np.float64),
        "heat_dep": (np.asarray(dep_heating, np.float64)
                     if dep_heating is not None else np.zeros(ncells)),
        "cool_ff": c_ff,
        "cool_fb": c_fb,
        "cool_coll": c_exc + c_ion,
        "cool_adiabatic": cooling_ad,
    }
