"""LTE plasma state: partition functions, Saha ionisation, level
populations, and the electron-density solve.

Rebuild of the reference's LTE population machinery (reference:
ltepop.cc: ``phi`` ltepop.cc:115, ``calculate_levelpop`` ltepop.cc:417,
``calculate_sahafact`` ltepop.cc:539; nne root solve
``calculate_populations`` update_grid.cc:1427-1660;
``precalculate_partfuncts`` update_grid.cc) — vectorised over ALL model
cells simultaneously instead of per-cell GSL root finds.

All functions work on numpy arrays on the host (the plasma solve runs
once per timestep over ~1e2-1e5 cells; packed results feed the device
transport tables). A jnp variant of the inner loop can be swapped in
when cell counts get large.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..atomic import AtomicData
from ..constants import EV, KB, MH, SAHACONST

MINPOP = 1e-40


@dataclasses.dataclass
class IonPopulations:
    """Per-cell ionisation state."""
    nne: np.ndarray  # [ncells] free electron density [1/cm^3]
    ion_numberdens: np.ndarray  # [ncells, nions_total] ion number density
    partfuncs: np.ndarray  # [ncells, nions_total] partition functions


def partition_functions(ad: AtomicData, T: np.ndarray) -> np.ndarray:
    """U_i(T) = sum_l g_l exp(-(E_l - E_0)/kT) for every ion.

    T: [ncells] -> returns [ncells, nions_total]
    (precalculate_partfuncts; reference stores per-cell partfunct).
    """
    T = np.asarray(T, dtype=np.float64)
    ncells = len(T)
    out = np.zeros((ncells, ad.nions_total))
    kT = KB * np.maximum(T, 1.0)[:, None]  # [ncells,1]
    for i in range(ad.nions_total):
        s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        de = (ad.level_energy[s:e] - ad.level_energy[s])[None, :]
        out[:, i] = np.sum(ad.level_g[s:e][None, :]
                           * np.exp(-de / kT), axis=1)
    return out


def saha_phi(ad: AtomicData, T: np.ndarray,
             partfuncs: np.ndarray) -> np.ndarray:
    """phi_i = n_i / (n_{i+1} n_e) for ionisation from ion i to i+1
    (phi, ltepop.cc:115-180, LTE branch):
        phi = (U_i / U_{i+1}) * SAHACONST * T^-3/2 * exp(ionpot_i / kT)
    where SAHACONST = 0.5 (h^2 / 2 pi m_e k)^{3/2} and the effective
    ionisation potential is the ground-level energy difference of the
    two ions (ltepop.cc:155-160). Entries for each element's topmost
    ion are 0 (unused). Returns [ncells, nions_total].
    """
    T = np.asarray(T, dtype=np.float64)
    kT = KB * np.maximum(T, 1.0)[:, None]
    sahafact_base = SAHACONST * np.maximum(T, 1.0)[:, None] ** -1.5
    out = np.zeros((len(T), ad.nions_total))
    ground = ad.level_energy[ad.ion_level_start[:-1]]
    for e in range(ad.nelements):
        s, en = ad.elem_ion_start[e], ad.elem_ion_start[e + 1]
        for i in range(s, en - 1):
            ionpot_eff = ground[i + 1] - ground[i]
            with np.errstate(over="ignore"):
                out[:, i] = (partfuncs[:, i] / partfuncs[:, i + 1]
                             * sahafact_base[:, 0]
                             * np.exp(np.minimum(
                                 ionpot_eff / kT[:, 0], 500.0)))
    return out


def ionisation_fractions(ad: AtomicData, phi: np.ndarray,
                         nne: np.ndarray) -> np.ndarray:
    """Relative ion fractions within each element given phi and nne.

    Solves the Saha chain n_{i+1}/n_i = 1/(phi_i * nne) normalised per
    element. Returns [ncells, nions_total] with per-element fractions
    summing to 1.
    """
    ncells = phi.shape[0]
    out = np.zeros_like(phi)
    nne = np.maximum(nne, 1e-30)
    for e in range(ad.nelements):
        s, en = ad.elem_ion_start[e], ad.elem_ion_start[e + 1]
        nions = en - s
        # log-space cumulative ratios to avoid overflow
        logratio = np.zeros((ncells, nions))
        for k in range(1, nions):
            with np.errstate(divide="ignore"):
                logratio[:, k] = (logratio[:, k - 1]
                                  - np.log(np.maximum(phi[:, s + k - 1],
                                                      1e-300))
                                  - np.log(nne))
        m = logratio.max(axis=1, keepdims=True)
        w = np.exp(logratio - m)
        out[:, s:en] = w / w.sum(axis=1, keepdims=True)
    return out


def solve_lte_populations(ad: AtomicData, elem_numberdens: np.ndarray,
                          T: np.ndarray, nne_init=None,
                          niter: int = 100) -> IonPopulations:
    """Solve charge conservation for nne with Saha ionisation balance
    (calculate_populations' GSL Brent solve, update_grid.cc:1427-1660,
    as a vectorised bisection over all cells).

    elem_numberdens: [ncells, nelements] total number density of each
    element [1/cm^3].
    """
    T = np.asarray(T, dtype=np.float64)
    ncells = len(T)
    U = partition_functions(ad, T)
    phi = saha_phi(ad, T, U)
    charges = np.array([ad.ion_stage[i] - 1
                        for i in range(ad.nions_total)], dtype=np.float64)

    ntot = elem_numberdens.sum(axis=1)
    zmax = np.array([ad.elem_z[ad.ion_element[i]]
                     for i in range(ad.nions_total)]).max(initial=1)

    def net_charge(nne):
        frac = ionisation_fractions(ad, phi, nne)
        iondens = frac * np.repeat(
            elem_numberdens, ad.elem_nions, axis=1)
        return (iondens * charges[None, :]).sum(axis=1) - nne

    # bisection in log space between tiny and full ionisation
    lo = np.full(ncells, -40.0)  # log(nne/ntot)
    hi = np.full(ncells, np.log(float(zmax)) + 1e-3)
    ntot_safe = np.maximum(ntot, 1e-300)
    for _ in range(niter):
        mid = 0.5 * (lo + hi)
        f = net_charge(np.exp(mid) * ntot_safe)
        pos = f > 0  # too few electrons assumed -> raise nne
        lo = np.where(pos, mid, lo)
        hi = np.where(pos, hi, mid)
    nne = np.exp(0.5 * (lo + hi)) * ntot_safe
    nne = np.where(ntot > 0, nne, 0.0)

    frac = ionisation_fractions(ad, phi, np.maximum(nne, 1e-30))
    iondens = frac * np.repeat(elem_numberdens, ad.elem_nions, axis=1)
    iondens = np.where(ntot[:, None] > 0, iondens, 0.0)
    return IonPopulations(nne=nne, ion_numberdens=iondens, partfuncs=U)


def level_boltzmann_factors(ad: AtomicData, T: np.ndarray) -> np.ndarray:
    """g_l exp(-(E_l - E_ground)/kT) for every level, [ncells, nlevels].

    Level populations are then n_l = n_ion * factor_l / U_ion
    (calculate_levelpop_lte, ltepop.cc:417-470).
    """
    T = np.asarray(T, dtype=np.float64)
    kT = KB * np.maximum(T, 1.0)[:, None]
    ground = ad.level_energy[ad.ion_level_start[:-1]]
    e_rel = ad.level_energy - np.repeat(ground, ad.ion_nlevels)
    return ad.level_g[None, :] * np.exp(-e_rel[None, :] / kT)


def level_populations(ad: AtomicData, pops: IonPopulations,
                      T: np.ndarray) -> np.ndarray:
    """n_l for every (cell, level) [1/cm^3]."""
    bf = level_boltzmann_factors(ad, T)
    U_rep = np.repeat(pops.partfuncs, ad.ion_nlevels, axis=1)
    n_ion_rep = np.repeat(pops.ion_numberdens, ad.ion_nlevels, axis=1)
    with np.errstate(invalid="ignore"):
        out = n_ion_rep * bf / np.maximum(U_rep, 1e-300)
    return np.where(np.isfinite(out), out, 0.0)


def elem_numberdens_from_massfracs(ad: AtomicData, rho: np.ndarray,
                                   massfracs: np.ndarray,
                                   zlist=None) -> np.ndarray:
    """[ncells, nelements] number densities from elemental mass
    fractions [ncells, 30] (columns Z=1..30) or matching zlist."""
    ncells = len(rho)
    out = np.zeros((ncells, ad.nelements))
    for e in range(ad.nelements):
        z = int(ad.elem_z[e])
        col = z - 1 if zlist is None else list(zlist).index(z)
        if col < massfracs.shape[1]:
            out[:, e] = rho * massfracs[:, col] / ad.elem_mass[e]
    return out
