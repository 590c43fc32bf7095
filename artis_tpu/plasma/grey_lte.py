"""Grey / LTE grid update between transport steps.

Implements the opacity_case < 4 branch of the reference's per-timestep
grid solve (update_grid_cell, update_grid.cc:1209-1239), vectorised
over all cells at once:

* densities scale homologously: rho = rho_init / (tmid/tmin)^3
* radioactive abundances advance via the Bateman solutions
* T_J is set from the normalised J estimator: T_J = (pi J / sigma)^1/4
  (get_T_J_from_J, radfield.cc:1464-1479) and Te = TR = TJ = T_J, W = 1
* all cells are flagged optically thick (grey e-scattering transport)
* opacity_case 3 re-evaluates kappa_grey against rho_crit
  (update_grid.cc:1230-1238)
"""

from __future__ import annotations

import numpy as np

from ..config import SimConfig
from ..constants import FOURPI, PI, STEBO
from ..decay import DecayModel
from ..grid import Grid, calculate_electron_densities
from ..units import Units


def normalise_J(est_J_sim: np.ndarray, g: Grid, units: Units,
                tmid: float, deltat: float) -> np.ndarray:
    """Convert the accumulated path-length estimator (sim units) into
    the mean intensity J [erg/s/cm^2] per model cell
    (normalisation factor 1/(4 pi dV dt), update_grid.cc:1041-1042).

    The reference also divides by nprocs because every MPI rank carries
    the full packet energy; here shards partition the packets, so the
    psum over shards already yields the single-population total.
    """
    deltaV = g.vol_init * (tmid / g.tmin) ** 3
    J_cgs = (np.asarray(est_J_sim[:g.nmodel], dtype=np.float64)
             * units.x_unit * units.e0)
    # model cells with no associated propagation cells have zero
    # simulated volume (and no contributions): J := 0 there
    return np.where(deltaV > 0,
                    J_cgs / (FOURPI * np.maximum(deltaV, 1e-300)
                             * deltat), 0.0)


def update_grid_common(g: Grid, dm: DecayModel, cfg: SimConfig,
                       tmid: float, zlist=None, elements_z=None):
    """Advance densities/abundances to timestep midpoint ``tmid``
    (common to grey and detailed modes).

    ``elements_z``: model-atom element list for the nnetot restriction
    (calculate_electron_densities, update_grid.cc:1669-1674)."""
    trat = tmid / g.tmin
    g.rho = g.rho_init / trat**3

    # radioactive decay moves composition (update_abundances)
    if zlist is None:
        zlist = list(range(1, g.elem_abund.shape[1] + 1))
    if g.elem_abund_init is not None and g.elem_abund_init.any():
        g.elem_abund = dm.update_elemental_abundances(
            g.elem_abund_init, zlist, tmid)
    calculate_electron_densities(g, elements_z=elements_z)


def update_grid_grey(g: Grid, dm: DecayModel, cfg: SimConfig,
                     tmid: float, zlist=None):
    """Advance per-cell state to timestep midpoint ``tmid``.

    Temperatures are updated separately from the previous timestep's
    estimators via ``update_temperatures_from_J``.
    """
    update_grid_common(g, dm, cfg, tmid, zlist)

    # grey transport treats every non-empty cell as thick
    # (update_grid_cell, update_grid.cc:1209-1212)
    g.thick = np.where(g.rho_init > 0, 1, 0).astype(np.int32)

    if cfg.opacity_case == 3:
        k3 = g.opcase3_normal * (0.9 * g.ffegrp + 0.1)
        g.kappagrey = np.where(
            g.rho > g.rho_crit,
            k3 * g.rho_crit / np.maximum(g.rho, 1e-300), k3)
        g.kappagrey = np.where(g.rho_init > 0, g.kappagrey, 0.0)


def fit_fullspec_dilute(g: Grid, cfg: SimConfig, J_cgs: np.ndarray,
                        nubar: np.ndarray):
    """Dilute-blackbody full-spectrum radiation field fit
    (set_params_fullspec, radfield.cc:1136-1173):
      T_J = (pi J / sigma)^1/4
      T_R = h nubar / (3.832229494 k)
      W   = pi J / (sigma T_R^4)
    """
    from ..constants import H, KB
    ok = np.isfinite(nubar) & (nubar > 0) & (J_cgs > 0)
    T_J = np.clip((J_cgs * PI / STEBO) ** 0.25, cfg.mintemp, cfg.maxtemp)
    T_R = np.clip(H * nubar / KB / 3.832229494, cfg.mintemp, cfg.maxtemp)
    W = J_cgs * PI / STEBO / T_R**4
    g.TJ = np.where(ok, T_J, g.TJ)
    g.TR = np.where(ok, T_R, g.TR)
    g.W = np.where(ok, W, g.W)


def update_temperatures_from_J(g: Grid, cfg: SimConfig,
                               J_cgs: np.ndarray):
    """LTE temperature update from the mean intensity estimator
    (get_T_J_from_J, radfield.cc:1464-1481): estimator-starved cells
    (J = 0 -> T_J = 0) CLAMP to MINTEMP — the previous temperature is
    kept only for a non-finite estimator."""
    with np.errstate(invalid="ignore"):
        T_J = (J_cgs * PI / STEBO) ** 0.25
    T_J = np.where(np.isfinite(T_J), T_J, g.TJ)
    T_J = np.clip(T_J, cfg.mintemp, cfg.maxtemp)
    T_J = np.where(g.rho_init > 0, T_J, 0.0)
    g.Te = T_J.copy()
    g.TJ = T_J.copy()
    g.TR = T_J.copy()
    g.W = np.ones_like(T_J)
