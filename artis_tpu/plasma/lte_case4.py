"""Per-timestep plasma state for detailed (opacity_case 4) transport in
forced-LTE mode.

This is the FORCE_LTE configuration of the reference: level populations
from Saha/Boltzmann at T = T_J (the LTE branch of update_grid_cell,
update_grid.cc:1104-1125), plus the per-cell opacity ingredients the
transport kernel needs (Thomson nne, free-free base, Sobolev level
populations). The NLTE ladder (nltepop/thermalbalance/Spencer-Fano)
replaces this module's temperature/population choices in a later
milestone.
"""

from __future__ import annotations

import numpy as np

from ..atomic import AtomicData
from ..config import SimConfig
from ..grid import Grid
from ..units import Units
from . import lte


def update_thick_flags(g: Grid, cfg: SimConfig, nts: int, tmid: float):
    """Grey-depth based optically-thick flagging
    (update_grid.cc:1160-1197)."""
    trat = tmid / g.tmin
    if g.ndim == 1:
        r_i = g.pos_min[:, 0]
        r_o = r_i + g.wid
        radial_pos = (0.75 * (r_o**4 - r_i**4)
                      / np.maximum(r_o**3 - r_i**3, 1e-300)) * trat
    else:
        centre = g.pos_min + 0.5 * g.wid[:, None]
        radial_pos_cell = np.linalg.norm(centre, axis=1) * trat
        radial_pos = np.zeros(g.nmodel)
        kc = g.cell_keep
        np.add.at(radial_pos, g.cell_mgi[kc], radial_pos_cell[kc])
        counts = np.bincount(g.cell_mgi[kc], minlength=g.nmodel)
        radial_pos /= np.maximum(counts, 1)
    grey_depth = g.kappagrey * g.rho * (g.rmax * trat - radial_pos)
    g.grey_depth = np.where(g.rho_init > 0, grey_depth, 0.0)
    thick = ((grey_depth > cfg.cell_is_optically_thick)
             & (nts < cfg.num_grey_timesteps))
    g.thick = np.where(g.rho_init > 0, thick.astype(np.int32), 0)


def compute_case4_state(g: Grid, ad: AtomicData, units: Units):
    """Solve LTE populations for every cell and return the transport
    tables (levelpops [nmodel, nlevels] f32, kff_base [nmodel]).

    Side effect: updates ``g.nne`` (free electron density).

    kff_base folds in everything except the frequency dependence:
        chi_ff(nu) = kff_base * (nu/1e15)^-3 * (1 - e^(-h nu / k Te))
    per simulation length (calculate_kappa_ff, rpkt.cc:1027-1073 with
    the 1e-45 = (1e15)^-3 frequency scale and x_unit folded in to keep
    float32 in range).
    """
    nd = lte.elem_numberdens_from_massfracs(ad, g.rho, g.elem_abund)
    T = np.maximum(g.Te, 1.0)
    pops = lte.solve_lte_populations(ad, nd, T)
    g.nne = pops.nne
    nl = lte.level_populations(ad, pops, T)

    charges = np.array([ad.ion_stage[i] - 1
                        for i in range(ad.nions_total)], dtype=np.float64)
    z2n = pops.ion_numberdens @ (charges**2)
    kff_base = (3.69255e8 / np.sqrt(T) * pops.nne * z2n
                * 1e-45 * units.x_unit)
    # free-free cooling rate density [erg/s/cm^3]
    # (calculate_cooling_rates, kpkt.cc:105-109)
    # PER-nne weight (all k-packet cooling channels are linear in nne;
    # relative selection only — see driver._tables / macroatom_device)
    g.cool_ff = 1.426e-27 * np.sqrt(T) * z2n
    return nl.astype(np.float32), kff_base, pops
