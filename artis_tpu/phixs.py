"""Photoionisation cross-section data (bound-free continua).

Rebuild of the reference's phixs layer (reference: input.cc:235-530
``read_phixs_data`` and the phixslist construction input.cc:1439-1654)
as a packed container: one entry per ionising level, cross sections
tabulated on the shared frequency grid x = nu/nu_edge in
[1, 1 + inc*(NP-1)].

Probability-split targets (upperlevel < 0 tables) expand into one
continuum entry per target with prob-scaled cross sections — the flat
analogue of the reference's per-phixstargetindex rate tables
(ratecoeff.cc:607-611).

A reference-format ``phixsdata_v2.txt`` parser and a hydrogenic
synthetic generator (for tests, since the real dataset is an external
download) are provided.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .atomic import AtomicData
from .constants import EV, H


@dataclasses.dataclass
class PhixsData:
    """Bound-free continua sorted by ascending edge frequency
    (the reference's ``allcont`` ordering, input.cc:1439-1654)."""
    nphixspoints: int
    nuincrement: float  # grid spacing in nu/nu_edge
    cont_level: np.ndarray  # [nc] global level index (lower, ionising)
    cont_upperion: np.ndarray  # [nc] ion index of the upper ion
    cont_upperlevel: np.ndarray  # [nc] global level index of the target
    cont_nu_edge: np.ndarray  # [nc] threshold frequency [Hz]
    cont_sigma: np.ndarray  # [nc, NP] cross sections [cm^2]

    @property
    def ncont(self) -> int:
        return len(self.cont_level)

    @property
    def x_grid(self) -> np.ndarray:
        return 1.0 + self.nuincrement * np.arange(self.nphixspoints)

    @property
    def nu_max_factor(self) -> float:
        """nu_max/nu_edge of the last table point."""
        return 1.0 + self.nuincrement * (self.nphixspoints - 1)

    def sigma_at(self, icont, nu) -> np.ndarray:
        """sigma(nu) by linear interpolation on the x grid; 0 below the
        edge, highest-point power-law-free clamp above the table (the
        reference extrapolates as sigma_last * (nu_max/nu)^3;
        photoionization_crosssection_fromtable)."""
        x = nu / self.cont_nu_edge[icont]
        xg = self.x_grid
        sig = np.interp(x, xg, self.cont_sigma[icont])
        sig = np.where(x < 1.0, 0.0, sig)
        above = x > xg[-1]
        sig = np.where(above,
                       self.cont_sigma[icont][-1] * (xg[-1] / np.maximum(
                           x, 1e-10)) ** 3, sig)
        return sig

    def level_to_cont(self, nlevels: int) -> np.ndarray:
        """[nlevels] map from global level index to its continuum index
        (-1 if the level is not ionising)."""
        out = np.full(nlevels, -1, dtype=np.int32)
        out[self.cont_level] = np.arange(self.ncont, dtype=np.int32)
        return out


def make_hydrogenic_phixs(ad: AtomicData, nphixspoints: int = 100,
                          nuincrement: float = 0.1,
                          sigma0: float = 6e-18) -> PhixsData:
    """Synthetic hydrogen-like cross sections sigma = sigma0 (nu_e/nu)^3
    for every ionising level (levels below the ionisation potential of
    non-top ions), targeting the upper ion's ground level."""
    levels, upions, uplevels, edges, sigmas = [], [], [], [], []
    x = 1.0 + nuincrement * np.arange(nphixspoints)
    for e in range(ad.nelements):
        s, en = ad.elem_ion_start[e], ad.elem_ion_start[e + 1]
        for i in range(s, en - 1):
            ls, le = ad.ion_level_start[i], ad.ion_level_start[i + 1]
            upper_ground = ad.ion_level_start[i + 1]
            e_upper = ad.level_energy[upper_ground]
            for l in range(ls, le):
                thresh = e_upper - ad.level_energy[l]
                if thresh <= 0:
                    continue
                levels.append(l)
                upions.append(i + 1)
                uplevels.append(upper_ground)
                edges.append(thresh / H)
                sigmas.append(sigma0 * x ** -3.0)
    order = np.argsort(edges)
    return PhixsData(
        nphixspoints=nphixspoints, nuincrement=nuincrement,
        cont_level=np.array(levels, np.int32)[order],
        cont_upperion=np.array(upions, np.int32)[order],
        cont_upperlevel=np.array(uplevels, np.int32)[order],
        cont_nu_edge=np.array(edges, np.float64)[order],
        cont_sigma=np.array(sigmas, np.float64)[order],
    )


def read_phixs_data(path: str, ad: AtomicData) -> PhixsData:
    """Parse a reference-format phixsdata_v2.txt (input.cc:235-333).

    Probability-split target tables expand into one continuum
    entry per target with prob-scaled cross sections."""
    import os

    with open(os.path.join(path, "phixsdata_v2.txt")) as f:
        tok = f.read().split()
    pos = 0

    def nxt(n=1):
        nonlocal pos
        out = tok[pos:pos + n]
        pos += n
        return out

    npts = int(nxt()[0])
    inc = float(nxt()[0])

    # map (Z, ionstage) -> ion index
    ionmap = {}
    for i in range(ad.nions_total):
        z = int(ad.elem_z[ad.ion_element[i]])
        ionmap[(z, int(ad.ion_stage[i]))] = i

    levels, upions, uplevels, edges, sigmas = [], [], [], [], []
    while pos < len(tok):
        z, upstage, uplevel_in, lostage, lolevel_in = (
            int(v) for v in nxt(5))
        thresh_ev = float(nxt()[0])
        targets = []
        if uplevel_in < 0:
            ntarg = int(nxt()[0])
            for _ in range(ntarg):
                lvl, prob = nxt(2)
                targets.append((int(lvl), float(prob)))
        else:
            targets = [(uplevel_in, 1.0)]
        sigma = np.array([float(v) for v in nxt(npts)]) * 1e-18  # Mbarn

        loion = ionmap.get((z, lostage))
        upion = ionmap.get((z, upstage))
        if loion is None or upion is None:
            continue
        lolevel = lolevel_in - 1  # groundstate_index_in = 1
        if lolevel >= ad.ion_nlevels[loion]:
            continue
        # probability-split targets become separate continuum entries
        # with prob-scaled cross sections — exactly how the reference
        # unrolls phixstargetindex in its rate tables
        # (read_phixs_data_table, input.cc:136-232; rate scaling
        # `*= phixstargetprobability`, ratecoeff.cc:607-611)
        up_ground_e = ad.level_energy[ad.ion_level_start[upion]]
        for lvl_in, prob in targets:
            if prob <= 0:
                continue
            uplevel = lvl_in - 1
            if uplevel >= ad.ion_nlevels[upion]:
                uplevel = 0
            up_abs = ad.ion_level_start[upion] + uplevel
            # per-target threshold: the table's edge shifted by the
            # target's excitation energy (get_nu_threshold analogue)
            exc = max(0.0, float(ad.level_energy[up_abs] - up_ground_e))
            levels.append(ad.ion_level_start[loion] + lolevel)
            upions.append(upion)
            uplevels.append(up_abs)
            edges.append(thresh_ev * EV / H + exc / H)
            sigmas.append(sigma * prob)

    order = np.argsort(edges)
    return PhixsData(
        nphixspoints=npts, nuincrement=inc,
        cont_level=np.array(levels, np.int32)[order],
        cont_upperion=np.array(upions, np.int32)[order],
        cont_upperlevel=np.array(uplevels, np.int32)[order],
        cont_nu_edge=np.array(edges, np.float64)[order],
        cont_sigma=np.array(sigmas, np.float64)[order],
    )


def calibrate_recombination(ph: PhixsData, ad: AtomicData, path: str,
                            t_elec: float = 6000.0,
                            verbose: bool = True) -> int:
    """Scale photoionisation cross sections so each ion's total
    radiative recombination coefficient at ``t_elec`` matches the
    tabulated rates in ``recombrates.txt`` (read_recombrate_file,
    ratecoeff.cc:837-935; RECOMBCALIBRATION_T_ELEC).

    File format: blocks of "Z upperionstage nrows" followed by rows
    (log10 T_e, rrc_low_n, rrc_total); rrc_low_n < 0 means ignore.
    The interpolation weights follow the reference exactly
    (ratecoeff.cc:898-900, x weighting the bracketing rows in its
    reversed order). Returns the number of ions scaled. The scaling
    multiplies ``ph.cont_sigma`` rows in place, so every downstream
    consumer (bf opacity, photoionisation, alpha_sp, bf cooling and
    heating) sees the calibrated cross sections — matching the
    reference's scale_level_phixs."""
    import os

    fn = os.path.join(path, "recombrates.txt")
    if not os.path.exists(fn):
        return 0
    from .plasma import photoion as _pm

    log_te = np.log10(t_elec)
    with open(fn) as f:
        tok = f.read().split()
    pos = 0
    nscaled = 0
    Te1 = np.array([t_elec])
    ones = np.ones(1)
    while pos + 3 <= len(tok):
        z, upstage, nrows = (int(float(tok[pos + i])) for i in range(3))
        pos += 3
        rows = np.array([[float(tok[pos + 3 * i + j]) for j in range(3)]
                         for i in range(nrows)])
        pos += 3 * nrows
        below = rows[rows[:, 0] < log_te]
        above = rows[rows[:, 0] > log_te]
        if not len(below) or not len(above):
            continue
        rb = below[np.argmax(below[:, 0])]
        ra = above[np.argmin(above[:, 0])]
        x = (log_te - rb[0]) / (ra[0] - rb[0])
        # the reference's (reversed) lerp weights, kept for parity
        input_low_n = x * rb[1] + (1 - x) * ra[1]
        input_total = x * rb[2] + (1 - x) * ra[2]

        # ion index of the LOWER (recombining-to) ion
        loion = None
        for i in range(ad.nions_total):
            if (int(ad.elem_z[ad.ion_element[i]]) == z
                    and int(ad.ion_stage[i]) == upstage - 1):
                loion = i
                break
        if loion is None:
            continue
        sel = np.nonzero(ph.cont_upperion == loion + 1)[0]
        sel = sel[ph.cont_level[sel] >= ad.ion_level_start[loion]]
        sel = sel[ph.cont_level[sel] < ad.ion_level_start[loion + 1]]
        if not len(sel):
            continue

        def rrc_now():
            pir = _pm.compute_rates(ad, ph, Te1, Te1, ones, ones)
            return float(pir.alpha_sp[0, sel].sum())

        rrc = rrc_now()
        if rrc <= 0:
            continue
        if input_low_n >= 0:
            mult = input_low_n / rrc
            if 0.05 <= mult < 2.0:
                ph.cont_sigma[sel] *= mult
                rrc = rrc_now()
                nscaled += 1
        if rrc < input_total:
            # no superlevel treatment here: scale all levels
            # (ratecoeff.cc "There is no superlevel recombination"
            # branch)
            mult = input_total / rrc
            ph.cont_sigma[sel] *= mult
            nscaled += 1
            if verbose:
                print(f"recombrates: Z={z} ionstage {upstage}->"
                      f"{upstage - 1}: rrc {rrc:.3e} -> "
                      f"{input_total:.3e} (x{mult:.3f})")
    return nscaled
