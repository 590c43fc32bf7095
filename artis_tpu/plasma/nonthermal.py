"""Non-thermal electron physics: the Spencer-Fano equation.

Rebuild of the reference's nonthermal solver (reference:
nonthermal.cc): fast leptons from radioactive decay degrade in energy
through Coulomb losses (heating), impact ionisation, and impact
excitation. The degradation spectrum y(E) solves the Spencer-Fano
integral equation (Kozma & Fransson 1992) discretised on a linear
energy grid as an upper-triangular-ish linear system
(solve_spencerfano, nonthermal.cc:2522-2713).

Implemented here as dense numpy linear algebra per cell (the
reference uses GSL LU on an SFPTS^2 matrix; SFPTS is configurable
and the solve vectorises trivially over cells via a batched loop).

Cross sections:
* electron loss rate: nonthermal.cc:820-840
* impact excitation: van Regemorter-like (Mewe 1972) or collision
  strengths, nonthermal.cc:842-930
* impact ionisation: Younger 1981 fits from reference-format
  collion.txt; Lotz (1967) formula as the built-in fallback
* secondary electron spectrum: Opal, Peterson & Beaty (1971),
  nonthermal.cc:978-1010
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from ..atomic import AtomicData
from ..constants import EV, H, ME, PI, QE, H_ionpot

A_NAUGHT_SQUARED = 2.800285203e-17  # Bohr radius squared [cm^2]


NT_MAX_AUGER_ELECTRONS = 2  # artisoptions NT_MAX_AUGER_ELECTRONS


@dataclasses.dataclass
class CollIonRow:
    Z: int
    nelec: int  # electrons before ionisation (Z - ionstage + 1)
    ionpot_ev: float
    A: float
    B: float
    C: float
    D: float
    n: int = -1  # shell principal quantum number
    l: int = -1  # shell angular momentum
    # Auger data (Kaastra & Mewe 1993; read_auger_data,
    # nonthermal.cc:255-385): probability of ejecting 0..NMAX extra
    # electrons when this shell is ionised, and the mean Auger
    # electron kinetic energy
    prob_num_auger: tuple = (1.0,) + (0.0,) * NT_MAX_AUGER_ELECTRONS
    en_auger_ev: float = 0.0
    n_auger_elec_avg: float = 0.0
    auger_g_accumulated: float = 0.0


def read_collion(path: str) -> list[CollIonRow]:
    """Parse reference-format collion.txt (Arnaud & Rothenflug /
    Younger fit parameters; nonthermal.cc collion reading)."""
    rows = []
    with open(os.path.join(path, "collion.txt")) as f:
        toks = f.read().split()
    n = int(toks[0])
    pos = 1
    for _ in range(n):
        z, nelec, _n, _l = (int(v) for v in toks[pos:pos + 4])
        ionpot, a, b, c, d = (float(v) for v in toks[pos + 4:pos + 9])
        pos += 9
        rows.append(CollIonRow(Z=z, nelec=nelec, ionpot_ev=ionpot,
                               A=a, B=b, C=c, D=d, n=_n, l=_l))
    return rows


# X-ray notation shells K L1 L2 L3 M1 M2 M3 -> (n, l, g=2j+1)
# (read_auger_data, nonthermal.cc:262-264)
_XRAY_N = (1, 2, 2, 2, 3, 3, 3)
_XRAY_L = (0, 0, 1, 1, 0, 1, 1)
_XRAY_G = (2, 2, 2, 4, 2, 2, 4)


def read_auger_data(path: str, rows: list[CollIonRow],
                    nmax: int = NT_MAX_AUGER_ELECTRONS) -> int:
    """Read auger-km1993-table2.txt and attach Auger-electron
    probabilities / energies to the matching collion shells
    (read_auger_data, nonthermal.cc:255-385).  Fixed-width format:
    'ZZ SS N IIIII.I EEEEE.E eeeee' then nine 5-char probability
    fields (P(n_Auger) x 1e4 for n = 0..8).  Returns the number of
    shells that received data."""
    fname = os.path.join(path, "auger-km1993-table2.txt")
    if not os.path.exists(fname):
        return 0
    applied = 0
    with open(fname) as f:
        for line in f:
            if len(line) < 31 or line.lstrip().startswith("#"):
                continue
            head = line[:26].split()
            if len(head) < 6:
                continue
            Z, ionstage, shellnum = (int(v) for v in head[:3])
            ionpot_ev = float(head[3])
            en_auger_total = float(head[4])
            epsilon_e3 = int(head[5])
            if not (1 <= shellnum <= 7):
                continue
            probs = np.zeros(nmax + 1)
            n_avg = 0.0
            for a in range(9):
                s = line[26 + a * 5:31 + a * 5].strip() or "0"
                p = int(s) / 10000.0
                n_avg += a * p
                probs[min(a, nmax)] += p
            # en_auger corrected for radiative (fluorescence) losses
            en_auger_ev = en_auger_total - epsilon_e3 / 1000.0 * ionpot_ev
            if not np.isfinite(en_auger_ev) or en_auger_ev < 0:
                en_auger_ev = 0.0
            n_shell = _XRAY_N[shellnum - 1]
            l_shell = _XRAY_L[shellnum - 1]
            g = _XRAY_G[shellnum - 1]
            for r in rows:
                if (r.Z == Z and r.nelec == Z - ionstage + 1
                        and r.n == n_shell and r.l == l_shell):
                    # statistical-weight average when several x-ray
                    # shells map to one (n, l) (e.g. L2+L3)
                    ow = r.auger_g_accumulated / (g + r.auger_g_accumulated)
                    nw = g / (g + r.auger_g_accumulated)
                    r.auger_g_accumulated += g
                    r.en_auger_ev = ow * r.en_auger_ev + nw * en_auger_ev
                    r.n_auger_elec_avg = (ow * r.n_auger_elec_avg
                                          + nw * n_avg)
                    r.prob_num_auger = tuple(
                        ow * np.asarray(r.prob_num_auger) + nw * probs)
                    applied += 1
    return applied


def lotz_collion(ad: AtomicData) -> list[CollIonRow]:
    """Fallback ionisation fits: Lotz (1967) sigma = 4.5e-14 ln(u)/(u I^2)
    per outermost shell, expressed in the Younger parameterisation
    (A=B=D=0, C=4.5)."""
    rows = []
    for i in range(ad.nions_total):
        e = ad.ion_element[i]
        z = int(ad.elem_z[e])
        stage = int(ad.ion_stage[i])
        rows.append(CollIonRow(Z=z, nelec=z - stage + 1,
                               ionpot_ev=float(ad.ion_ionpot[i] / EV),
                               A=0.0, B=0.0, C=4.5, D=0.0))
    return rows


def electron_loss_rate(energy_erg: np.ndarray, nne) -> np.ndarray:
    """-dE/dx for fast electrons [erg/cm] (nonthermal.cc:820-840).

    ``nne`` may be a scalar or an array broadcastable against
    ``energy_erg`` (e.g. [B, 1] against [1, sfpts] for a batched
    per-cell evaluation)."""
    e = np.asarray(energy_erg, dtype=np.float64)
    nne = np.maximum(np.asarray(nne, dtype=np.float64), 1e-10)
    omegap = np.sqrt(4 * PI * nne * QE**2 / ME)
    zetae = H * omegap / 2 / PI
    v = np.sqrt(2 * np.maximum(e, 1e-30) / ME)
    eulergamma = 0.577215664901532
    hi = nne * 2 * PI * QE**4 / np.maximum(e, 1e-30) \
        * np.log(2 * np.maximum(e, 1e-30) / zetae)
    lo = nne * 2 * PI * QE**4 / np.maximum(e, 1e-30) \
        * np.log(ME * v**3 / (eulergamma * QE**2 * omegap))
    out = np.where(e > 14 * EV, hi, lo)
    return np.where(e > 0, np.maximum(out, 0.0), 0.0)


def xs_impact_ionization(en_ev: np.ndarray, row: CollIonRow) -> np.ndarray:
    """Younger 1981 fit [cm^2] (xs_impactionization,
    nonthermal.cc:931-950)."""
    u = en_ev / row.ionpot_ev
    with np.errstate(divide="ignore", invalid="ignore"):
        xs = 1e-14 * (row.A * (1 - 1 / u) + row.B * (1 - 1 / u) ** 2
                      + row.C * np.log(np.maximum(u, 1e-10))
                      + row.D * np.log(np.maximum(u, 1e-10)) / u) \
            / (u * row.ionpot_ev**2)
    return np.where(u > 1.0, np.maximum(xs, 0.0), 0.0)


def _get_J(Z: int, ionstage: int, ionpot_ev: float) -> float:
    """Opal et al. 1971 secondary-spectrum shape parameter [eV]
    (get_J, nonthermal.cc:1012-1026)."""
    if ionstage == 1:
        if Z == 2:
            return 15.8
        if Z == 10:
            return 24.2
        if Z == 18:
            return 10.0
    return 0.6 * ionpot_ev


@dataclasses.dataclass
class SFSolution:
    """Per-cell Spencer-Fano solution analysis."""
    frac_heating: np.ndarray  # [ncells]
    frac_ionization: np.ndarray
    frac_excitation: np.ndarray
    # NT ionisation rate coefficient per (cell, ion) [1/s] per target
    # atom, scaled to unit deposition rate density; multiply by the
    # cell's deposition rate density [erg/s/cm^3]
    ion_rate_per_dep: np.ndarray  # [ncells, nions]
    E_init_ev: float
    # per-line deposition fraction of the NT excitation channel for
    # the solver's exc_lines subset (frac_excitations_list,
    # nonthermal.cc:2140-2258); rows sum to frac_excitation
    exc_frac: Optional[np.ndarray] = None  # [ncells, nexc]
    y: Optional[np.ndarray] = None  # [ncells, SFPTS] (diagnostics)
    # Auger multi-electron probabilities per ionisation of each ion
    # (rate-weighted over shells; calculate_eff_ionpot,
    # nonthermal.cc:1440-1545): P(a extra electrons), a = 0..NMAX,
    # and its energy-weighted companion used for energy-weighted
    # upper-ion selection (nt_random_upperion, nonthermal.cc:1657)
    prob_num_auger: Optional[np.ndarray] = None  # [ncells,nions,NMAX+1]
    ionenfrac_num_auger: Optional[np.ndarray] = None  # same shape


class SpencerFanoSolver:
    def __init__(self, ad: AtomicData, sfpts: int = 512,
                 emin_ev: float = 1.0, emax_ev: float = 3000.0,
                 colliondata: Optional[list[CollIonRow]] = None,
                 max_excitation_lines: int = 1000):
        self.ad = ad
        self.sfpts = sfpts
        self.en = np.linspace(emin_ev, emax_ev, sfpts)  # eV
        self.de = self.en[1] - self.en[0]
        self.emin, self.emax = emin_ev, emax_ev
        self.collion = colliondata or lotz_collion(ad)
        self.max_excitation_lines = max_excitation_lines

        # source: electrons injected uniformly over the top ~3% of the
        # grid (solve_spencerfano source setup, nonthermal.cc:565-580)
        spread = int(np.ceil(sfpts * 0.03333))
        src = np.zeros(sfpts)
        src[-spread:] = 1.0 / (self.de * spread)
        self.source = src
        self.E_init_ev = float(np.sum(self.en * src) * self.de)
        # rhs_i = integral of source from E_i to EMAX
        self.rhs = np.array([np.sum(src[i + 1:]) * self.de
                             for i in range(sfpts)])

        # precompute per-line excitation cross sections on the grid
        self._prep_excitation()
        self._prep_ionization()

        # solution-reuse state (nonthermal.cc:2559-2581): keep a
        # cell's previous solution while nne-per-ion drifted less
        # than max_fracdiff and the last solve is recent enough
        self._last: Optional[SFSolution] = None
        self._last_nneperion: Optional[np.ndarray] = None
        self._ts_last_solved: Optional[np.ndarray] = None

    def _prep_excitation(self):
        ad = self.ad
        lo, up = ad.line_lower, ad.line_upper
        eps_ev = (ad.level_energy[up] - ad.level_energy[lo]) / EV
        usable = (eps_ev > self.emin) & (
            (ad.line_coll_str >= 0) | (~ad.line_forbidden))
        idx = np.nonzero(usable)[0]
        # keep the strongest transitions (by oscillator strength) to
        # bound the matrix-assembly cost (the reference caps upper
        # levels via NTEXCITATION_MAXNLEVELS, nonthermal.cc:2290-2341)
        self.n_excitation_dropped = 0
        if len(idx) > self.max_excitation_lines:
            order = np.argsort(-ad.line_f[idx])
            self.n_excitation_dropped = (len(idx)
                                         - self.max_excitation_lines)
            dropped_f = float(ad.line_f[idx[order[
                self.max_excitation_lines:]]].sum())
            kept_f = float(ad.line_f[idx[order[
                :self.max_excitation_lines]]].sum())
            print(f"SpencerFano: keeping {self.max_excitation_lines} "
                  f"of {len(idx)} excitation lines "
                  f"(dropped oscillator-strength fraction "
                  f"{dropped_f / max(kept_f + dropped_f, 1e-300):.3e})")
            idx = idx[order[:self.max_excitation_lines]]
        self.exc_lines = idx
        self.exc_eps_ev = eps_ev[idx]
        en = self.en
        xs = np.zeros((len(idx), self.sfpts))
        for k, l in enumerate(idx):
            eps = eps_ev[l] * EV
            if ad.line_coll_str[l] >= 0:
                const = (H_ionpot**2 / ad.level_g[lo[l]]
                         * ad.line_coll_str[l] * PI * A_NAUGHT_SQUARED)
                xs[k] = const / (en * EV) ** 2
            else:
                U = en * EV / eps
                g_bar = 0.28 * np.log(np.maximum(U, 1.0001)) + 0.15
                xs[k] = (45.585750051 * A_NAUGHT_SQUARED
                         * (H_ionpot / eps) ** 2 * ad.line_f[l]
                         * g_bar / U)
            xs[k] = np.where(en * EV >= eps, np.maximum(xs[k], 0.0), 0.0)
        self.exc_xs = xs  # [nlines_used, SFPTS]
        # line widths in grid steps for the diagonal-band fill
        self.exc_w = np.minimum(np.maximum(
            np.rint(self.exc_eps_ev / self.de).astype(int), 1),
            self.sfpts)

    def _prep_ionization(self):
        """Precompute static per-collion-row arrays used by the batched
        matrix assembly and the solution analysis (the per-row cross
        sections and Auger probabilities are cell-independent; only the
        ion number densities vary per cell)."""
        ad = self.ad
        key2ion = {}
        for i in range(ad.nions_total):
            z = int(ad.elem_z[ad.ion_element[i]])
            stage = int(ad.ion_stage[i])
            key2ion[(z, z - stage + 1)] = i
        rows = [r for r in self.collion if (r.Z, r.nelec) in key2ion]
        self.ion_rows = rows
        namax = NT_MAX_AUGER_ELECTRONS
        if rows:
            self.row_ion = np.array(
                [key2ion[(r.Z, r.nelec)] for r in rows], int)
            self.row_ionpot = np.array([r.ionpot_ev for r in rows])
            self.row_pa = np.array([r.prob_num_auger for r in rows])
            self.row_xs = np.stack(
                [xs_impact_ionization(self.en, r) for r in rows])
            # rows entering the SF matrix (matches the single-cell
            # builder: shells with ionpot below the grid are analysed
            # but not added to the degradation matrix)
            self.row_in_matrix = self.row_ionpot >= self.emin
        else:
            self.row_ion = np.zeros(0, int)
            self.row_ionpot = np.zeros(0)
            self.row_pa = np.zeros((0, namax + 1))
            self.row_xs = np.zeros((0, self.sfpts))
            self.row_in_matrix = np.zeros(0, bool)
        # row -> ion one-hot for per-ion reductions
        self.row_onehot = np.zeros((len(rows), ad.nions_total))
        if len(rows):
            self.row_onehot[np.arange(len(rows)), self.row_ion] = 1.0
        # lazy cache of the cell-independent per-ion ionisation
        # matrices K_ion (sum over that ion's shells); only kept when
        # the total fits a modest memory budget
        self._K_ion_cache: Optional[dict] = None
        self._K_stack: Optional[np.ndarray] = None  # [nion, sfpts^2]
        n_ions_with_rows = len(set(self.row_ion[self.row_in_matrix]))
        if n_ions_with_rows * self.sfpts**2 * 8 <= 1.5e9:
            self._K_ion_cache = {}

    def _ionization_K(self, row: CollIonRow) -> np.ndarray:
        """Cell-independent SF-matrix contribution of one collion
        shell, to be scaled by the cell's ion number density
        (sfmatrix_add_ionization, nonthermal.cc:2343-2460)."""
        en, de, sfpts = self.en, self.de, self.sfpts
        I = row.ionpot_ev
        J = _get_J(row.Z, row.Z - row.nelec + 1, I)
        xs = xs_impact_ionization(en, row)
        with np.errstate(divide="ignore", invalid="ignore"):
            eps_up = np.minimum((en + I) / 2, en)
            int_eps_upper = np.arctan((eps_up - I) / J)
            denom = np.arctan((en - I) / 2 / J)
            pref = np.where(denom > 0, xs / denom, 0.0)
        EN_I, EN_J = np.meshgrid(en, en, indexing="ij")
        eps_lower = np.maximum(EN_J - EN_I, I)
        iel = np.arctan((eps_lower - I) / J)
        K = np.where(EN_J >= EN_I,
                     pref[None, :] * np.maximum(
                         int_eps_upper[None, :] - iel, 0.0) * de, 0.0)
        iel2 = np.arctan(EN_I / J)
        K -= np.where(EN_J >= 2 * EN_I + I,
                      pref[None, :] * np.maximum(
                          int_eps_upper[None, :] - iel2, 0.0) * de, 0.0)
        if row.en_auger_ev > 0.0:
            K -= np.where((EN_I < row.en_auger_ev) & (EN_J >= EN_I),
                          xs[None, :], 0.0)
        return K

    # -- matrix assembly ---------------------------------------------
    def _build_matrices(self, nne: np.ndarray, levelpops: np.ndarray,
                        ion_numberdens: np.ndarray) -> np.ndarray:
        """Batched SF matrix assembly: M [B, sfpts, sfpts] for B cells
        at once.  All physics contributions are linear in per-cell
        densities, so the expensive [sfpts, sfpts] shapes are built
        once (per collion shell / per line-width diagonal) and scaled
        into the batch, instead of per cell (replaces the reference's
        per-cell sfmatrix assembly, nonthermal.cc:2282-2460)."""
        B = len(nne)
        sfpts, en, de = self.sfpts, self.en, self.de
        ad = self.ad
        M = np.zeros((B, sfpts, sfpts))

        # continuous energy loss (diagonal), batched over cells
        diag = electron_loss_rate(en[None, :] * EV,
                                  np.asarray(nne)[:, None]) / EV
        M[:, np.arange(sfpts), np.arange(sfpts)] += diag

        # impact excitation: lines grouped by band width w; for each
        # diagonal offset d, every line with w > d contributes
        # de * nnlevel * xs on that diagonal.  Sweep d from widest to
        # 0, accumulating group contributions into a running sum.
        if len(self.exc_lines):
            nl_exc = np.maximum(
                levelpops[:, ad.line_lower[self.exc_lines]], 0.0)
            widths = self.exc_w
            w_vals = np.unique(widths)[::-1]  # descending
            S = np.zeros((B, sfpts))
            gi = 0
            jj = np.arange(sfpts)
            for d in range(int(w_vals[0]) - 1, -1, -1):
                while gi < len(w_vals) and w_vals[gi] > d:
                    sel = widths == w_vals[gi]
                    S += nl_exc[:, sel] @ self.exc_xs[sel]
                    gi += 1
                j = jj[d:]
                M[:, j - d, j] += de * S[:, j]

        # impact ionisation: per-ion cell-independent matrices scaled
        # by the cell's ion number density. All ions are applied in
        # ONE [B, nion] @ [nion, sfpts^2] GEMM — the per-ion
        # broadcast-accumulate (M += scale * K_i) was the assembly
        # hotspot (~5 s at 96 cells x 11 ions, pure memory traffic).
        use = self.row_in_matrix
        ions = (np.unique(self.row_ion[use]) if len(self.row_ion)
                else np.zeros(0, int))
        if len(ions):
            K_stack = getattr(self, "_K_stack", None)
            if K_stack is None:
                K_stack = np.zeros((len(ions), sfpts * sfpts))
                for k, i in enumerate(ions):
                    K = None
                    if self._K_ion_cache is not None:
                        K = self._K_ion_cache.get(int(i))
                    if K is None:
                        K = np.zeros((sfpts, sfpts))
                        for r, row in enumerate(self.ion_rows):
                            if use[r] and self.row_ion[r] == i:
                                K += self._ionization_K(row)
                        if self._K_ion_cache is not None:
                            self._K_ion_cache[int(i)] = K
                    K_stack[k] = K.ravel()
                if self._K_ion_cache is not None:
                    self._K_stack = K_stack
            scale = ion_numberdens[:, ions]
            if np.any(scale > 0):
                M += (scale @ K_stack).reshape(B, sfpts, sfpts)
        return M

    def _build_matrix_ref(self, nne: float, levelpops_cell: np.ndarray,
                          ion_numberdens_cell: np.ndarray) -> np.ndarray:
        sfpts, en, de = self.sfpts, self.en, self.de
        ad = self.ad
        M = np.zeros((sfpts, sfpts))

        # continuous energy loss (diagonal)
        M[np.arange(sfpts), np.arange(sfpts)] += \
            electron_loss_rate(en * EV, nne) / EV

        # impact excitation (sfmatrix_add_excitation,
        # nonthermal.cc:2282-2341): for each line, y(E') loses
        # electrons from E' in [E, E + eps)
        for k, l in enumerate(self.exc_lines):
            nnlevel = levelpops_cell[ad.line_lower[l]]
            if nnlevel <= 0:
                continue
            w = max(int(round(self.exc_eps_ev[k] / de)), 1)
            contrib = nnlevel * self.exc_xs[k] * de
            for d in range(min(w, sfpts)):
                j = np.arange(d, sfpts)
                M[j - d, j] += contrib[j]

        # impact ionisation (sfmatrix_add_ionization,
        # nonthermal.cc:2343-2460) with the Opal secondary spectrum
        ion_lookup = {}
        for i in range(ad.nions_total):
            z = int(ad.elem_z[ad.ion_element[i]])
            stage = int(ad.ion_stage[i])
            ion_lookup[(z, z - stage + 1)] = ion_numberdens_cell[i]
        EN_I, EN_J = np.meshgrid(en, en, indexing="ij")
        for row in self.collion:
            nnion = ion_lookup.get((row.Z, row.nelec), 0.0)
            if nnion <= 0 or row.ionpot_ev < self.emin:
                continue
            I = row.ionpot_ev
            J = _get_J(row.Z, row.Z - row.nelec + 1, I)
            xs = xs_impact_ionization(en, row)
            with np.errstate(divide="ignore", invalid="ignore"):
                eps_up = np.minimum((en + I) / 2, en)
                int_eps_upper = np.arctan((eps_up - I) / J)
                denom = np.arctan((en - I) / 2 / J)
                pref = np.where(denom > 0, xs * nnion / denom, 0.0)
            # first integral: E' from E up; eps_lower = max(E'-E, I)
            eps_lower = np.maximum(EN_J - EN_I, I)
            iel = np.arctan((eps_lower - I) / J)
            term = pref[None, :] * np.maximum(
                int_eps_upper[None, :] - iel, 0.0) * de
            term = np.where(EN_J >= EN_I, term, 0.0)
            M += term
            # second integral (secondary electron production):
            # E' >= 2E + I
            iel2 = np.arctan(EN_I / J)
            term2 = pref[None, :] * np.maximum(
                int_eps_upper[None, :] - iel2, 0.0) * de
            term2 = np.where(EN_J >= 2 * EN_I + I, term2, 0.0)
            M -= term2
            # Auger electrons born at en_auger_ev act as production
            # for all rows below that energy (SF_AUGER_CONTRIBUTION_ON,
            # sfmatrix_add_ionization, nonthermal.cc:2424-2456; the
            # reference's non-distributed mode, no de factor)
            if row.en_auger_ev > 0.0:
                auger_rows = (EN_I < row.en_auger_ev) & (EN_J >= EN_I)
                M -= np.where(auger_rows, nnion * xs[None, :], 0.0)
        return M

    # -- solve + analysis --------------------------------------------
    def solve(self, nne: np.ndarray, levelpops: np.ndarray,
              ion_numberdens: np.ndarray,
              store_y: bool = False, timestep: Optional[int] = None,
              max_ts_between_solutions: int = 0,
              max_fracdiff_nneperion: float = 0.05) -> SFSolution:
        """Solve for every cell and analyse the energy deposition
        fractions (analyse_sf_solution, nonthermal.cc:1996-2460).

        With ``timestep`` given, a cell keeps its previous solution
        when |nne_per_ion / last - 1| < ``max_fracdiff_nneperion`` and
        the last solve is at most ``max_ts_between_solutions``
        timesteps old (solve_spencerfano reuse policy,
        nonthermal.cc:2559-2581; SF_MAX_TIMESTEPS_BETWEEN_SOLUTIONS /
        NT_MAX_FRACDIFF_NNEPERION_BETWEEN_SOLUTIONS)."""
        ncells = len(nne)
        nneperion = self.nneperion(nne, ion_numberdens)
        reuse = (np.zeros(ncells, bool) if store_y
                 else self.reuse_mask(nneperion, timestep,
                                      max_ts_between_solutions,
                                      max_fracdiff_nneperion))
        ad = self.ad
        en, de = self.en, self.de
        namax = NT_MAX_AUGER_ELECTRONS
        frac_heat = np.zeros(ncells)
        frac_ion = np.zeros(ncells)
        frac_exc = np.zeros(ncells)
        exc_frac = np.zeros((ncells, len(self.exc_lines)))
        ion_rate = np.zeros((ncells, ad.nions_total))
        prob_auger = np.zeros((ncells, ad.nions_total, namax + 1))
        enfrac_auger = np.zeros((ncells, ad.nions_total, namax + 1))
        prob_auger[:, :, 0] = 1.0
        enfrac_auger[:, :, 0] = 1.0
        ys = np.zeros((ncells, self.sfpts)) if store_y else None

        nne_arr = np.asarray(nne, np.float64)
        frac_heat[nne_arr <= 0] = 1.0
        if reuse.any():
            last = self._last
            frac_heat[reuse] = last.frac_heating[reuse]
            frac_ion[reuse] = last.frac_ionization[reuse]
            frac_exc[reuse] = last.frac_excitation[reuse]
            exc_frac[reuse] = last.exc_frac[reuse]
            ion_rate[reuse] = last.ion_rate_per_dep[reuse]
            prob_auger[reuse] = last.prob_num_auger[reuse]
            enfrac_auger[reuse] = last.ionenfrac_num_auger[reuse]

        solve_idx = np.nonzero(~reuse & (nne_arr > 0))[0]
        # block over cells so the [B, sfpts, sfpts] batch stays within
        # a fixed memory budget (sfpts=4096 -> 3 cells per block)
        blk = max(1, int(3e9 // (self.sfpts**2 * 8)))
        from scipy.linalg import solve_triangular
        for s in range(0, len(solve_idx), blk):
            cells = solve_idx[s:s + blk]
            M = self._build_matrices(nne_arr[cells], levelpops[cells],
                                     ion_numberdens[cells])
            # the SF matrix is exactly upper triangular (every
            # process moves electrons DOWN in energy), so LU
            # factorisation is unnecessary: one back-substitution
            # per cell (replaces GSL LU, sfmatrix_solve,
            # nonthermal.cc:2461-2520)
            y = np.stack([solve_triangular(M[b], self.rhs, lower=False,
                                           check_finite=False)
                          for b in range(len(cells))])
            if store_y:
                ys[cells] = y

            # fractions (Kozma & Fransson 1992 eqs 13-15)
            # excitation: sum_lines int y xs eps n_l dE / E_init,
            # kept per line for the transport-channel selection
            # (frac_excitations_list, nonthermal.cc:2140-2258)
            nnl_exc = np.maximum(
                levelpops[cells][:, ad.line_lower[self.exc_lines]],
                0.0)
            exc_frac[cells] = (nnl_exc * self.exc_eps_ev
                               * (y @ self.exc_xs.T) * de) \
                / self.E_init_ev
            frac_exc[cells] = exc_frac[cells].sum(axis=1)

            if len(self.ion_rows):
                # per-(cell, shell) ionisation rate per target ion per
                # unit deposition (analyse_sf_solution + eff-ionpot
                # Auger analysis, nonthermal.cc:1996-2460, 1440-1545);
                # shells of ions absent from the cell are skipped
                nnion_rows = ion_numberdens[cells][:, self.row_ion]
                R = (y @ self.row_xs.T) * de * (nnion_rows > 0)
                frac_ion[cells] = (nnion_rows * self.row_ionpot
                                   * R).sum(axis=1) / self.E_init_ev
                ion_rate[cells] = (R @ self.row_onehot
                                   / self.E_init_ev / EV)
                w_rate = np.einsum("br,ra,ri->bia", R, self.row_pa,
                                   self.row_onehot)
                w_eta = np.einsum("br,r,ra,ri->bia", R,
                                  self.row_ionpot, self.row_pa,
                                  self.row_onehot)
                w_rate_tot = R @ self.row_onehot
                w_eta_tot = (R * self.row_ionpot) @ self.row_onehot
                # normalise to per-ion Auger probabilities, folding
                # multi-ionisations past the element's top ion into
                # the highest reachable stage (nonthermal.cc:1492-1527)
                for i in range(ad.nions_total):
                    e = ad.ion_element[i]
                    top = int(ad.elem_ion_start[e + 1]) - 1
                    if i >= top:  # no upper ion: keep the a=0 default
                        continue
                    m = w_rate_tot[:, i] > 0
                    if not m.any():
                        continue
                    p = w_rate[m, i] / w_rate_tot[m, i, None]
                    q = w_eta[m, i] / w_eta_tot[m, i, None]
                    a_cap = top - i - 1  # max extra electrons
                    if a_cap < namax:
                        p[:, a_cap] += p[:, a_cap + 1:].sum(axis=1)
                        q[:, a_cap] += q[:, a_cap + 1:].sum(axis=1)
                        p[:, a_cap + 1:] = 0.0
                        q[:, a_cap + 1:] = 0.0
                    prob_auger[cells[m], i] = p
                    enfrac_auger[cells[m], i] = q
            frac_heat[cells] = np.maximum(
                0.0, 1.0 - frac_ion[cells] - frac_exc[cells])

        sol = SFSolution(frac_heating=frac_heat,
                         frac_ionization=frac_ion,
                         frac_excitation=frac_exc,
                         ion_rate_per_dep=ion_rate,
                         E_init_ev=self.E_init_ev,
                         exc_frac=exc_frac, y=ys,
                         prob_num_auger=prob_auger,
                         ionenfrac_num_auger=enfrac_auger)
        self.commit(sol, nneperion, ~reuse, timestep)
        return sol

    def nneperion(self, nne, ion_numberdens) -> np.ndarray:
        return np.asarray(nne, np.float64) / np.maximum(
            np.asarray(ion_numberdens, np.float64).sum(axis=1), 1e-300)

    def reuse_mask(self, nneperion: np.ndarray,
                   timestep: Optional[int],
                   max_ts_between_solutions: int,
                   max_fracdiff_nneperion: float) -> np.ndarray:
        """Solution-reuse gate (solve_spencerfano reuse policy,
        nonthermal.cc:2559-2581): a cell keeps its previous solution
        when nne-per-ion moved less than the tolerance and the last
        solve is recent enough.  Exposed so the rank-distributed
        wrapper (plasma.sharded.solve_sf_sharded) can gate before
        splitting the fresh solves over ranks."""
        ncells = len(nneperion)
        if (timestep is None or self._last is None
                or self._last_nneperion is None
                or len(self._last_nneperion) != ncells):
            return np.zeros(ncells, bool)
        fracdiff = np.abs(
            self._last_nneperion / np.maximum(nneperion, 1e-300) - 1.0)
        return ((fracdiff < max_fracdiff_nneperion)
                & (timestep - self._ts_last_solved
                   <= max_ts_between_solutions)
                & (self._ts_last_solved >= 0))

    def commit(self, sol: "SFSolution", nneperion: np.ndarray,
               solved: np.ndarray, timestep: Optional[int]) -> None:
        """Record a full-batch solution for the reuse policy."""
        if timestep is None:
            return
        ncells = len(nneperion)
        if (self._ts_last_solved is None
                or len(self._ts_last_solved) != ncells):
            self._ts_last_solved = np.full(ncells, -1)
            self._last_nneperion = np.zeros(ncells)
        self._ts_last_solved[solved] = timestep
        self._last_nneperion[solved] = nneperion[solved]
        self._last = sol
