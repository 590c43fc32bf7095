"""NLTE level populations: per-element statistical-equilibrium rate
matrix, solved for all cells at once.

Rebuild of the reference's NLTE population solver (reference:
nltepop.cc — matrix builders nltepop.cc:421-592, per-element solve
``solve_nlte_pops_element`` nltepop.cc:798, LU solve with refinement
``nltepop_matrix_solve`` nltepop.cc:679) redesigned for the TPU-native
framework:

* one dense rate matrix per (cell, element) over ALL levels of all of
  the element's ions, assembled vectorised from the shared
  bound-bound rate arrays (`macroatom.bound_bound_rates`) and the
  photoionisation/recombination coefficients (`photoion.compute_rates`)
  — the same physical rates the transport macro-atom samples, so
  transport and the population solve stay consistent by construction;
* the solve is a batched ``np.linalg.solve`` over cells (the
  reference's per-cell GSL LU decompositions, done one cell at a time
  per rank, become one batched host solve);
* superlevels, as in the reference (nltepop.cc:200-260, 392-417):
  levels above each ion's NLTE cap (LEVEL_IS_NLTE,
  artisoptions_nltenebular.h:29-33) fold into one matrix row, with
  member populations distributed in LTE at T_e
  (superlevel_boltzmann, nltepop.cc:1543-1555). This bounds the
  matrix dimension at reference-dataset scale (Fe has O(1e3) levels;
  a dense all-levels matrix per cell would not).

Statistical equilibrium for element E with levels i, j:
    sum_{j != i} n_j R(j->i)  -  n_i sum_{j != i} R(i->j) = 0
closed by the particle-conservation row  sum_i n_i = n_E
(replacing the ground-level row, as nltepop.cc:860-885 does).

Rates entering the matrix:
  bound-bound   R_exc + C_exc (up), R_deexc + C_deexc (down)
  ionisation    gamma_corr + C_ion (+ non-thermal ionisation when a
                Spencer-Fano solution is supplied; nltepop.cc:520-560)
  recombination nne * alpha_sp + C_rec
"""

from __future__ import annotations

import numpy as np

from ..atomic import AtomicData
from ..constants import KB
from . import macroatom as ma_mod

MINPOP = 1e-40

# NLTE level caps (LEVEL_IS_NLTE, artisoptions_nltenebular.h:29-33):
# levels up to index 80 are individually NLTE (Fe II: 197); levels
# above fold into the ion's superlevel
NLTE_CAP_DEFAULT = 80
NLTE_CAP_FEII = 197


def nlte_levels_cap(ad: AtomicData, ion: int) -> int:
    z = int(ad.elem_z[ad.ion_element[ion]])
    stage = int(ad.ion_stage[ion])
    return NLTE_CAP_FEII if (z == 26 and stage == 2) \
        else NLTE_CAP_DEFAULT


def solve_nlte_pops(ad: AtomicData, ph, pirates, levelpops: np.ndarray,
                    elem_numberdens: np.ndarray, Te, TR, W, nne,
                    t_mid: float, nt_ion_rate: np.ndarray | None = None,
                    radfield=None,
                    nt_ion_rate_ion: np.ndarray | None = None,
                    nt_auger_prob: np.ndarray | None = None,
                    jb_lu=None) -> np.ndarray:
    """Solve statistical equilibrium for every element in every cell.

    Parameters
    ----------
    levelpops : [ncells, nlevels] current populations (used for the
        Sobolev escape probabilities in the radiative rates, and as the
        fallback for cells whose matrix is singular).
    elem_numberdens : [ncells, nelements] element number densities.
    nt_ion_rate : optional [ncells, ncont] non-thermal ionisation rate
        per atom in the continuum's lower level [1/s].
    nt_ion_rate_ion : optional [ncells, nions] non-thermal ionisation
        rate coefficient Y_nt per atom of each ion [1/s]; applied from
        EVERY level of the ion to the upper ion's ground state, as the
        reference does (nltepop_matrix_add_nt_ionisation,
        nltepop.cc:566-592).
    nt_auger_prob : optional [ncells, nions, NAUGER+1] multi-electron
        probabilities P(a extra electrons) from the Spencer-Fano
        analysis; the NT rate is then distributed over the ground
        states of ion+1+a (the reference's Auger branch of
        nltepop_matrix_add_nt_ionisation).

    Returns [ncells, nlevels] float64 populations.
    """
    ncells = levelpops.shape[0]
    bb = ma_mod.bound_bound_rates(ad, levelpops, Te, TR, W, nne, t_mid,
                                  radfield=radfield, jb_lu=jb_lu)
    rate_up = bb["R_exc"] + bb["C_exc"]  # [ncells, nlines] per lower atom
    rate_down = bb["R_deexc"] + bb["C_deexc"]  # per upper atom

    nne_c = np.asarray(nne, np.float64)[:, None]
    if ph is not None and pirates is not None:
        ion_rate = pirates.gamma_corr + pirates.c_ion
        if nt_ion_rate is not None:
            ion_rate = ion_rate + nt_ion_rate
        rec_rate = nne_c * pirates.alpha_sp + pirates.c_rec
        cont_lo = ph.cont_level
        cont_up = ph.cont_upperlevel
    else:
        ion_rate = rec_rate = None
        cont_lo = cont_up = np.zeros(0, np.int32)

    out = np.array(levelpops, dtype=np.float64, copy=True)

    Te_arr = np.maximum(np.asarray(Te, np.float64), 1.0)
    for e in range(ad.nelements):
        i0, i1 = ad.elem_ion_start[e], ad.elem_ion_start[e + 1]
        l0, l1 = ad.ion_level_start[i0], ad.ion_level_start[i1]
        n = int(l1 - l0)
        if n <= 1:
            out[:, l0:l1] = elem_numberdens[:, e][:, None]
            continue

        # ---- superlevel folding (nltepop.cc:200-260, 392-417,
        # superlevel_boltzmann nltepop.cc:1543-1555): levels above
        # each ion's NLTE cap collapse into ONE matrix row, with the
        # member populations distributed in LTE at T_exc = T_e.
        # idx_of[l]   element-local level -> matrix index
        # w_sl[c, l]  outgoing-rate renormalisation (s_renorm):
        #             boltzmann_l / Z_superlevel for members, 1 else
        ion_of = np.repeat(
            np.arange(i0, i1),
            np.diff(ad.ion_level_start[i0:i1 + 1]))  # [n] global ion
        lev_in_ion = (np.arange(l0, l1)
                      - ad.ion_level_start[ion_of])
        cap = np.array([nlte_levels_cap(ad, i) for i in
                        range(i0, i1)])  # per-ion max NLTE level idx
        cap_of = cap[ion_of - i0]
        nlev_of = (ad.ion_level_start[ion_of + 1]
                   - ad.ion_level_start[ion_of])
        cap_of = np.minimum(cap_of, nlev_of - 1)
        is_sl = lev_in_ion > cap_of
        has_sl = np.array([bool(np.any(is_sl[ion_of == i]))
                           for i in range(i0, i1)])
        block = np.minimum(
            cap, np.diff(ad.ion_level_start[i0:i1 + 1]) - 1) + 1 \
            + has_sl.astype(int)
        base = np.concatenate([[0], np.cumsum(block)])
        nidx = int(base[-1])
        idx_of = base[ion_of - i0] + np.where(
            is_sl, cap_of + 1, lev_in_ion)
        w_sl = np.ones((ncells, n))
        if is_sl.any():
            E = ad.level_energy[l0:l1]
            gw = ad.level_g[l0:l1]
            # reference energy: the first superlevel member of the ion
            E_ref = np.zeros(n)
            for irel in range(i1 - i0):
                m = (ion_of - i0 == irel) & is_sl
                if m.any():
                    first = np.flatnonzero(m)[0]
                    E_ref[m] = E[first]
            b = np.where(
                is_sl[None, :],
                gw[None, :] * np.exp(-(E - E_ref)[None, :]
                                     / (KB * Te_arr[:, None])),
                0.0)
            # Z per (cell, ion): segment-sum over superlevel members
            Z = np.zeros((ncells, i1 - i0))
            np.add.at(Z.T, ion_of - i0, b.T)
            w_sl = np.where(is_sl[None, :],
                            b / np.maximum(Z[:, ion_of - i0], 1e-300),
                            1.0)

        # assemble M[c, to, from] as a flat [nidx*nidx, ncells]
        # scatter-add over matrix indices
        Mflat = np.zeros((nidx * nidx, ncells))

        def add(to_lvl, from_lvl, rates):
            # to_lvl/from_lvl: element-local LEVEL indices;
            # rates: [ncells, nk] per from-level atom. Outgoing rates
            # from superlevel members are weighted by the member's
            # LTE share of the superlevel population (s_renorm,
            # nltepop.cc:880-886)
            ti = idx_of[to_lvl]
            fi = idx_of[from_lvl]
            r = rates * w_sl[:, from_lvl]
            flat = ti.astype(np.int64) * nidx + fi
            np.add.at(Mflat, flat, r.T)
            # outgoing: subtract on the diagonal of the from column
            diag = fi.astype(np.int64) * nidx + fi
            np.add.at(Mflat, diag, -r.T)

        lm = np.flatnonzero((ad.line_lower >= l0) & (ad.line_lower < l1))
        if lm.size:
            lo = ad.line_lower[lm] - l0
            up = ad.line_upper[lm] - l0
            add(up, lo, rate_up[:, lm])
            add(lo, up, rate_down[:, lm])
        if ion_rate is not None:
            cm = np.flatnonzero((cont_lo >= l0) & (cont_lo < l1))
            if cm.size:
                clo = cont_lo[cm] - l0
                cup = cont_up[cm] - l0
                add(cup, clo, ion_rate[:, cm])
                add(clo, cup, rec_rate[:, cm])
        if nt_ion_rate_ion is not None:
            # non-thermal collisional ionisation: Y_nt from every level
            # of ion i to the ground state of ion i+1+a, distributed
            # over the Auger multi-electron probabilities when given
            # (nltepop_matrix_add_nt_ionisation, nltepop.cc:566-592)
            for i in range(i0, i1 - 1):
                s_l = ad.ion_level_start[i] - l0
                e_l = ad.ion_level_start[i + 1] - l0
                from_idx = np.arange(s_l, e_l)
                if nt_auger_prob is not None:
                    namax = nt_auger_prob.shape[2] - 1
                    for a in range(namax + 1):
                        up = min(i + 1 + a, i1 - 1)
                        up_gs = ad.ion_level_start[up] - l0
                        pa = nt_auger_prob[:, i, a]
                        if not np.any(pa > 0):
                            continue
                        to_idx = np.full(e_l - s_l, up_gs)
                        rates = (nt_ion_rate_ion[:, i] * pa)[:, None]                             * np.ones((1, e_l - s_l))
                        add(to_idx, from_idx,
                            np.ascontiguousarray(rates))
                else:
                    up_gs = ad.ion_level_start[i + 1] - l0
                    to_idx = np.full(e_l - s_l, up_gs)
                    rates = np.broadcast_to(
                        nt_ion_rate_ion[:, i][:, None],
                        (ncells, e_l - s_l))
                    add(to_idx, from_idx, np.ascontiguousarray(rates))

        M = Mflat.T.reshape(ncells, nidx, nidx)
        # particle conservation replaces the ground-level equation
        # (nltepop.cc:860-885); scale the constraint row to the matrix
        # magnitude so the LU pivoting stays well conditioned
        scale = np.maximum(np.abs(M).max(axis=(1, 2)), 1.0)
        M[:, 0, :] = scale[:, None]
        b = np.zeros((ncells, nidx))
        n_e = np.asarray(elem_numberdens[:, e], np.float64)
        b[:, 0] = scale * n_e

        ok = n_e > 0
        x = np.full((ncells, nidx), MINPOP)
        if np.any(ok):
            try:
                sol = np.linalg.solve(M[ok], b[ok][..., None])[..., 0]
            except np.linalg.LinAlgError:
                # a singular matrix must only downgrade ITS OWN cell
                # to the least-squares fallback (nltepop_matrix_solve
                # handles singularity per cell, nltepop.cc:679-778) —
                # np.linalg.solve raises for the whole stack, and a
                # batch-wide lstsq would change well-posed cells'
                # answers with the batch split (rcond truncation)
                def row_solve(Mi, bi):
                    try:
                        return np.linalg.solve(Mi, bi)
                    except np.linalg.LinAlgError:
                        return np.linalg.lstsq(Mi, bi, rcond=None)[0]
                sol = np.stack([row_solve(Mi, bi)
                                for Mi, bi in zip(M[ok], b[ok])])
            x[ok] = sol
        # negative populations indicate an unconverged radiative-rate
        # linearisation; floor them (nltepop.cc:973-1008 warns and
        # floors to MINPOP as well)
        bad = ~np.all(np.isfinite(x), axis=1)
        x = np.clip(x, MINPOP, None)
        # renormalise to exact particle conservation after flooring
        tot = x.sum(axis=1)
        x = x * np.where(ok & (tot > 0), n_e / np.maximum(tot, 1e-300),
                         1.0)[:, None]
        # expand matrix-index populations back to levels: superlevel
        # members share the superlevel population in LTE proportion
        # (nltepop.cc:985-1000: stored pop x superlevel_boltzmann)
        xl = x[:, idx_of] * w_sl
        # singular cells keep their previous (LTE) populations
        xl[bad] = np.maximum(out[bad, l0:l1], MINPOP)
        out[:, l0:l1] = np.where(ok[:, None], xl, MINPOP)
    return out


def nne_from_levelpops(ad: AtomicData, levelpops: np.ndarray) -> np.ndarray:
    """Free-electron density implied by a set of level populations
    (charge conservation over all ions; calculate_electron_densities,
    nltepop.cc / update_grid.cc)."""
    nl = np.asarray(levelpops, np.float64)
    nne = np.zeros(nl.shape[0])
    for i in range(ad.nions_total):
        s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        charge = float(ad.ion_stage[i] - 1)
        if charge > 0:
            nne += charge * nl[:, s:e].sum(axis=1)
    return nne


def ion_populations(ad: AtomicData, levelpops: np.ndarray) -> np.ndarray:
    """[ncells, nions] ion number densities from level populations."""
    nl = np.asarray(levelpops, np.float64)
    out = np.zeros((nl.shape[0], ad.nions_total))
    for i in range(ad.nions_total):
        s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        out[:, i] = nl[:, s:e].sum(axis=1)
    return out
