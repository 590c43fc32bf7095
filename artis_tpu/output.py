"""Scientific output files in the reference's formats.

Writers for the per-timestep observables the reference emits
(reference: update_grid.cc:42-658 estimators file, sn3d.cc:86-188
deposition file, input.cc:2383 timesteps file), so downstream tooling
(e.g. artistools-style parsers) can consume this framework's runs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .constants import DAY, LSUN
from .grid import Grid
from .timesteps import TimestepGrid


def write_timesteps_file(path: str, ts: TimestepGrid):
    """timesteps.out (write_timestep_file, input.cc:2383-2400)."""
    with open(path, "w") as f:
        f.write("#timestep tstart_days tmid_days twidth_days\n")
        for n in range(ts.n):
            f.write(f"{n} {ts.start[n] / DAY:.6f} {ts.mid[n] / DAY:.6f} "
                    f"{ts.width[n] / DAY:.6f}\n")


def append_estimators(path: str, g: Grid, nts: int, ts: TimestepGrid,
                      heatingcooling: Optional[dict] = None,
                      ad=None, ionpops: Optional[np.ndarray] = None):
    """Append one timestep's per-cell state in the reference's
    estimators_XXXX.out text format (update_grid.cc:42-658):
    header line 'timestep X modelgridindex Y ... TR Te W TJ ...',
    followed by per-cell heating/cooling breakdown lines when
    available (update_grid.cc:642-649; heatingcooling holds [ncells]
    arrays from thermal.heating_cooling_breakdown)."""
    tdays = ts.mid[nts] / DAY
    hc = heatingcooling
    with open(path, "a") as f:
        for mgi in range(g.nmodel):
            if g.rho_init[mgi] <= 0:
                f.write(f"timestep {nts} modelgridindex {mgi} EMPTYCELL\n")
                continue
            f.write(
                f"timestep {nts} modelgridindex {mgi} titeration 0 "
                f"TR {g.TR[mgi]:.1f} Te {g.Te[mgi]:.1f} W {g.W[mgi]:.4e} "
                f"TJ {g.TJ[mgi]:.1f} "
                f"grey_depth {getattr(g, 'grey_depth', np.zeros(g.nmodel))[mgi]:.3f} "
                f"thick {int(g.thick[mgi])} nne {g.nne[mgi]:.3e} "
                f"tdays {tdays:.3f}\n")
            if ad is not None and ionpops is not None:
                # per-element ion-stage number densities
                # (update_grid.cc:65-91)
                for e_i in range(ad.nelements):
                    i0, i1 = (ad.elem_ion_start[e_i],
                              ad.elem_ion_start[e_i + 1])
                    z = ad.elem_z[e_i]
                    parts = [f"{ad.ion_stage[i]}: "
                             f"{ionpops[mgi, i]:.3e}"
                             for i in range(i0, i1)]
                    total = ionpops[mgi, i0:i1].sum()
                    f.write(f"populations Z={z} "
                            + "  ".join(parts)
                            + f"  SUM: {total:.3e}\n")
            if hc is not None:
                f.write(
                    f"heating: ff {hc['heat_ff'][mgi]:.5e} "
                    f"bf {hc['heat_bf'][mgi]:.5e} "
                    f"coll {hc['heat_coll'][mgi]:.5e} "
                    f"dep {hc['heat_dep'][mgi]:.5e}\n"
                    f"cooling: ff {hc['cool_ff'][mgi]:.5e} "
                    f"fb {hc['cool_fb'][mgi]:.5e} "
                    f"coll {hc['cool_coll'][mgi]:.5e} "
                    f"adiabatic {hc['cool_adiabatic'][mgi]:.5e}\n")


def write_deposition_file(path: str, dep_log: list[dict],
                          ts: TimestepGrid):
    """deposition.out analogue (write_deposition_file,
    sn3d.cc:86-188): per-timestep deposition rates in Lsun."""
    with open(path, "w") as f:
        f.write("#ts tmid_days gammadep_Lsun positrondep_Lsun "
                "eps_elec_Lsun eps_alpha_Lsun total_dep_Lsun\n")
        for d in dep_log:
            total = (d["gamma_dep_Lsun"] + d["positron_dep_Lsun"]
                     + d["electron_dep_Lsun"] + d["alpha_dep_Lsun"])
            f.write(f"{d['ts']} {d['tmid_days']:.4f} "
                    f"{d['gamma_dep_Lsun']:.5e} "
                    f"{d['positron_dep_Lsun']:.5e} "
                    f"{d['electron_dep_Lsun']:.5e} "
                    f"{d['alpha_dep_Lsun']:.5e} {total:.5e}\n")


def write_nlte_pops_file(path: str, ad, nlte_levelpops: np.ndarray,
                         lte_levelpops: Optional[np.ndarray], nts: int,
                         ts: TimestepGrid, append: bool = False):
    """nlte_pops.out analogue (nltepop_write_to_file,
    nltepop.cc:1572-1634): one row per (cell, level) with the NLTE
    population and the departure from the LTE value."""
    tdays = ts.mid[nts] / DAY
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            f.write("#timestep tdays modelgridindex Z ionstage level "
                    "n_NLTE n_LTE departure\n")
        ncells = nlte_levelpops.shape[0]
        for mgi in range(ncells):
            for i in range(ad.nions_total):
                z = ad.elem_z[ad.ion_element[i]]
                stage = ad.ion_stage[i]
                s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
                for lvl in range(e - s):
                    n_nlte = nlte_levelpops[mgi, s + lvl]
                    n_lte = (lte_levelpops[mgi, s + lvl]
                             if lte_levelpops is not None else 0.0)
                    dep = n_nlte / n_lte if n_lte > 0 else 0.0
                    f.write(f"{nts} {tdays:.4f} {mgi} {z} {stage} "
                            f"{lvl} {n_nlte:.6e} {n_lte:.6e} "
                            f"{dep:.6e}\n")


def write_nonthermal_file(path: str, sol, en_ev: np.ndarray, nts: int,
                          ts: TimestepGrid):
    """nonthermalspec.out analogue (nt_write_to_file,
    nonthermal.cc:687-760): per-cell deposition-fraction summary and,
    when stored, the degradation spectrum y(E)."""
    tdays = ts.mid[nts] / DAY
    with open(path, "w") as f:
        f.write("#timestep tdays modelgridindex frac_heating "
                "frac_ionization frac_excitation\n")
        ncells = len(sol.frac_heating)
        for mgi in range(ncells):
            f.write(f"{nts} {tdays:.4f} {mgi} "
                    f"{sol.frac_heating[mgi]:.6f} "
                    f"{sol.frac_ionization[mgi]:.6f} "
                    f"{sol.frac_excitation[mgi]:.6f}\n")
        if sol.y is not None:
            f.write("#modelgridindex energy_ev y\n")
            for mgi in range(ncells):
                for i, e in enumerate(en_ev):
                    f.write(f"{mgi} {e:.3f} {sol.y[mgi, i]:.6e}\n")


def write_packets_file(path: str, arrays_cgs: dict[str, np.ndarray],
                       extra: Optional[dict] = None):
    """packets00_XXXX.out-style text dump (write_packets,
    packet.cc:152-196), with this framework's column subset."""
    n = len(arrays_cgs["ptype"])
    cols = ["number", "where", "type_id", "posx", "posy", "posz",
            "dirx", "diry", "dirz", "e_cmf", "e_rf", "nu_cmf", "nu_rf",
            "escape_type_id", "escape_time", "nscatterings",
            "stokes_q", "stokes_u", "emissiontype", "absorptiontype",
            "absorption_nu", "em_posx", "em_posy", "em_posz",
            "em_time"]
    z = lambda k, dt=float: np.asarray(
        arrays_cgs.get(k, np.zeros(n, dt)))
    pos = arrays_cgs["pos"]
    d = arrays_cgs["dirvec"]
    em_pos = np.asarray(arrays_cgs.get("em_pos", np.zeros((n, 3))))
    mat = np.column_stack([
        np.arange(n), z("cell", int), arrays_cgs["ptype"],
        pos[:, 0], pos[:, 1], pos[:, 2], d[:, 0], d[:, 1], d[:, 2],
        arrays_cgs["e_cmf"], arrays_cgs["e_rf"],
        arrays_cgs["nu_cmf"], arrays_cgs["nu_rf"],
        arrays_cgs["escape_type"], arrays_cgs["escape_time"],
        z("nscatterings", int), z("stokes_q"), z("stokes_u"),
        z("emissiontype", int) if "emissiontype" in arrays_cgs
        else np.full(n, -1), z("absorptiontype", int)
        if "absorptiontype" in arrays_cgs else np.full(n, -1),
        z("absorption_nu"),
        em_pos[:, 0], em_pos[:, 1], em_pos[:, 2], z("em_time")])
    np.savetxt(path, mat, fmt="%.9g",
               header=" ".join(cols), comments="#")


def write_linestat_header(path: str, ad) -> None:
    """linestat.out header: 5 rows over all lines — wavelength [cm],
    element Z, ionstage, upper level, lower level (1-based)
    (initialise_linestat_file, sn3d.cc:62-84)."""
    from .constants import CLIGHT
    z_of_line = ad.elem_z[ad.ion_element[ad.line_ion]]
    stage = ad.ion_stage[ad.line_ion]
    up_local = ad.line_upper - ad.ion_level_start[ad.line_ion] + 1
    lo_local = ad.line_lower - ad.ion_level_start[ad.line_ion] + 1
    with open(path, "w") as f:
        f.write(" ".join(f"{CLIGHT / nu:g}" for nu in ad.line_nu)
                + " \n")
        for arr in (z_of_line, stage, up_local, lo_local):
            f.write(" ".join(str(int(v)) for v in arr) + " \n")


def append_linestat(path: str, em_counts, ab_counts) -> None:
    """Two rows per timestep: per-line emission then absorption counts
    (sn3d.cc:627-640)."""
    with open(path, "a") as f:
        f.write(" ".join(str(int(round(v))) for v in em_counts) + " \n")
        f.write(" ".join(str(int(round(v))) for v in ab_counts) + " \n")


MACROATOM_HEADER = ("timestep modelgridindex element ionstage_in "
                    "ionstage_out level_in level activatingline "
                    "nu_cmf_in nu_cmf_out nu_rf_in nu_rf_out jumps\n")


def append_macroatom_log(path: str, nts: int, ad, rows_i, rows_f,
                         nrows: int) -> None:
    """macroatom.out per-radiative-deactivation rows (LOG_MACROATOM,
    macroatom.cc:677-683; header macroatom.cc:911-915). ``rows_i``
    [N, 5] = (mgi, global level_in, global level_out, activatingline,
    jumps); ``rows_f`` [N, 4] = (nu_cmf_in, nu_cmf_out, nu_rf_in,
    nu_rf_out). Global level indices map to (Z, ionstage, ion-local
    level) via the atomic dataset."""
    import numpy as np

    rows_i = np.asarray(rows_i)[:nrows]
    rows_f = np.asarray(rows_f)[:nrows]

    def decode(lvl):
        lvl = np.clip(lvl, 0, ad.nlevels_total - 1)
        ion = np.searchsorted(ad.ion_level_start, lvl,
                              side="right") - 1
        z = ad.elem_z[ad.ion_element[ion]]
        stage = ad.ion_stage[ion]
        local = lvl - ad.ion_level_start[ion]
        return z, stage, local

    z_in, st_in, l_in = decode(rows_i[:, 1])
    _, st_out, l_out = decode(rows_i[:, 2])
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(MACROATOM_HEADER)
        for k in range(len(rows_i)):
            f.write(f"{nts:8d} {int(rows_i[k, 0]):14d} "
                    f"{int(z_in[k]):2d} {int(st_in[k]):12d} "
                    f"{int(st_out[k]):12d} {int(l_in[k]):9d} "
                    f"{int(l_out[k]):9d} {int(rows_i[k, 3]):9d} "
                    f"{rows_f[k, 0]:11.5e} {rows_f[k, 1]:11.5e} "
                    f"{rows_f[k, 2]:11.5e} {rows_f[k, 3]:11.5e} "
                    f"{int(rows_i[k, 4]):9d}\n")


ION_STAT_NAMES = [
    # stats.h:12-45 enum order; only the columns the kernel fills are
    # nonzero: 0 radrecomb_ma, 4 bb_ma, 5 bb_absorbed, 6 ntion,
    # 7 photoion, 18-21 ma_energyout (raddeexc/radrecomb/colldeexc/
    # collrecomb), 22 energyin_radexc, 23 energyin_photoion,
    # 27 energyin_ntcollion, 28 energyin_total, 29 energyout_total
    "radrecomb_macroatom", "radrecomb_kpkt", "radrecomb_absorbed",
    "radrecomb_escaped", "boundbound_macroatom", "boundbound_absorbed",
    "ntion", "photoion", "photoion_frombf", "photoion_frombfsameelem",
    "photoion_frombfionplusone", "photoion_frombfionplustwo",
    "photoion_frombfionplusthree", "photoion_frombflowersuperlevel",
    "photoion_frombb", "photoion_frombbionplusone",
    "photoion_frombbionplustwo", "photoion_frombbionplusthree",
    "ma_energyout_raddeexc", "ma_energyout_radrecomb",
    "ma_energyout_colldeexc", "ma_energyout_collrecomb",
    "ma_energyin_radexc", "ma_energyin_photoion",
    "ma_energyin_collexc", "ma_energyin_collion", "_unused26",
    "ma_energyin_ntcollion", "ma_energyin_total", "ma_energyout_total",
    "ma_energyin_internal", "ma_energyout_internal",
]


def append_ion_stats(path: str, ad, ion_stats: np.ndarray, nts: int,
                     norm: np.ndarray):
    """Per-(cell, ion) energy-flow rows (TRACK_ION_STATS output,
    update_grid.cc TRACK_ION_STATS blocks): one row per (cell, ion)
    with the 32 normalised stats [erg/s/cm^3].  ``norm``: [ncells]
    e0/(deltaV*deltat) factors."""
    ncells = ion_stats.shape[0]
    with open(path, "a") as f:
        for mgi in range(min(ncells, len(norm))):
            for i in range(ad.nions_total):
                row = ion_stats[mgi, i] * norm[mgi]
                if not row.any():
                    continue
                z = ad.elem_z[ad.ion_element[i]]
                f.write(f"ionstats timestep {nts} modelgridindex "
                        f"{mgi} Z {z} ionstage {ad.ion_stage[i]} "
                        + " ".join(f"{v:.4e}" for v in row) + "\n")


def write_compton_estimators(path: str, compton_emiss: np.ndarray,
                             pp_emiss: np.ndarray, cfg, nts: int):
    """Normalised syn-mode emissivities (write_compton_estimators /
    emissivities.cc:172-258 analogue): per cell, the Compton
    emissivity toward syn_dir per log-nu bin plus the 511 keV
    pair-production emissivity [erg/s/cm^3]."""
    ncells, nbins = compton_emiss.shape
    lognu_min = np.log(max(cfg.nusyn_min, 1.0))
    dlognu = (np.log(max(cfg.nusyn_max, 2.0)) - lognu_min) / nbins
    nu_c = np.exp(lognu_min + (np.arange(nbins) + 0.5) * dlognu)
    with open(path, "w") as f:
        f.write(f"#timestep {nts} syn emissivities; columns: "
                "modelgridindex pp_emiss then compton emiss per bin\n")
        f.write("#nu_bin_centres_Hz " +
                " ".join(f"{v:.4e}" for v in nu_c) + "\n")
        for mgi in range(ncells):
            f.write(f"{mgi} {pp_emiss[mgi]:.5e} "
                    + " ".join(f"{v:.5e}"
                               for v in compton_emiss[mgi]) + "\n")


def write_vpkt_grid(path: str, I: np.ndarray, Q: np.ndarray,
                    U: np.ndarray, cfg, vmax_cgs: float):
    """vpkt_grid.out (write_vpkt_grid, vpkt.cc:560-660 analogue):
    one row per (observer, range, iy, iz) with the projected
    velocities and the accumulated Stokes fluxes [erg]."""
    nobs, nr, nv, _ = I.shape
    vbin = 2.0 * vmax_cgs / nv
    with open(path, "w") as f:
        f.write("#obs range vy_cm_s vz_cm_s I Q U\n")
        for o_i in range(nobs):
            for r in range(nr):
                for iy in range(nv):
                    vy = vmax_cgs - (iy + 0.5) * vbin
                    for iz in range(nv):
                        vz = vmax_cgs - (iz + 0.5) * vbin
                        f.write(f"{o_i} {r} {vy:.5e} {vz:.5e} "
                                f"{I[o_i, r, iy, iz]:.5e} "
                                f"{Q[o_i, r, iy, iz]:.5e} "
                                f"{U[o_i, r, iy, iz]:.5e}\n")
