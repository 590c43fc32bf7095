"""Spectrum and light-curve extraction from escaped packets.

Rebuild of the reference's exspec post-processing
(reference: exspec.cc:36-298, spectrum.cc:339-500, light_curve.cc:34-62)
as vectorised numpy histogramming over the escaped-packet arrays.

Conventions match the reference:
* arrival time: escape_time - (pos . dir)/c   (get_arrive_time,
  vectors.h:146-152)
* spectra are binned on the timestep grid x log-nu grid and normalised
  to flux at 1 Mpc: e_rf / dt / dnu / (4 pi (1 Mpc)^2)
  (add_to_spec, spectrum.cc:349-362)
* light curves are luminosities in L_sun per timestep
  (add_to_lc_res, light_curve.cc:34-62)
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .constants import CLIGHT, CLIGHT_PROP, LSUN, PARSEC, PI
from .packets import TYPE_ESCAPE, TYPE_GAMMA, TYPE_RPKT
from .timesteps import TimestepGrid

MPC2 = (1e6 * PARSEC) ** 2
NCOSTHETABINS = 10
NPHIBINS = 10
MABINS = NCOSTHETABINS * NPHIBINS


@dataclasses.dataclass
class Spectra:
    """Angle-averaged escaping radiation binned in (time, freq)."""
    time_mid: np.ndarray  # [nts] days
    nu_lower: np.ndarray  # [nnu] Hz
    nu_delta: np.ndarray  # [nnu] Hz
    flux: np.ndarray  # [nts, nnu] erg/s/Hz/cm^2 at 1 Mpc
    lum: np.ndarray  # [nts] erg/s (bolometric within the nu range)
    lum_cmf: np.ndarray  # [nts] erg/s comoving-frame light curve


def _arrival_times(pos_cgs: np.ndarray, dir_: np.ndarray,
                   escape_time_s: np.ndarray) -> np.ndarray:
    return escape_time_s - np.sum(pos_cgs * dir_, axis=1) / CLIGHT_PROP


def escape_direction_bins(dirs: np.ndarray,
                          syn_dir=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Observer-direction bin (10 cos-theta x 10 phi) for each escape
    direction (get_escapedirectionbin, vectors.h:158-192)."""
    syn = np.asarray(syn_dir, dtype=np.float64)
    syn = syn / np.linalg.norm(syn)
    d = dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True),
                          1e-30)
    costheta = d @ syn
    costhetabin = np.clip(((costheta + 1.0) * NPHIBINS / 2.0).astype(int),
                          0, NCOSTHETABINS - 1)
    xhat = np.array([1.0, 0.0, 0.0])
    vec1 = np.cross(d, syn)
    vec2 = np.cross(xhat, syn)
    n1 = np.maximum(np.linalg.norm(vec1, axis=1), 1e-30)
    n2 = max(np.linalg.norm(vec2), 1e-30)
    cosphi = np.clip(vec1 @ vec2 / n1 / n2, -1.0, 1.0)
    vec3 = np.cross(vec2, syn)
    testphi = vec1 @ vec3
    phibin = np.where(testphi > 0,
                      np.arccos(cosphi) / 2.0 / PI * NPHIBINS,
                      (np.arccos(cosphi) + PI) / 2.0 / PI * NPHIBINS)
    phibin = np.clip(phibin.astype(int), 0, NPHIBINS - 1)
    return costhetabin * NPHIBINS + phibin


def build_spectra(escaped: dict[str, np.ndarray], ts: TimestepGrid,
                  nu_min: float, nu_max: float, nnubins: int,
                  vmax: float = 0.0, abin: int = -1,
                  syn_dir=(0.0, 0.0, 1.0)) -> Spectra:
    """Bin escaped packets (float64 CGS arrays: pos, dirvec, nu_rf,
    e_rf, e_cmf, escape_time) into time x log-nu flux.

    ``abin`` = -1 gives the angle average; 0..99 selects one of the
    10x10 escape-direction bins (the exspec angle-resolved mode,
    exspec.cc:142-250), scaled by MABINS to keep the 1 Mpc flux
    normalisation."""
    if abin >= 0:
        bins = escape_direction_bins(escaped["dirvec"], syn_dir)
        keep = bins == abin
        escaped = {k: v[keep] for k, v in escaped.items()}
    anglefactor = MABINS if abin >= 0 else 1.0
    t_arrive = _arrival_times(escaped["pos"], escaped["dirvec"],
                              escaped["escape_time"])
    nu = escaped["nu_rf"]
    e_rf = escaped["e_rf"]

    tmin = ts.start[0]
    tmax = ts.start[-1] + ts.width[-1]
    dlognu = (np.log(nu_max) - np.log(nu_min)) / nnubins
    nu_lower = np.exp(np.log(nu_min) + np.arange(nnubins) * dlognu)
    nu_delta = np.exp(np.log(nu_min)
                      + (np.arange(nnubins) + 1) * dlognu) - nu_lower

    ok = ((t_arrive > tmin) & (t_arrive < tmax)
          & (nu > nu_min) & (nu < nu_max))
    # timestep index by searching the start grid
    it = np.searchsorted(ts.start, t_arrive[ok], side="right") - 1
    it = np.clip(it, 0, ts.n - 1)
    inu = ((np.log(nu[ok]) - np.log(nu_min)) / dlognu).astype(np.int64)
    inu = np.clip(inu, 0, nnubins - 1)

    flux = np.zeros((ts.n, nnubins))
    np.add.at(flux, (it, inu), e_rf[ok])
    flux *= anglefactor
    flux /= ts.width[:, None]
    flux /= nu_delta[None, :]
    flux /= 4e12 * PI * PARSEC * PARSEC  # -> flux at 1 Mpc

    # bolometric light curve over all escaping r-packet energy: only the
    # arrival-time cut applies — packets scattered outside the spectral
    # nu window still count (add_to_lc_res, light_curve.cc:38-43)
    ok_t = (t_arrive > tmin) & (t_arrive < tmax)
    it_t = np.clip(np.searchsorted(ts.start, t_arrive[ok_t],
                                   side="right") - 1, 0, ts.n - 1)
    lum = np.zeros(ts.n)
    np.add.at(lum, it_t, e_rf[ok_t])
    lum *= anglefactor
    lum /= ts.width

    # comoving-frame light curve (light_curve.cc:46-52)
    lum_cmf = np.zeros(ts.n)
    gamma_factor = np.sqrt(max(1.0 - (vmax / CLIGHT) ** 2, 1e-12))
    t_arrive_cmf = escaped["escape_time"] * gamma_factor
    ok_cmf = (t_arrive_cmf > tmin) & (t_arrive_cmf < tmax)
    it_cmf = np.clip(np.searchsorted(ts.start, t_arrive_cmf[ok_cmf],
                                     side="right") - 1, 0, ts.n - 1)
    np.add.at(lum_cmf, it_cmf, escaped["e_cmf"][ok_cmf] / gamma_factor)
    lum_cmf /= ts.width

    return Spectra(time_mid=ts.mid / 86400.0, nu_lower=nu_lower,
                   nu_delta=nu_delta, flux=flux, lum=lum, lum_cmf=lum_cmf)


def select_escaped(arrays: dict[str, np.ndarray],
                   escape_type: int) -> dict[str, np.ndarray]:
    """Filter packet arrays (CGS) for escaped packets of a given type."""
    mask = ((arrays["ptype"] == TYPE_ESCAPE)
            & (arrays["escape_type"] == escape_type))
    return {k: v[mask] for k, v in arrays.items()}


def write_light_curve(path: str, spec: Spectra, nts_max=None,
                      dep_block=None):
    """light_curve.out format: tmid_days, L/Lsun, L_cmf/Lsun rows,
    then (angle-average only) a second block of the same times with
    the gamma deposition rate and comoving-frame luminosity
    (write_light_curve, light_curve.cc:9-32).

    ``dep_block``: optional [(gamma_dep_Lsun, cmf_lum_Lsun), ...] per
    timestep for the second block."""
    n = len(spec.time_mid) if nts_max is None else min(
        nts_max, len(spec.time_mid))
    with open(path, "w") as f:
        for t, l, lc in zip(spec.time_mid[:n], spec.lum[:n],
                            spec.lum_cmf[:n]):
            f.write(f"{t:g} {l / LSUN:g} {lc / LSUN:g}\n")
        if dep_block is not None:
            for t, (gd, cl) in zip(spec.time_mid[:n], dep_block[:n]):
                f.write(f"{t:g} {gd:g} {cl:g}\n")


def build_specpol(escaped: dict[str, np.ndarray], ts: TimestepGrid,
                  nu_min: float, nu_max: float, nnubins: int,
                  abin: int = -1, syn_dir=(0.0, 0.0, 1.0)):
    """Stokes I/Q/U spectra from escaped packets with polarisation
    state (add_to_spec's Stokes branch, spectrum.cc:339-500).
    ``abin`` = -1 gives the angle average; 0..99 one of the 10x10
    escape-direction bins (add_to_spec_res, spectrum.cc:602-639).

    Returns (I, Q, U) flux arrays [nts, nnu] at 1 Mpc."""
    if abin >= 0:
        bins = escape_direction_bins(escaped["dirvec"], syn_dir)
        sel = bins == abin
        escaped = {k: v[sel] for k, v in escaped.items()}
    t_arrive = _arrival_times(escaped["pos"], escaped["dirvec"],
                              escaped["escape_time"])
    nu = escaped["nu_rf"]
    e_rf = escaped["e_rf"]
    q = escaped.get("stokes_q", np.zeros_like(e_rf))
    u = escaped.get("stokes_u", np.zeros_like(e_rf))

    tmin = ts.start[0]
    tmax = ts.start[-1] + ts.width[-1]
    dlognu = (np.log(nu_max) - np.log(nu_min)) / nnubins
    nu_delta = (np.exp(np.log(nu_min)
                       + (np.arange(nnubins) + 1) * dlognu)
                - np.exp(np.log(nu_min) + np.arange(nnubins) * dlognu))
    ok = ((t_arrive > tmin) & (t_arrive < tmax)
          & (nu > nu_min) & (nu < nu_max))
    it = np.clip(np.searchsorted(ts.start, t_arrive[ok], "right") - 1,
                 0, ts.n - 1)
    inu = np.clip(((np.log(nu[ok]) - np.log(nu_min))
                   / dlognu).astype(np.int64), 0, nnubins - 1)
    norm = 1.0 / (4e12 * PI * PARSEC * PARSEC)
    if abin >= 0:
        norm *= MABINS
    out = []
    for w in (np.ones_like(e_rf), q, u):
        f = np.zeros((ts.n, nnubins))
        np.add.at(f, (it, inu), (e_rf * w)[ok])
        f *= norm / ts.width[:, None] / nu_delta[None, :]
        out.append(f)
    return tuple(out)


def write_specpol(path: str, ts: TimestepGrid, I, Q, U, nu_min, nu_max):
    """specpol.out: blocks of I, Q, U spectra (write_specpol,
    spectrum.cc:214-305 layout: time row then per-nu rows with the
    three Stokes blocks concatenated column-wise)."""
    nnubins = I.shape[1]
    dlognu = (np.log(nu_max) - np.log(nu_min)) / nnubins
    nu_c = np.exp(np.log(nu_min) + (np.arange(nnubins) + 0.5) * dlognu)
    with open(path, "w") as f:
        trow = " ".join(f"{t / 86400.0:g}" for t in ts.mid)
        f.write(f"0.0 {trow} {trow} {trow}\n")
        for i in range(nnubins):
            cols = [f"{nu_c[i]:g}"]
            for blk in (I, Q, U):
                cols += [f"{blk[n, i]:g}" for n in range(ts.n)]
            f.write(" ".join(cols) + "\n")


def emission_column_names(ad) -> list[str]:
    """Process-column layout for emission/absorption attribution
    (columnindex_from_emissiontype, spectrum.cc:306-337): one column
    per ion for bound-bound, one per ion for bound-free (keyed by the
    continuum's lower ion), then free-free and other/unset."""
    names = []
    for tag in ("bb", "bf"):
        for i in range(ad.nions_total):
            z = ad.elem_z[ad.ion_element[i]]
            names.append(f"{tag}_Z{z}_ionstage{ad.ion_stage[i]}")
    names.append("freefree")
    names.append("other")
    return names


def build_emission_absorption(escaped: dict[str, np.ndarray],
                              ts: TimestepGrid, nu_min: float,
                              nu_max: float, nnubins: int, ad,
                              ph=None):
    """Emission- and absorption-attributed spectra (the do_emission_res
    mode of exspec: add_to_spec's emission/absorption part,
    spectrum.cc:363-420).

    Every escaped r-packet's flux is credited to the process that last
    emitted it (line -> the line's ion; bf continuum -> the lower ion;
    free-free) and, when its last absorption was bound-bound, debited
    in the absorption spectrum of that line's ion at the absorption
    frequency.

    Returns (emission [nts, nnu, ncols], absorption [nts, nnu, nions],
    column_names)."""
    from .packets import EMTYPE_FREEFREE

    ni = ad.nions_total
    ncols = 2 * ni + 2
    names = emission_column_names(ad)

    t_arrive = _arrival_times(escaped["pos"], escaped["dirvec"],
                              escaped["escape_time"])
    nu = escaped["nu_rf"]
    e_rf = escaped["e_rf"]
    et = escaped["emissiontype"].astype(np.int64)

    col = np.full(len(et), 2 * ni + 1, dtype=np.int64)  # other
    bb = et >= 0
    col[bb] = ad.line_ion[np.clip(et[bb], 0, ad.nlines - 1)]
    col[et == EMTYPE_FREEFREE] = 2 * ni
    if ph is not None:
        is_bf = (et < 0) & (et > -9999000)
        cont = np.clip(-1 - et[is_bf], 0, ph.ncont - 1)
        cont_lowerion = (np.searchsorted(ad.ion_level_start,
                                         ph.cont_level,
                                         side="right") - 1)
        col[is_bf] = ni + cont_lowerion[cont]

    tmin = ts.start[0]
    tmax = ts.start[-1] + ts.width[-1]
    dlognu = (np.log(nu_max) - np.log(nu_min)) / nnubins
    nu_lower = np.exp(np.log(nu_min) + np.arange(nnubins) * dlognu)
    nu_delta = np.exp(np.log(nu_min)
                      + (np.arange(nnubins) + 1) * dlognu) - nu_lower
    norm = 1.0 / (4e12 * PI * PARSEC * PARSEC)

    ok = ((t_arrive > tmin) & (t_arrive < tmax)
          & (nu > nu_min) & (nu < nu_max))
    it = np.clip(np.searchsorted(ts.start, t_arrive[ok], "right") - 1,
                 0, ts.n - 1)
    inu = np.clip(((np.log(nu[ok]) - np.log(nu_min))
                   / dlognu).astype(np.int64), 0, nnubins - 1)
    emission = np.zeros((ts.n, nnubins, ncols))
    np.add.at(emission, (it, inu, col[ok]), e_rf[ok])
    emission *= norm / ts.width[:, None, None] / nu_delta[None, :, None]

    # absorption: binned at the rest-frame frequency of the last
    # bound-bound absorption (spectrum.cc:404-420)
    at = escaped["absorptiontype"].astype(np.int64)
    nu_abs = escaped["absorption_nu"]
    ok_a = ((t_arrive > tmin) & (t_arrive < tmax) & (at >= 0)
            & (nu_abs > nu_min) & (nu_abs < nu_max))
    it_a = np.clip(np.searchsorted(ts.start, t_arrive[ok_a],
                                   "right") - 1, 0, ts.n - 1)
    inu_a = np.clip(((np.log(nu_abs[ok_a]) - np.log(nu_min))
                     / dlognu).astype(np.int64), 0, nnubins - 1)
    ion_a = ad.line_ion[np.clip(at[ok_a], 0, ad.nlines - 1)]
    absorption = np.zeros((ts.n, nnubins, ni))
    np.add.at(absorption, (it_a, inu_a, ion_a), e_rf[ok_a])
    absorption *= norm / ts.width[:, None, None] / nu_delta[None, :, None]
    return emission, absorption, names


def write_emission_absorption(path_em: str, path_abs: str, ts,
                              emission: np.ndarray,
                              absorption: np.ndarray,
                              names: list[str], nu_min: float,
                              nu_max: float):
    """emission.out / absorption.out: per (timestep, nu-bin) row the
    flux attributed to each process column (the reference's layout,
    spectrum.cc:190-212, with a named header)."""
    for path, arr, cols in (
            (path_em, emission, names),
            (path_abs, absorption, names[:absorption.shape[2]])):
        nnubins = arr.shape[1]
        dlognu = (np.log(nu_max) - np.log(nu_min)) / nnubins
        nu_c = np.exp(np.log(nu_min)
                      + (np.arange(nnubins) + 0.5) * dlognu)
        with open(path, "w") as f:
            f.write("#timestep nu_mid " + " ".join(cols) + "\n")
            for n in range(ts.n):
                for i in range(nnubins):
                    row = [str(n), f"{nu_c[i]:g}"]
                    row += [f"{v:g}" for v in arr[n, i]]
                    f.write(" ".join(row) + "\n")


def write_vspec(path: str, ts: TimestepGrid, vspec_I_erg: np.ndarray,
                nu_min: float, nu_max: float,
                vspec_Q_erg: np.ndarray | None = None,
                vspec_U_erg: np.ndarray | None = None):
    """vspecpol.out analogue (vpkt.cc:483-560 output): one block per
    observer per Stokes parameter (I, then Q, then U when polarised);
    rows = nu bins, columns = flux per timestep at 1 Mpc.
    ``vspec_*_erg``: [nobs, nts, nnu] peeled energy per (time, nu)
    bin [erg]."""
    nobs, ntb, nnu = vspec_I_erg.shape
    dlognu = (np.log(nu_max) - np.log(nu_min)) / nnu
    nu_lower = np.exp(np.log(nu_min) + np.arange(nnu) * dlognu)
    nu_delta = np.exp(np.log(nu_min)
                      + (np.arange(nnu) + 1) * dlognu) - nu_lower
    stokes = [("I", vspec_I_erg)]
    if vspec_Q_erg is not None:
        stokes.append(("Q", vspec_Q_erg))
    if vspec_U_erg is not None:
        stokes.append(("U", vspec_U_erg))
    nu_c = nu_lower + 0.5 * nu_delta
    with open(path, "w") as f:
        for o in range(nobs):
            for name, arr in stokes:
                flux = (arr[o] / ts.width[:ntb, None]
                        / nu_delta[None, :] / MPC2)
                f.write(f"#observer {o} stokes {name}\n")
                f.write(" ".join(["0.0"] + [f"{t / 86400.0:g}"
                                            for t in ts.mid[:ntb]])
                        + "\n")
                for i in range(nnu):
                    row = [f"{nu_c[i]:g}"] + [f"{flux[n, i]:g}"
                                              for n in range(ntb)]
                    f.write(" ".join(row) + "\n")


def write_spectrum(path: str, spec: Spectra):
    """spec.out format: first line = 0 followed by times [days];
    then one row per frequency bin: nu_centre, flux per timestep
    (write_spectrum, spectrum.cc:144-213)."""
    with open(path, "w") as f:
        f.write(" ".join(["0.0"] + [f"{t:g}" for t in spec.time_mid])
                + "\n")
        nu_centre = spec.nu_lower + 0.5 * spec.nu_delta
        for i, nuc in enumerate(nu_centre):
            row = [f"{nuc:g}"] + [f"{spec.flux[nts, i]:g}"
                                  for nts in range(len(spec.time_mid))]
            f.write(" ".join(row) + "\n")
