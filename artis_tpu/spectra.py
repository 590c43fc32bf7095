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


def build_spectra(escaped: dict[str, np.ndarray], ts: TimestepGrid,
                  nu_min: float, nu_max: float, nnubins: int,
                  vmax: float = 0.0) -> Spectra:
    """Bin escaped packets (float64 CGS arrays: pos, dirvec, nu_rf,
    e_rf, e_cmf, escape_time) into time x log-nu flux."""
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
    flux /= ts.width[:, None]
    flux /= nu_delta[None, :]
    flux /= 4e12 * PI * PARSEC * PARSEC  # -> flux at 1 Mpc

    # bolometric light curve over all escaping r-packet energy
    lum = np.zeros(ts.n)
    np.add.at(lum, it, e_rf[ok])
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


def write_light_curve(path: str, spec: Spectra):
    """light_curve.out format: tmid_days, L/Lsun, L_cmf/Lsun
    (write_light_curve, light_curve.cc:9-32)."""
    with open(path, "w") as f:
        for t, l, lc in zip(spec.time_mid, spec.lum, spec.lum_cmf):
            f.write(f"{t:g} {l / LSUN:g} {lc / LSUN:g}\n")


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
