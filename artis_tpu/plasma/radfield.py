"""Binned radiation-field model: per-(cell, log-nu-bin) dilute
blackbody fits.

Rebuild of the reference's multibin radfield (reference: radfield.cc —
bin estimators radfield.cc:831-876, per-bin (W, T_R) fit
``fit_parameters`` radfield.cc:1177-1290 with ``find_T_R``
radfield.cc:1070-1135, field evaluation ``radfield(nu, cell)``
radfield.cc:898-960) redesigned for the TPU build:

* the transport kernel accumulates J/nuJ per (cell, bin) with one fused
  device scatter per event step (kernel.py, ``J_bin``/``nuJ_bin``);
* the per-bin temperature solve — the reference does a GSL Brent root
  find per (cell, bin) — becomes one vectorised bisection over ALL
  (cell, bin) pairs at once, with the Planck bin integrals evaluated by
  fixed Gauss-Legendre-style quadrature instead of incomplete Debye
  function expansions;
* the fitted field is a plain pytree (`BinnedRadField`) whose
  ``Jnu_at`` powers the bound-bound excitation rates and whose bin
  parameters power the photoionisation/bfheating integrals (the
  reference's DETAILED_BF_ESTIMATORS / NO_LUT mode).

Physics: within bin b the field is J_nu = W_b B_nu(T_b). T_b is chosen
so the Planck mean frequency over the bin matches the measured
nubar_b = nuJ_b / J_b; W_b then normalises the bin-integrated J.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..constants import CLIGHT, H, KB

NQUAD = 24  # quadrature points per bin for the Planck integrals


def _planck(nu, T):
    with np.errstate(over="ignore", invalid="ignore"):
        x = np.minimum(H * nu / (KB * np.maximum(T, 1e-10)), 500.0)
        return (2.0 * H * nu**3 / CLIGHT**2
                / np.expm1(np.maximum(x, 1e-12)))


@dataclasses.dataclass
class BinnedRadField:
    """Fitted multibin field for all cells."""
    nu_edges: np.ndarray  # [nbins+1] Hz
    W: np.ndarray  # [ncells, nbins]
    T_R: np.ndarray  # [ncells, nbins]

    @property
    def nbins(self) -> int:
        return len(self.nu_edges) - 1

    def Jnu_at(self, nu: np.ndarray) -> np.ndarray:
        """Mean intensity J_nu [erg/s/cm^2/Hz/sr] at frequencies
        ``nu`` [nfreq] for every cell -> [ncells, nfreq]
        (radfield(), radfield.cc:898-960)."""
        nu = np.asarray(nu, np.float64)
        b = np.searchsorted(self.nu_edges, nu, side="right") - 1
        inside = (b >= 0) & (b < self.nbins)
        bc = np.clip(b, 0, self.nbins - 1)
        W = self.W[:, bc]
        T = self.T_R[:, bc]
        out = W * _planck(nu[None, :], T)
        return np.where(inside[None, :], out, 0.0)

    def TR_at(self, nu: np.ndarray) -> np.ndarray:
        """Fitted bin colour temperature at each frequency
        [ncells, nfreq] (0 outside the binned range / empty bins)."""
        nu = np.asarray(nu, np.float64)
        b = np.searchsorted(self.nu_edges, nu, side="right") - 1
        inside = (b >= 0) & (b < self.nbins)
        T = self.T_R[:, np.clip(b, 0, self.nbins - 1)]
        return np.where(inside[None, :], T, 0.0)


@dataclasses.dataclass
class RawBinnedField:
    """The transport-accumulated binned J estimator used DIRECTLY as
    the radiation field — the analogue of the reference's detailed
    bf-rate estimators (update_bfestimators, radfield.cc:764-828),
    where photoionisation rates integrate the actual packet field
    rather than a fitted Planck shape.  J_nu is piecewise-constant
    per bin; T_R (the per-bin fitted colour temperature) supplies the
    stimulated-emission corrections, as the reference's
    get_bfrate_estimator path does via the bin fits."""
    nu_edges: np.ndarray  # [nbins+1] Hz
    J_bin: np.ndarray  # [ncells, nbins] bin-integrated J [erg/s/cm^2/sr]
    T_R: np.ndarray  # [ncells, nbins] fitted bin colour temperature

    @property
    def nbins(self) -> int:
        return len(self.nu_edges) - 1

    @property
    def Jnu_dens(self) -> np.ndarray:
        """Per-bin mean intensity density J_nu [erg/s/cm^2/Hz/sr]."""
        dnu = np.diff(self.nu_edges)[None, :]
        return self.J_bin / dnu

    def Jnu_at(self, nu: np.ndarray) -> np.ndarray:
        nu = np.asarray(nu, np.float64)
        b = np.searchsorted(self.nu_edges, nu, side="right") - 1
        inside = (b >= 0) & (b < self.nbins)
        bc = np.clip(b, 0, self.nbins - 1)
        return np.where(inside[None, :], self.Jnu_dens[:, bc], 0.0)

    def TR_at(self, nu: np.ndarray) -> np.ndarray:
        nu = np.asarray(nu, np.float64)
        b = np.searchsorted(self.nu_edges, nu, side="right") - 1
        inside = (b >= 0) & (b < self.nbins)
        T = self.T_R[:, np.clip(b, 0, self.nbins - 1)]
        return np.where(inside[None, :], T, 0.0)


def make_bin_edges(nu_min: float, nu_max: float,
                   nbins: int) -> np.ndarray:
    return np.exp(np.linspace(np.log(nu_min), np.log(nu_max),
                              nbins + 1))


def fit_bin_parameters(J_bin: np.ndarray, nuJ_bin: np.ndarray,
                       nu_edges: np.ndarray, mintemp: float = 1000.0,
                       maxtemp: float = 1.4e5,
                       niter: int = 48) -> BinnedRadField:
    """Fit (W, T_R) per (cell, bin) from the binned estimators
    (fit_parameters, radfield.cc:1177-1290).

    J_bin: [ncells, nbins] bin-integrated mean intensity
    [erg/s/cm^2/sr]; nuJ_bin: the frequency-weighted companion.
    Empty bins get W = 0.
    """
    J_bin = np.asarray(J_bin, np.float64)
    nuJ_bin = np.asarray(nuJ_bin, np.float64)
    ncells, nbins = J_bin.shape
    assert len(nu_edges) == nbins + 1

    have = J_bin > 0
    with np.errstate(invalid="ignore", divide="ignore"):
        nubar = np.where(have, nuJ_bin / np.maximum(J_bin, 1e-300), 0.0)
    # clamp into the open bin interval (radfield.cc:1218-1234 warns and
    # substitutes when the mean collapses onto an edge)
    lo_e = nu_edges[:-1][None, :]
    hi_e = nu_edges[1:][None, :]
    nubar = np.clip(nubar, lo_e * 1.0001, hi_e * 0.9999)

    # quadrature grid per bin [nbins, NQUAD]
    x01 = (np.arange(NQUAD) + 0.5) / NQUAD
    nu_q = lo_e[0][:, None] + (hi_e[0] - lo_e[0])[:, None] * x01[None, :]
    dnu = ((hi_e[0] - lo_e[0]) / NQUAD)[:, None]

    def mean_nu(T):
        """Planck mean frequency over each bin, T: [ncells, nbins]."""
        B = _planck(nu_q[None, :, :], T[:, :, None])  # [nc, nb, NQ]
        I0 = np.sum(B * dnu[None], axis=2)
        I1 = np.sum(B * nu_q[None] * dnu[None], axis=2)
        with np.errstate(invalid="ignore", divide="ignore"):
            return np.where(I0 > 0, I1 / np.maximum(I0, 1e-300),
                            0.5 * (lo_e + hi_e))

    # mean_nu(T) is monotone increasing in T within a bin; bisect
    lo_T = np.full((ncells, nbins), mintemp)
    hi_T = np.full((ncells, nbins), maxtemp)
    for _ in range(niter):
        mid_T = 0.5 * (lo_T + hi_T)
        too_cold = mean_nu(mid_T) < nubar
        lo_T = np.where(too_cold, mid_T, lo_T)
        hi_T = np.where(too_cold, hi_T, mid_T)
    T_R = 0.5 * (lo_T + hi_T)

    B = _planck(nu_q[None, :, :], T_R[:, :, None])
    I0 = np.sum(B * dnu[None], axis=2)
    with np.errstate(invalid="ignore", divide="ignore"):
        W = np.where(have & (I0 > 0), J_bin / np.maximum(I0, 1e-300),
                     0.0)
    # runaway dilution factors mark a bad fit; zero the bin
    # (radfield.cc:1258-1270 W > 1e4 handling)
    bad = ~np.isfinite(W) | (W > 1e4)
    W = np.where(bad, 0.0, W)
    T_R = np.where(have, T_R, 0.0)
    return BinnedRadField(nu_edges=np.asarray(nu_edges, np.float64),
                          W=W, T_R=T_R)


def write_radfield_file(path: str, rf: BinnedRadField, nts: int,
                        tdays: float, append: bool = False,
                        J_bin: np.ndarray | None = None):
    """radfield.out analogue (radfield.cc:611-660): per (cell, bin)
    rows with the fitted parameters and, when available, the measured
    bin-integrated J (the reference's J column)."""
    mode = "a" if append else "w"
    with open(path, mode) as f:
        if not append:
            f.write("#timestep tdays modelgridindex bin nu_lower "
                    "nu_upper W T_R J\n")
        for mgi in range(rf.W.shape[0]):
            for b in range(rf.nbins):
                jcol = ("" if J_bin is None
                        else f" {J_bin[mgi, b]:.6e}")
                f.write(f"{nts} {tdays:.4f} {mgi} {b} "
                        f"{rf.nu_edges[b]:.5e} {rf.nu_edges[b + 1]:.5e} "
                        f"{rf.W[mgi, b]:.6e} {rf.T_R[mgi, b]:.2f}"
                        f"{jcol}\n")


def select_detailed_lines(ad) -> np.ndarray:
    """Line selection for the detailed per-line Jb_lu estimators
    (radfield::init, radfield.cc:276-315): Fe (Z=26) lines whose lower
    level index within its ion is <= 15 and with a nonzero spontaneous
    emission rate. Returns ascending line indices (the linelist is
    already in the kernel's descending-frequency order)."""
    ion_of_level = np.repeat(np.arange(ad.nions_total),
                             np.diff(ad.ion_level_start))
    ion_lo = ion_of_level[ad.line_lower]
    z = ad.elem_z[ad.ion_element[ion_lo]]
    lower_rel = ad.line_lower - ad.ion_level_start[ion_lo]
    sel = np.flatnonzero((z == 26) & (lower_rel <= 15)
                         & (ad.line_A > 0.0))
    return np.sort(sel).astype(np.int32)
