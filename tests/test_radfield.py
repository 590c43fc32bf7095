"""Multibin radiation-field fits (radfield.cc fit_parameters /
find_T_R analogue): recovering a known dilute blackbody from binned
J/nuJ estimators, and the field evaluation used by the rate
integrals."""

import numpy as np

from artis_tpu.constants import CLIGHT, H, KB
from artis_tpu.plasma import radfield as rf_mod


def _bin_integrals(nu_edges, T, W, npts=400):
    """Exact-ish binned J and nuJ of a dilute blackbody."""
    nb = len(nu_edges) - 1
    J = np.zeros(nb)
    nuJ = np.zeros(nb)
    for b in range(nb):
        nu = np.linspace(nu_edges[b], nu_edges[b + 1], npts)
        B = (2.0 * H * nu**3 / CLIGHT**2
             / np.expm1(H * nu / (KB * T)))
        J[b] = W * np.trapezoid(B, nu)
        nuJ[b] = W * np.trapezoid(nu * B, nu)
    return J, nuJ


def test_fit_recovers_dilute_blackbody():
    edges = rf_mod.make_bin_edges(1e14, 3e15, 32)
    cases = [(8000.0, 0.4), (15000.0, 1.0), (5000.0, 0.05)]
    J = np.stack([_bin_integrals(edges, T, W)[0] for T, W in cases])
    nuJ = np.stack([_bin_integrals(edges, T, W)[1] for T, W in cases])
    rf = rf_mod.fit_bin_parameters(J, nuJ, edges)
    for c, (T0, W0) in enumerate(cases):
        # only judge bins carrying meaningful flux
        good = J[c] > 1e-3 * J[c].max()
        assert np.all(np.abs(rf.T_R[c][good] / T0 - 1) < 0.03), (
            rf.T_R[c][good], T0)
        assert np.all(np.abs(rf.W[c][good] / W0 - 1) < 0.03)


def test_empty_bins_are_zero():
    edges = rf_mod.make_bin_edges(1e14, 3e15, 16)
    J = np.zeros((2, 16))
    nuJ = np.zeros((2, 16))
    J[0, 5] = 1e3
    nuJ[0, 5] = 1e3 * np.sqrt(edges[5] * edges[6])
    rf = rf_mod.fit_bin_parameters(J, nuJ, edges)
    assert rf.W[1].sum() == 0.0
    assert rf.W[0, 5] > 0
    assert rf.W[0, [0, 1, 15]].sum() == 0.0


def test_Jnu_evaluation_matches_planck():
    edges = rf_mod.make_bin_edges(1e14, 3e15, 64)
    T0, W0 = 9000.0, 0.7
    J, nuJ = _bin_integrals(edges, T0, W0)
    rf = rf_mod.fit_bin_parameters(J[None], nuJ[None], edges)
    nu_test = np.array([2e14, 6e14, 1.2e15])
    got = rf.Jnu_at(nu_test)[0]
    expect = W0 * (2.0 * H * nu_test**3 / CLIGHT**2
                   / np.expm1(H * nu_test / (KB * T0)))
    np.testing.assert_allclose(got, expect, rtol=0.05)
    # outside the binned range -> 0
    assert rf.Jnu_at(np.array([1e13, 1e16]))[0].sum() == 0.0
