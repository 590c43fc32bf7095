"""NLTE population solver tests.

The key physics check is detailed balance: with an undiluted blackbody
radiation field at the electron temperature (W=1, T_R=T_e), every rate
pair entering the statistical-equilibrium matrix balances at the LTE
populations — radiative excitation against Sobolev-escape deexcitation,
Van Regemorter / Axelrod / effective-collision-strength pairs, and
photoionisation against spontaneous+collisional recombination (the
gamma integrand equals the alpha_sp integrand divided by the Saha
factor on the same quadrature grid). So the NLTE solve must reproduce
the Saha/Boltzmann populations; the reference asserts the same physics
via its superlevel departure coefficients (nltepop.cc:1008-1061).
"""

import numpy as np
import pytest

from artis_tpu.atomic import make_synthetic_atomic_data
from artis_tpu.phixs import make_hydrogenic_phixs
from artis_tpu.plasma import lte as lte_mod
from artis_tpu.plasma import nltepop as nltepop_mod
from artis_tpu.plasma import photoion as photoion_mod


@pytest.fixture(scope="module")
def setup():
    ad = make_synthetic_atomic_data(
        seed=3, elements=((26, 3, 8), (27, 2, 6)))
    ph = make_hydrogenic_phixs(ad)
    ncells = 5
    rng = np.random.default_rng(0)
    Te = np.linspace(6000.0, 16000.0, ncells)
    rho = 10 ** rng.uniform(-14.5, -12.5, ncells)
    massfracs = np.zeros((ncells, 30))
    massfracs[:, 25] = 0.7
    massfracs[:, 26] = 0.3
    nd = lte_mod.elem_numberdens_from_massfracs(ad, rho, massfracs)
    pops = lte_mod.solve_lte_populations(ad, nd, Te)
    nl_lte = lte_mod.level_populations(ad, pops, Te)
    return ad, ph, ncells, Te, nd, pops, nl_lte


def test_detailed_balance_recovers_lte(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    W = np.ones(ncells)
    pirates = photoion_mod.compute_rates(ad, ph, Te, Te, W, pops.nne)
    nl = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, Te, W, pops.nne,
        t_mid=10 * 86400.0)
    # compare populations that are non-negligible within their element
    for e in range(ad.nelements):
        l0 = ad.ion_level_start[ad.elem_ion_start[e]]
        l1 = ad.ion_level_start[ad.elem_ion_start[e + 1]]
        ref = nl_lte[:, l0:l1]
        got = nl[:, l0:l1]
        sig = ref > 1e-8 * nd[:, e][:, None]
        assert np.allclose(got[sig], ref[sig], rtol=0.02), (
            np.abs(got[sig] / ref[sig] - 1).max())


def test_conservation_and_positivity(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    # dilute field shifts the balance but conservation must hold
    W = np.full(ncells, 0.3)
    TR = Te * 1.2
    pirates = photoion_mod.compute_rates(ad, ph, Te, TR, W, pops.nne)
    nl = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, TR, W, pops.nne,
        t_mid=10 * 86400.0)
    assert np.all(nl > 0)
    ionpops = nltepop_mod.ion_populations(ad, nl)
    for e in range(ad.nelements):
        i0, i1 = ad.elem_ion_start[e], ad.elem_ion_start[e + 1]
        assert np.allclose(ionpops[:, i0:i1].sum(axis=1), nd[:, e],
                           rtol=1e-6)
    # dilute, hotter field: departure from LTE must actually happen
    assert not np.allclose(nl, nl_lte, rtol=0.05)


def test_empty_cells_are_floored(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    nd0 = nd.copy()
    nd0[2] = 0.0
    W = np.ones(ncells)
    pirates = photoion_mod.compute_rates(ad, ph, Te, Te, W, pops.nne)
    nl = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd0, Te, Te, W, pops.nne,
        t_mid=10 * 86400.0)
    assert np.all(nl[2] == nltepop_mod.MINPOP)
    assert np.all(np.isfinite(nl))


def test_nne_from_levelpops(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    nne = nltepop_mod.nne_from_levelpops(ad, nl_lte)
    assert np.allclose(nne, pops.nne, rtol=1e-6)


def test_superlevel_fold_matches_full_solve(monkeypatch):
    """Superlevel folding (nltepop.cc:200-260, superlevel_boltzmann
    nltepop.cc:1543-1555): levels above the per-ion NLTE cap collapse
    into one matrix row with LTE-at-T_e internal distribution. In
    detailed-balance (undiluted blackbody) conditions the folded solve
    must agree with the full all-levels solve, and particle
    conservation must hold exactly."""
    ad = make_synthetic_atomic_data(seed=5, elements=((28, 2, 120),))
    ph = make_hydrogenic_phixs(ad)
    ncells = 3
    Te = np.linspace(7000.0, 12000.0, ncells)
    rho = np.full(ncells, 1e-13)
    massfracs = np.zeros((ncells, 30))
    massfracs[:, 27] = 1.0
    nd = lte_mod.elem_numberdens_from_massfracs(ad, rho, massfracs)
    pops = lte_mod.solve_lte_populations(ad, nd, Te)
    nl_lte = lte_mod.level_populations(ad, pops, Te)
    W = np.ones(ncells)
    pirates = photoion_mod.compute_rates(ad, ph, Te, Te, W, pops.nne)

    # folded: default cap 80 -> levels 81..119 of each ion fold
    nl_sl = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, Te, W, pops.nne,
        t_mid=10 * 86400.0)
    # full: cap raised above the level count -> no superlevel
    monkeypatch.setattr(nltepop_mod, "NLTE_CAP_DEFAULT", 10_000)
    nl_full = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, Te, W, pops.nne,
        t_mid=10 * 86400.0)

    # exact particle conservation in both
    for nl in (nl_sl, nl_full):
        np.testing.assert_allclose(nl.sum(axis=1), nd[:, 0],
                                   rtol=1e-10)
    # ion-stage totals agree closely
    ion_sl = nltepop_mod.ion_populations(ad, nl_sl)
    ion_full = nltepop_mod.ion_populations(ad, nl_full)
    sig = ion_full > 1e-8 * ion_full.max()
    np.testing.assert_allclose(ion_sl[sig], ion_full[sig], rtol=0.05)
    # individually-treated levels agree; superlevel members follow
    # the LTE-at-Te internal distribution to solver tolerance
    big = nl_full > 1e-6 * nl_full.max(axis=1, keepdims=True)
    rel = np.abs(nl_sl[big] / nl_full[big] - 1)
    assert np.median(rel) < 0.05
    assert rel.max() < 0.5
