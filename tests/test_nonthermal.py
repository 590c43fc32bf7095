"""Spencer-Fano solver tests: energy-fraction physics checks (the
Kozma & Fransson 1992 behaviour the reference reproduces)."""

import numpy as np
import pytest

from artis_tpu.atomic import make_synthetic_atomic_data
from artis_tpu.plasma import lte
from artis_tpu.plasma.nonthermal import (SpencerFanoSolver,
                                         electron_loss_rate,
                                         xs_impact_ionization,
                                         lotz_collion)
from artis_tpu.constants import EV


@pytest.fixture(scope="module")
def ad():
    return make_synthetic_atomic_data()


@pytest.fixture(scope="module")
def solver(ad):
    return SpencerFanoSolver(ad, sfpts=384, emax_ev=2000.0)


def _state(ad, x_ion=0.5, ntot=1e7, T=8000.0):
    """Uniform toy plasma state with a given ionisation degree."""
    nd = np.zeros((1, ad.nelements))
    nd[:, :] = ntot / ad.nelements
    pops = lte.solve_lte_populations(ad, nd, np.array([T]))
    nl = lte.level_populations(ad, pops, np.array([T]))
    return pops, nl


def test_loss_rate_positive_and_decreasing():
    e = np.geomspace(1.0, 3000.0, 50) * EV
    L = electron_loss_rate(e, nne=1e8)
    assert np.all(L > 0)
    # loss rate per unit path falls with energy at high E
    assert L[-1] < L[10]


def test_ionization_xs_threshold(ad):
    rows = lotz_collion(ad)
    row = rows[0]
    en = np.array([0.5, 0.99, 1.5, 3.0, 10.0]) * row.ionpot_ev
    xs = xs_impact_ionization(en, row)
    assert xs[0] == 0 and xs[1] == 0
    assert np.all(xs[2:] > 0)
    # falls off at high energy (roughly ln(u)/u)
    assert xs[4] < xs[3]


def test_fully_ionised_plasma_heats(solver, ad):
    """With no bound electrons (levelpops ~ 0), all the energy must go
    to heating."""
    ncells = 1
    nne = np.array([1e8])
    nl = np.zeros((ncells, ad.nlevels_total))
    iond = np.zeros((ncells, ad.nions_total))
    sol = solver.solve(nne, nl, iond)
    np.testing.assert_allclose(sol.frac_heating, 1.0, atol=1e-6)
    assert sol.frac_ionization[0] == 0.0


def test_fractions_sum_to_one(solver, ad):
    pops, nl = _state(ad)
    sol = solver.solve(pops.nne, nl, pops.ion_numberdens)
    s = (sol.frac_heating + sol.frac_ionization
         + sol.frac_excitation)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    assert sol.frac_heating[0] > 0
    assert sol.frac_ionization[0] > 0


def test_more_neutrals_less_heating(solver, ad):
    """Lower ionisation (more bound electrons per free electron) pushes
    energy from heating into ionisation/excitation — the classic KF92
    trend."""
    nd = np.zeros((1, ad.nelements))
    nd[:, :] = 1e7 / ad.nelements

    sols = []
    for T in (6000.0, 14000.0):
        pops = lte.solve_lte_populations(ad, nd, np.array([T]))
        nl = lte.level_populations(ad, pops, np.array([T]))
        sols.append(solver.solve(pops.nne, nl, pops.ion_numberdens))
        x_e = pops.nne[0] / nd.sum()
    lowT, highT = sols
    # the colder plasma is less ionised -> smaller heating fraction
    assert lowT.frac_heating[0] < highT.frac_heating[0]


def test_ion_rates_positive_where_populated(solver, ad):
    pops, nl = _state(ad)
    sol = solver.solve(pops.nne, nl, pops.ion_numberdens)
    pop = pops.ion_numberdens[0]
    rates = sol.ion_rate_per_dep[0]
    assert np.all(rates[pop > 1e-3 * pop.max()] >= 0)
    assert rates.max() > 0
