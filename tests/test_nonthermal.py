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


DATA_DIR = "/root/repo/refbuild/run/classic_sph"


@pytest.mark.skipif(not __import__("os").path.exists(
    DATA_DIR + "/collion.txt"), reason="reference data files absent")
def test_auger_data_shifts_sf_fractions(ad):
    """Reading collion.txt + auger-km1993-table2.txt attaches Auger
    probabilities to inner shells; on an Fe-rich cell the SF solution
    changes (Auger electrons add to the degradation spectrum) and the
    per-ion multi-electron probabilities become non-trivial
    (read_auger_data + calculate_eff_ionpot, nonthermal.cc:255-385,
    1440-1545)."""
    from artis_tpu.plasma.nonthermal import (read_collion,
                                             read_auger_data)
    rows = read_collion(DATA_DIR)
    n_applied = read_auger_data(DATA_DIR, rows)
    assert n_applied > 50  # K&M1993 covers Z<=30 inner shells
    # every shell's P(n_Auger) remains a probability distribution
    for r in rows:
        s = sum(r.prob_num_auger)
        assert abs(s - 1.0) < 2e-3, (r.Z, r.nelec, r.n, r.l, s)
    assert any(r.en_auger_ev > 0 for r in rows)
    assert any(r.prob_num_auger[1] > 0.5 for r in rows)  # K shells

    # Fe-rich LTE cell
    nd = np.zeros((1, ad.nelements))
    nd[0, :] = 1e5
    nd[0, 1] = 1e7  # Fe (elements: Si, Fe, Co, Ni)
    Te = np.array([8000.0])
    pops = lte.solve_lte_populations(ad, nd, Te)
    nl = lte.level_populations(ad, pops, Te)
    nne = np.maximum(pops.nne, 1e6)

    s_aug = SpencerFanoSolver(ad, sfpts=192, colliondata=rows)
    rows_plain = read_collion(DATA_DIR)  # no Auger attached
    s_plain = SpencerFanoSolver(ad, sfpts=192, colliondata=rows_plain)
    sol_a = s_aug.solve(nne, nl, pops.ion_numberdens)
    sol_p = s_plain.solve(nne, nl, pops.ion_numberdens)

    # Auger contribution changes the degradation spectrum -> the
    # heating/ionisation split shifts
    assert sol_a.frac_ionization[0] != pytest.approx(
        sol_p.frac_ionization[0], rel=1e-6)
    # multi-electron probabilities: with Auger on, some populated ion
    # has P(>=1 extra electron) > 0; without, all mass sits at a=0
    pa = sol_a.prob_num_auger[0]
    pp = sol_p.prob_num_auger[0]
    np.testing.assert_allclose(pa.sum(axis=1), 1.0, atol=1e-6)
    assert pp[:, 1:].max() == 0.0
    assert pa[:, 1:].max() > 0.01


def test_solution_reuse_policy(ad):
    """The reuse policy (nonthermal.cc:2559-2581): within the
    nne-per-ion tolerance and the timestep window, the previous
    per-cell solution is returned without re-solving."""
    s = SpencerFanoSolver(ad, sfpts=256, emax_ev=2000.0)
    pops, nl = _state(ad)
    nne = np.array([5e6])
    sol0 = s.solve(nne, nl, pops.ion_numberdens, timestep=5,
                   max_ts_between_solutions=2)
    # tiny drift, next timestep: reused (bit-identical rows)
    calls = {"n": 0}
    orig = s._build_matrices

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    s._build_matrices = counting
    sol1 = s.solve(nne * 1.001, nl, pops.ion_numberdens, timestep=6,
                   max_ts_between_solutions=2)
    assert calls["n"] == 0
    np.testing.assert_array_equal(sol1.frac_heating, sol0.frac_heating)
    np.testing.assert_array_equal(sol1.ion_rate_per_dep,
                                  sol0.ion_rate_per_dep)
    # a large nne change forces a re-solve
    sol2 = s.solve(nne * 3.0, nl, pops.ion_numberdens, timestep=7,
                   max_ts_between_solutions=2)
    assert calls["n"] == 1
    assert not np.array_equal(sol2.frac_heating, sol0.frac_heating)
    # an expired window forces a re-solve even with no drift
    s.solve(nne * 3.0, nl, pops.ion_numberdens, timestep=20,
            max_ts_between_solutions=2)
    assert calls["n"] == 2


def test_batched_solve_matches_reference_assembly(ad):
    """The batched diagonal-band assembly + upper-triangular
    back-substitution must reproduce the naive per-cell dense assembly
    + LU solve (same discretisation as sfmatrix assembly + solve,
    nonthermal.cc:2282-2520) to float64 round-off, including with
    Auger-carrying collion shells when the data files are present."""
    import os
    rows = None
    if os.path.exists(DATA_DIR + "/collion.txt"):
        from artis_tpu.plasma.nonthermal import (read_collion,
                                                 read_auger_data)
        rows = read_collion(DATA_DIR)
        read_auger_data(DATA_DIR, rows)
    nd = np.zeros((3, ad.nelements))
    nd[:, :] = 1e7 / ad.nelements
    T = np.array([6000.0, 9000.0, 14000.0])
    pops = lte.solve_lte_populations(ad, nd, T)
    nl = lte.level_populations(ad, pops, T)
    s = SpencerFanoSolver(ad, sfpts=192, emax_ev=2000.0,
                          colliondata=rows)
    sol = s.solve(pops.nne, nl, pops.ion_numberdens, store_y=True)
    for c in range(3):
        M = s._build_matrix_ref(float(pops.nne[c]), nl[c],
                                pops.ion_numberdens[c])
        # the matrix is exactly upper triangular by construction
        assert np.all(np.tril(M, -1) == 0.0)
        y = np.linalg.solve(M, s.rhs)
        np.testing.assert_allclose(sol.y[c], y, rtol=1e-9,
                                   atol=1e-12 * np.abs(y).max())


def test_sf_grid_convergence(ad):
    """The deposition fractions must be converged in the energy-grid
    resolution: sfpts=256 vs 768 agree to a few percent (the
    reference runs SFPTS=4096; the default here is 384 — this guards
    the coarser grid)."""
    pops, nl = _state(ad)
    out = {}
    for n in (256, 768):
        s = SpencerFanoSolver(ad, sfpts=n, emax_ev=2000.0)
        sol = s.solve(pops.nne, nl, pops.ion_numberdens)
        out[n] = (sol.frac_heating[0], sol.frac_ionization[0])
    assert abs(out[256][0] - out[768][0]) < 0.03
    assert abs(out[256][1] - out[768][1]) < 0.03
