import numpy as np
import pytest

from artis_tpu.constants import DAY, MEV
from artis_tpu.decay import DecayModel, bateman_chain_abund, find_decay_paths
from artis_tpu.nucdata import (DECAYTYPE_BETAPLUS, DECAYTYPE_ELECTRONCAPTURE,
                               NuclideTable, nucmass)


@pytest.fixture(scope="module")
def nt():
    return NuclideTable.create()


def test_nuclide_table_basics(nt):
    assert nt.exists(28, 56)
    assert nt.exists(27, 56)
    ni56 = nt.get(28, 56)
    assert abs(ni56.meanlife - 8.80 * DAY) < 1.0
    # Ni56 gamma energy per decay ~1.72 MeV from the line table
    assert 1.6 * MEV < ni56.endecay_gamma < 1.85 * MEV
    co56 = nt.get(27, 56)
    assert 3.5 * MEV < co56.endecay_gamma < 3.8 * MEV
    assert co56.endecay_positron > 0


def test_decay_paths(nt):
    paths = find_decay_paths(nt)
    # Ni56 -> Co56 and the standalone Co56 path must both exist
    lens = {(p.z, p.a): p.length for p in paths}
    assert (28, 56) in {(p.z[0], p.a[0]) for p in paths}
    two_step = [p for p in paths if p.length == 2 and p.z[0] == 28
                and p.a[0] == 56]
    assert len(two_step) == 1
    assert two_step[0].z[1] == 27  # Co56
    one_step_co = [p for p in paths if p.length == 1 and p.z[0] == 27
                   and p.a[0] == 56]
    assert len(one_step_co) == 1


def test_bateman_single_decay():
    # single nuclide: plain exponential
    tau = 8.8 * DAY
    n0 = np.array([1.0])
    for t in [0.0, tau, 3 * tau]:
        out = bateman_chain_abund(n0, [tau], t)
        np.testing.assert_allclose(out, np.exp(-t / tau), rtol=1e-12)


def test_bateman_two_chain_matches_analytic():
    tau1, tau2 = 8.8 * DAY, 113.7 * DAY
    l1, l2 = 1 / tau1, 1 / tau2
    n0 = np.array([1.0])
    for t in [0.1 * DAY, 10 * DAY, 100 * DAY]:
        out = bateman_chain_abund(n0, [tau1, tau2], t)
        analytic = l1 / (l2 - l1) * (np.exp(-l1 * t) - np.exp(-l2 * t))
        np.testing.assert_allclose(out, analytic, rtol=1e-10)


def test_bateman_stable_end():
    # chain ending on a stable species accumulates to the parent decays
    tau1 = 8.8 * DAY
    n0 = np.array([1.0])
    out = bateman_chain_abund(n0, [tau1, -1.0], 1000 * tau1)
    np.testing.assert_allclose(out, 1.0, rtol=1e-8)


@pytest.fixture(scope="module")
def dm(nt):
    ncells = 4
    abund = np.zeros((ncells, len(nt)))
    abund[:, nt.index(28, 56)] = [0.5, 0.25, 0.1, 0.0]
    return DecayModel(nt, abund, t_model=1.0 * DAY)


def test_endecay_total_consistency(dm, nt):
    # energy released t_model..inf = N_Ni56 * (E_Ni56 + E_Co56 decays)
    ni56 = nt.get(28, 56)
    co56 = nt.get(27, 56)
    n_ni = 0.5 / nucmass(28, 56)
    expected = n_ni * (ni56.endecay_gamma
                       + co56.endecay_gamma + co56.endecay_positron)
    total = np.zeros(4)
    for p in dm.paths:
        total += dm.endecay_to_tinf_at_time(p, dm.t_model)
    np.testing.assert_allclose(total[0], expected, rtol=1e-6)
    assert total[3] == 0.0


def test_endecay_between_times_positive_and_additive(dm):
    t1, t2, t3 = 3 * DAY, 10 * DAY, 30 * DAY
    for p in dm.paths:
        e12 = dm.endecay_between_times(p, t1, t2)
        e23 = dm.endecay_between_times(p, t2, t3)
        e13 = dm.endecay_between_times(p, t1, t3)
        assert np.all(e12 >= -1e-20)
        np.testing.assert_allclose(e12 + e23, e13, rtol=1e-8, atol=1e-30)


def test_nuc_massfrac_evolution(dm, nt):
    # Ni56 decays away; Co56 rises then falls; Fe56 (outside network)
    # accumulates monotonically
    times = np.array([1.0, 10.0, 50.0, 300.0]) * DAY
    x_ni = np.array([dm.nuc_massfrac(28, 56, t)[0] for t in times])
    x_co = np.array([dm.nuc_massfrac(27, 56, t)[0] for t in times])
    x_fe = np.array([dm.nuc_massfrac(26, 56, t)[0] for t in times])
    assert np.all(np.diff(x_ni) < 0)
    assert x_co[1] > x_co[0] and x_co[-1] < x_co[2]
    assert np.all(np.diff(x_fe) > 0)
    # mass conservation within the A=56 family
    np.testing.assert_allclose(x_ni + x_co + x_fe, 0.5, rtol=1e-6)


def test_expansion_factor_below_one(dm):
    # energy with expansion losses must be below plain energy release
    tstart = 5 * DAY
    with_exp = dm.endecay_t0_to_time_withexpansion(tstart)
    plain = np.zeros(4)
    for p in dm.paths:
        plain += dm.endecay_between_times(p, dm.t_model, tstart)
    assert np.all(with_exp[:3] < plain[:3])
    assert np.all(with_exp[:3] > 0)


def test_sample_decay_times_in_range(dm):
    rng = np.random.default_rng(0)
    pidx = np.zeros(1000, dtype=np.int64)
    t = dm.sample_decay_times(pidx, tmax=30 * DAY, rng=rng,
                              tdecaymin=dm.t_model)
    assert np.all(t > dm.t_model)
    assert np.all(t < 30 * DAY)


def test_elemental_abundance_update(dm, nt):
    init = np.zeros((4, 30))
    init[:, 27] = 0.5  # Z=28 nickel holds the Ni56
    init[:, 13] = 0.5  # Z=14 silicon stable filler
    out = dm.update_elemental_abundances(init, list(range(1, 31)),
                                         300 * DAY)
    # after ~300 days most Ni56 -> Fe56 via Co56 (cell 0 is pure-Ni56
    # nickel; cells 1-3 have progressively more stable Ni)
    assert out[0, 27] < 0.05  # Ni dropped
    assert out[0, 25] > 0.4  # Fe rose
    np.testing.assert_allclose(out[0, 13], 0.5, rtol=1e-12)  # Si fixed
    # total mass is conserved in every cell
    np.testing.assert_allclose(out.sum(axis=1), 1.0, rtol=1e-6)
