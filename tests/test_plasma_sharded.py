"""Rank-distributed grid solve == full-batch solve.

The reference splits the per-cell plasma solves (NLTE populations,
Spencer-Fano, thermal balance) over MPI ranks by contiguous cell range
and allgathers the results (setup_nstart_ndo, grid.cc:1931-1998;
sn3d.cc:191-314, 951-964).  artis_tpu's plasma.sharded does the same
row split over the DD plan's cell ranges; because every solver is
row-independent, the sharded result must be BITWISE equal to the
full-batch result — any drift means hidden cross-cell coupling.
"""

import numpy as np
import pytest

from artis_tpu.atomic import make_synthetic_atomic_data
from artis_tpu.phixs import make_hydrogenic_phixs
from artis_tpu.plasma import lte as lte_mod
from artis_tpu.plasma import nltepop as nltepop_mod
from artis_tpu.plasma import photoion as photoion_mod
from artis_tpu.plasma import sharded as sh
from artis_tpu.plasma import thermal as thermal_mod
from artis_tpu.plasma.nonthermal import SpencerFanoSolver


@pytest.fixture(scope="module")
def setup():
    ad = make_synthetic_atomic_data(
        seed=3, elements=((26, 3, 8), (27, 2, 6)))
    ph = make_hydrogenic_phixs(ad)
    ncells = 9  # deliberately not divisible by the range count
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


STARTS = (0, 2, 5, 9)  # 3 unequal ranks; last range largest


def test_nlte_sharded_matches_full(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    W = np.full(ncells, 0.4)
    TR = Te * 1.15
    pirates = photoion_mod.compute_rates(ad, ph, Te, TR, W, pops.nne)
    kw = dict(radfield=None, nt_ion_rate_ion=None,
              nt_auger_prob=None, jb_lu=None)
    full = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, TR, W, pops.nne,
        t_mid=10 * 86400.0, **kw)
    timings = []
    shard = sh.solve_nlte_pops_sharded(
        STARTS, ad, ph, pirates, nl_lte, nd, Te, TR, W, pops.nne,
        10 * 86400.0, timings=timings, **kw)
    np.testing.assert_array_equal(shard, full)
    assert len(timings) == 3 and all(t > 0 for t in timings)


def test_nlte_sharded_with_nt_rates(setup):
    # the NT ionisation inputs are per-cell [ncells, nions(*)]: the
    # slicer must cut them along with the state arrays
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    W = np.full(ncells, 0.3)
    pirates = photoion_mod.compute_rates(ad, ph, Te, Te, W, pops.nne)
    rng = np.random.default_rng(1)
    nt_ion = rng.uniform(0, 1e-7, (ncells, ad.nions_total))
    full = nltepop_mod.solve_nlte_pops(
        ad, ph, pirates, nl_lte, nd, Te, Te, W, pops.nne,
        t_mid=8 * 86400.0, nt_ion_rate_ion=nt_ion)
    shard = sh.solve_nlte_pops_sharded(
        STARTS, ad, ph, pirates, nl_lte, nd, Te, Te, W, pops.nne,
        8 * 86400.0, nt_ion_rate_ion=nt_ion)
    np.testing.assert_array_equal(shard, full)


def test_spencer_fano_sharded_matches_full(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    solver = SpencerFanoSolver(ad, sfpts=128, emax_ev=2000.0)
    ion_nd = nltepop_mod.ion_populations(ad, nl_lte)
    full = solver.solve(pops.nne, nl_lte, ion_nd)
    solver2 = SpencerFanoSolver(ad, sfpts=128, emax_ev=2000.0)
    timings = []
    shard = sh.solve_sf_sharded(solver2, STARTS, pops.nne, nl_lte,
                                ion_nd, timings=timings)
    # the SF matrix assembly is one [B, nion] @ [nion, sfpts^2] GEMM
    # whose reduction order depends on the batch size B, so slices
    # agree with the full batch to reduction-order noise (~1 ulp),
    # not bitwise
    np.testing.assert_allclose(shard.frac_heating,
                               full.frac_heating, rtol=1e-12)
    np.testing.assert_allclose(shard.ion_rate_per_dep,
                               full.ion_rate_per_dep, rtol=1e-12,
                               atol=1e-300)
    np.testing.assert_allclose(shard.prob_num_auger,
                               full.prob_num_auger, rtol=1e-12,
                               atol=1e-300)
    assert len(timings) == 3


def test_thermal_sharded_matches_full(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    rng = np.random.default_rng(2)
    TR = Te * 1.1
    W = np.full(ncells, 0.5)
    ffheat = rng.uniform(1e-12, 1e-10, ncells)
    colheat = rng.uniform(1e-12, 1e-10, ncells)
    vol = rng.uniform(1e40, 1e42, ncells)
    t_mid = 12 * 86400.0
    per_cell = dict(elem_numberdens=nd, TR=TR, W=W,
                    ffheat_est=ffheat, colheat_est=colheat,
                    vol_tmin=vol)
    repl = dict(ad=ad, ph=ph, t_mid=t_mid, tmin=10 * 86400.0,
                mintemp=2000.0, maxtemp=50000.0)
    full = thermal_mod.solve_Te(**{k: np.asarray(v) for k, v
                                   in per_cell.items()}, **repl)
    shard = sh.solve_te_sharded(STARTS, thermal_mod.solve_Te,
                                ncells, per_cell, repl)
    np.testing.assert_array_equal(shard, full)


def test_slice_rows_never_slices_replicated_nu_edges():
    """A replicated array whose leading dim coincidentally equals
    ncells (BinnedRadField.nu_edges has nbins+1 entries) must pass
    through _slice_rows untouched — slicing it would silently shift
    every radfield bin lookup in a DD run with nmodel == nbins+1."""
    from artis_tpu.plasma.radfield import BinnedRadField

    ncells = 5
    nbins = ncells - 1  # nu_edges length == ncells
    rf = BinnedRadField(
        nu_edges=np.geomspace(1e14, 1e16, nbins + 1),
        W=np.full((ncells, nbins), 0.5),
        T_R=np.full((ncells, nbins), 8000.0))
    out = sh._slice_rows(rf, slice(1, 3), ncells)
    np.testing.assert_array_equal(out.nu_edges, rf.nu_edges)
    assert out.W.shape == (2, nbins)
    assert out.T_R.shape == (2, nbins)


def test_run_ranges_concurrent_matches_serial(setup):
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    W = np.full(ncells, 0.4)
    TR = Te * 1.15
    pirates = photoion_mod.compute_rates(ad, ph, Te, TR, W, pops.nne)
    kw = dict(radfield=None, nt_ion_rate_ion=None,
              nt_auger_prob=None, jb_lu=None)
    serial = sh.solve_nlte_pops_sharded(
        STARTS, ad, ph, pirates, nl_lte, nd, Te, TR, W, pops.nne,
        10 * 86400.0, workers=1, **kw)
    timings = []
    conc = sh.solve_nlte_pops_sharded(
        STARTS, ad, ph, pirates, nl_lte, nd, Te, TR, W, pops.nne,
        10 * 86400.0, workers=3, timings=timings, **kw)
    np.testing.assert_array_equal(conc, serial)
    assert len(timings) == 3


def test_sf_sharded_reuse_gating(setup):
    """solve_sf_sharded applies the full-batch reuse gate
    (nonthermal.cc:2559-2581): a second call at the next timestep with
    unchanged nne-per-ion must reuse every cell (no fresh solves) and
    return the same solution."""
    ad, ph, ncells, Te, nd, pops, nl_lte = setup
    solver = SpencerFanoSolver(ad, sfpts=128, emax_ev=2000.0)
    ion_nd = nltepop_mod.ion_populations(ad, nl_lte)
    s1 = sh.solve_sf_sharded(solver, STARTS, pops.nne, nl_lte, ion_nd,
                             timestep=3, max_ts_between_solutions=2)
    assert np.all(solver._ts_last_solved == 3)
    s2 = sh.solve_sf_sharded(solver, STARTS, pops.nne, nl_lte, ion_nd,
                             timestep=4, max_ts_between_solutions=2)
    # all cells gated -> previous solution carried over verbatim
    np.testing.assert_array_equal(s2.frac_heating, s1.frac_heating)
    np.testing.assert_array_equal(s2.ion_rate_per_dep,
                                  s1.ion_rate_per_dep)
    assert np.all(solver._ts_last_solved == 3)  # no fresh solve
    # beyond the age limit every cell re-solves
    s3 = sh.solve_sf_sharded(solver, STARTS, pops.nne, nl_lte, ion_nd,
                             timestep=7, max_ts_between_solutions=2)
    assert np.all(solver._ts_last_solved == 7)
    np.testing.assert_allclose(s3.frac_heating, s1.frac_heating,
                               rtol=1e-12)
