import numpy as np
import pytest

from artis_tpu.atomic import (AtomicData, _Builder, make_synthetic_atomic_data)
from artis_tpu.constants import EV, H, KB, ME, PI
from artis_tpu.plasma import lte


@pytest.fixture(scope="module")
def ad():
    return make_synthetic_atomic_data()


def test_synthetic_structure(ad):
    assert ad.nelements == 4
    assert ad.nions_total == 2 + 3 + 3 + 3
    assert ad.nlines > 100
    # line list sorted by descending frequency (input.cc:482-486)
    assert np.all(np.diff(ad.line_nu) <= 0)
    assert np.all(ad.line_f > 0)
    assert np.all(ad.line_A > 0)
    # level energies are non-decreasing within each ion
    for i in range(ad.nions_total):
        eps = ad.level_epsilon_within_ion(i)
        assert np.all(np.diff(eps) >= 0)
        assert eps[0] == 0.0
    # upper level of every line is above the lower level in energy
    assert np.all(ad.level_energy[ad.line_upper]
                  > ad.level_energy[ad.line_lower])


def _hydrogen():
    b = _Builder()
    b.add_element(1, abundance=1.0, mass_amu=1.008)
    b.add_ion(1, 13.5984 * EV, [0.0], [2.0], [])
    b.add_ion(2, 1e9 * EV, [13.5984 * EV], [1.0], [])
    return b.finish()


def test_saha_hydrogen_analytic():
    ad = _hydrogen()
    T = np.array([8000.0, 12000.0, 20000.0])
    U = lte.partition_functions(ad, T)
    np.testing.assert_allclose(U[:, 0], 2.0)
    np.testing.assert_allclose(U[:, 1], 1.0)

    phi = lte.saha_phi(ad, T, U)
    # analytic inverse Saha factor: n1/(n2 ne)
    chi = 13.5984 * EV
    expected = (2.0 / 1.0 / 2.0 * (H**2 / (2 * PI * ME * KB * T)) ** 1.5
                * np.exp(chi / (KB * T)))
    np.testing.assert_allclose(phi[:, 0], expected, rtol=2e-4)


def test_hydrogen_ionisation_balance():
    ad = _hydrogen()
    rho = np.full(3, 1e-14)  # g/cm^3
    massfracs = np.zeros((3, 30))
    massfracs[:, 0] = 1.0
    nd = lte.elem_numberdens_from_massfracs(ad, rho, massfracs)
    T = np.array([5000.0, 15000.0, 40000.0])
    pops = lte.solve_lte_populations(ad, nd, T)
    # charge neutrality: nne == proton density
    np.testing.assert_allclose(pops.nne, pops.ion_numberdens[:, 1],
                               rtol=1e-6)
    # total conservation
    np.testing.assert_allclose(pops.ion_numberdens.sum(axis=1), nd[:, 0],
                               rtol=1e-9)
    # ionisation rises steeply with T (at this low density the Saha
    # equilibrium is already ~5% ionised at 5000 K)
    x = pops.ion_numberdens[:, 1] / nd[:, 0]
    assert x[0] < 0.1
    assert x[1] > x[0]
    assert x[2] > 0.99
    # mid T: verify against direct scalar Saha solution
    phi = lte.saha_phi(ad, T, lte.partition_functions(ad, T))[1, 0]
    ntot = nd[1, 0]
    # x^2/(1-x) = 1/(phi*ntot)
    a = 1.0 / (phi * ntot)
    x_expect = (-a + np.sqrt(a * a + 4 * a)) / 2
    np.testing.assert_allclose(x[1], x_expect, rtol=1e-5)


def test_level_populations_boltzmann(ad):
    T = np.array([10000.0])
    ncells = 1
    nd = np.ones((ncells, ad.nelements)) * 1e8
    pops = lte.solve_lte_populations(ad, nd, T)
    nl = lte.level_populations(ad, pops, T)
    assert nl.shape == (1, ad.nlevels_total)
    assert np.all(nl >= 0)
    # level populations of each ion sum to the ion population
    for i in range(ad.nions_total):
        s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        np.testing.assert_allclose(nl[0, s:e].sum(),
                                   pops.ion_numberdens[0, i], rtol=1e-6)
    # ground state is the most populated level of each ion at low T
    nl_cold = lte.level_populations(
        ad, lte.solve_lte_populations(ad, nd, np.array([3000.0])),
        np.array([3000.0]))
    for i in range(ad.nions_total):
        s, e = ad.ion_level_start[i], ad.ion_level_start[i + 1]
        seg = nl_cold[0, s:e]
        if seg.sum() > 0:
            assert np.argmax(seg / ad.level_g[s:e]) == 0


def test_reference_format_roundtrip(tmp_path, ad):
    """Write a dataset in the reference's file formats and read it back."""
    # write compositiondata.txt / adata.txt / transitiondata.txt
    with open(tmp_path / "compositiondata.txt", "w") as f:
        f.write(f"{ad.nelements}\n0\n0\n")
        for e in range(ad.nelements):
            s = ad.elem_ion_start[e]
            nions = ad.elem_nions[e]
            f.write(f"{ad.elem_z[e]} {nions} {ad.ion_stage[s]} "
                    f"{ad.ion_stage[s + nions - 1]} -1 "
                    f"{ad.elem_abundance[e]} {ad.elem_mass[e] / 1.67352e-24}\n")
    with open(tmp_path / "adata.txt", "w") as fa, \
            open(tmp_path / "transitiondata.txt", "w") as ft:
        for i in range(ad.nions_total):
            e = ad.ion_element[i]
            s, en = ad.ion_level_start[i], ad.ion_level_start[i + 1]
            eps = ad.level_epsilon_within_ion(i)
            fa.write(f"{ad.elem_z[e]} {ad.ion_stage[i]} {en - s} "
                     f"{ad.ion_ionpot[i] / EV}\n")
            for l in range(en - s):
                fa.write(f"{l + 1} {eps[l] / EV:.9e} "
                         f"{ad.level_g[s + l]} 0\n")
            lines_i = np.where(ad.line_ion == i)[0]
            order = np.lexsort((ad.line_upper[lines_i],
                                ad.line_lower[lines_i]))
            lines_i = lines_i[order]
            ft.write(f"{ad.elem_z[e]} {ad.ion_stage[i]} {len(lines_i)}\n")
            for k in lines_i:
                ft.write(f"{ad.line_lower[k] - s + 1} "
                         f"{ad.line_upper[k] - s + 1} "
                         f"{ad.line_A[k]:.9e} {ad.line_coll_str[k]} "
                         f"{int(ad.line_forbidden[k])}\n")

    from artis_tpu.atomic import read_atomic_data
    ad2 = read_atomic_data(str(tmp_path))
    assert ad2.nelements == ad.nelements
    assert ad2.nions_total == ad.nions_total
    assert ad2.nlines == ad.nlines
    np.testing.assert_allclose(np.sort(ad2.line_nu), np.sort(ad.line_nu),
                               rtol=1e-6)
    np.testing.assert_allclose(ad2.level_g, ad.level_g)
    # absolute level energies match (including ionisation offsets)
    np.testing.assert_allclose(ad2.level_energy, ad.level_energy,
                               rtol=1e-6, atol=1e-20)
