"""Photoionisation subsystem tests: rate integrals against analytic
hydrogenic results, bf opacity tables, and bf absorption through the
transport kernel."""

import numpy as np
import pytest

from artis_tpu.atomic import _Builder, make_synthetic_atomic_data
from artis_tpu.constants import CLIGHT, EV, H, KB
from artis_tpu.phixs import make_hydrogenic_phixs
from artis_tpu.plasma import photoion


@pytest.fixture(scope="module")
def ad():
    return make_synthetic_atomic_data()


@pytest.fixture(scope="module")
def ph(ad):
    return make_hydrogenic_phixs(ad)


def test_phixs_structure(ad, ph):
    assert ph.ncont > 0
    # sorted by ascending edge frequency
    assert np.all(np.diff(ph.cont_nu_edge) >= 0)
    # every continuum's lower level is below its target in energy
    assert np.all(ad.level_energy[ph.cont_upperlevel]
                  > ad.level_energy[ph.cont_level])
    # sigma declines as nu^-3
    s = ph.cont_sigma[0]
    x = ph.x_grid
    np.testing.assert_allclose(s, s[0] * x**-3, rtol=1e-10)


def test_sigma_interpolation(ad, ph):
    nu_e = ph.cont_nu_edge[0]
    # below the edge: zero
    assert ph.sigma_at(0, np.array([0.9 * nu_e]))[0] == 0.0
    # at the edge: sigma0
    np.testing.assert_allclose(ph.sigma_at(0, np.array([nu_e]))[0],
                               ph.cont_sigma[0, 0], rtol=1e-6)
    # above the table: nu^-3 extrapolation continues smoothly
    nu_hi = nu_e * ph.nu_max_factor * 2
    got = ph.sigma_at(0, np.array([nu_hi]))[0]
    assert got < ph.cont_sigma[0, -1]


def test_alpha_sp_scaling(ad, ph):
    """alpha_sp should decrease with temperature roughly as T^-1/2..-1
    for hydrogenic cross sections, and be positive."""
    Te = np.array([5000.0, 10000.0, 20000.0])
    rates = photoion.compute_rates(ad, ph, Te, Te, np.ones(3),
                                   np.full(3, 1e8))
    a = rates.alpha_sp[:, 0]
    assert np.all(a > 0)
    assert a[0] > a[1] > a[2]
    # order of magnitude: typical radiative recombination coefficients
    # are 1e-14..1e-11 cm^3/s
    assert 1e-16 < a[1] < 1e-9


def test_milne_detailed_balance(ad, ph):
    """In strict LTE (W=1, T_R=Te), photoionisation of the Saha-Boltzmann
    population must balance recombination: n_l gamma = n_u ne alpha
    (with stimulated recombination included in gamma's correction).

    gamma = (n_u ne / n_l) alpha_sp = alpha_sp / sahafact."""
    Te = np.array([15000.0])
    nne = np.array([1e10])
    rates = photoion.compute_rates(ad, ph, Te, Te, np.ones(1), nne)
    lhs = rates.gamma_corr[0]  # per lower-ion atom
    rhs = rates.alpha_sp[0] / rates.sahafact[0]
    ratio = lhs / np.maximum(rhs, 1e-300)
    sel = (rates.alpha_sp[0] > 0) & (lhs > 0)
    # the same integrand appears on both sides (Milne relation), so
    # the balance should hold to integration accuracy
    np.testing.assert_allclose(ratio[sel], 1.0, rtol=0.05)


def test_bf_opacity_tables(ad, ph):
    ncells = 3
    nl = np.full((ncells, ad.nlevels_total), 1e5)
    Te = np.full(ncells, 10000.0)
    tabs = photoion.build_bf_opacity_tables(
        ad, ph, nl, Te, x_unit=1.0, nu_min=1e13, nu_max=5e15)
    chi = tabs["chi_bf"]
    assert chi.shape == (ncells, 1024)
    assert np.all(chi >= 0)
    assert chi.max() > 0
    # opacity rises with frequency past the first edges (more continua
    # become active), within the first decade
    nz = np.nonzero(chi[0])[0]
    assert len(nz) > 10
    # selection cumulative rows are nondecreasing
    sel = tabs["bf_sel_cum"]
    assert np.all(np.diff(sel, axis=2) >= -1e-3)


def test_bf_absorption_through_kernel(ad, ph):
    """Packets crossing a pure-bf medium convert to MA/kpkt at the rate
    1 - exp(-chi_bf d)."""
    import jax.numpy as jnp
    from test_line_transport import make_rpkts, make_tables, make_params
    from test_line_transport import run_detailed
    from artis_tpu.packets import TYPE_ESCAPE

    params = make_params()
    # single fake continuum with edge below the packet frequency
    nu_pkt = 6e14
    f32 = jnp.float32
    import dataclasses as dc
    params = dc.replace(
        params,
        cont_nu_edge=jnp.asarray([4e14], f32),
        cont_upperlevel=jnp.asarray([1], jnp.int32),
        cont_level=jnp.asarray([0], jnp.int32),
        cont_sigma=jnp.full((1, 100), 1e-18, f32),
        cont_nuinc=f32(0.1))
    tables = make_tables(ncells=1, rmax=0.2)
    chi_bf_val = 6.0  # per sim length
    tables["chi_bf"] = jnp.full((2, 1024), chi_bf_val, f32)
    sel = np.zeros((2, 128, 1), np.float32)
    sel[:, :, 0] = 1.0
    tables["bf_sel_cum"] = jnp.asarray(sel)

    n = 3000
    pk = make_rpkts(n, r0=0.02, nu_cmf=nu_pkt)
    out, est = run_detailed(pk, tables, params, t2=1.6)
    interacted = np.asarray(out.interactions) > 0
    d_geo = (0.2 - 0.02) / (1.0 - 0.2)
    expect = 1.0 - np.exp(-chi_bf_val * d_geo)
    assert abs(interacted.mean() - expect) < 0.08
    # all packets processed: escaped, or carried to the end of the
    # timestep (absorbed ones thermalise and re-emit)
    done = ((np.asarray(out.ptype) == TYPE_ESCAPE)
            | (np.asarray(out.prop_time) >= 1.6 - 1e-5))
    assert np.all(done)


def test_multi_target_phixs_expansion(ad, tmp_path):
    """A probability-split phixs table (upperlevel < 0,
    input.cc:306-318) expands into one continuum per target with
    prob-scaled sigma; single-target rows stay intact."""
    from artis_tpu.phixs import read_phixs_data
    z = int(ad.elem_z[0])
    npts = 5
    sig = [1.0, 0.8, 0.6, 0.5, 0.4]  # Mbarn
    with open(tmp_path / "phixsdata_v2.txt", "w") as f:
        f.write(f"{npts}\n0.1\n")
        # multi-target: ground of ion 2 with p=0.75, level 2 with 0.25
        f.write(f"{z} 2 -1 1 1 5.0\n2\n1 0.75\n2 0.25\n")
        f.write("\n".join(str(v) for v in sig) + "\n")
        # single-target control row from level 2
        f.write(f"{z} 2 1 1 2 4.0\n")
        f.write("\n".join(str(v) for v in sig) + "\n")
    ph = read_phixs_data(str(tmp_path), ad)
    lvl0 = ad.ion_level_start[0]
    rows = np.nonzero(ph.cont_level == lvl0)[0]
    assert len(rows) == 2  # the two targets
    # total cross section preserved (sum of prob-scaled entries)
    tot = ph.cont_sigma[rows].sum(axis=0)
    np.testing.assert_allclose(tot, np.array(sig) * 1e-18, rtol=1e-12)
    # the excited-target entry has a higher threshold
    up_e = ad.level_energy[ph.cont_upperlevel[rows]]
    edges = ph.cont_nu_edge[rows]
    assert edges[np.argmax(up_e)] >= edges[np.argmin(up_e)]
    # single-target row intact
    rows2 = np.nonzero(ph.cont_level == lvl0 + 1)[0]
    assert len(rows2) == 1
    np.testing.assert_allclose(ph.cont_sigma[rows2[0]],
                               np.array(sig) * 1e-18, rtol=1e-12)


def test_rate_luts_match_direct_integrals(ad, ph):
    """The per-continuum u-LUT fast path (photoion._rate_luts) must
    reproduce the direct Wien-resolved integrals it replaced to
    interpolation accuracy (<0.1%) across the temperature range."""
    from artis_tpu.plasma.photoion import (_rate_luts,
                                           _upsampled_grids, _lut_eval)
    from artis_tpu.constants import H, KB, CLIGHT

    sig, nu, dnu, x_f = _upsampled_grids(ph)
    logu, logFa, logFb = _rate_luts(ph)
    rng = np.random.default_rng(5)
    T = rng.uniform(2000.0, 60000.0, 7)
    edge = ph.cont_nu_edge
    for Ti in T:
        with np.errstate(over="ignore"):
            eT = np.exp(-np.minimum(H * nu / (KB * Ti), 500.0))
        direct_a = np.sum(sig * (2.0 / CLIGHT**2) * nu**2 * eT * dnu,
                          axis=1)
        direct_b = np.sum(sig * (nu - edge[:, None]) * 2.0 * H
                          / CLIGHT**2 * nu**2 * eT * dnu, axis=1)
        u = (H / KB) * edge[None, :] / Ti
        lut_a = _lut_eval(logFa, logu, u)[0]
        lut_b = _lut_eval(logFb, logu, u)[0]
        sel = direct_a > direct_a.max() * 1e-12
        np.testing.assert_allclose(lut_a[sel], direct_a[sel],
                                   rtol=1e-3)
        sel = direct_b > direct_b.max() * 1e-12
        np.testing.assert_allclose(lut_b[sel], direct_b[sel],
                                   rtol=1e-3)


def test_sig_bins_vectorised_matches_sigma_at(ad, ph):
    """The vectorised all-continua bin interpolation in
    build_bf_opacity_tables must equal the per-continuum sigma_at."""
    nu_bins = np.geomspace(1e14, 5e15, 257)
    from artis_tpu.plasma.photoion import build_bf_opacity_tables
    nl = np.ones((2, ad.nlevels_total))
    out = build_bf_opacity_tables(ad, ph, nl, np.array([8e3, 9e3]),
                                  1.0, 1e14, 5e15, nbins=257)
    sig_cached = ph._sig_bins_cache[1]
    nu_c = np.exp(np.log(1e14) + (np.arange(257) + 0.5)
                  * (np.log(5e15) - np.log(1e14)) / 257)
    for i in (0, ph.ncont // 2, ph.ncont - 1):
        np.testing.assert_allclose(sig_cached[i], ph.sigma_at(i, nu_c),
                                   rtol=1e-10, atol=1e-30)
