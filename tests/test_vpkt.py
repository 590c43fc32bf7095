"""Virtual packets (vpkt.cc analogue): peel-off observer spectra.

In an optically thin grey ejecta every thermal emission peels
e/(4 pi) * exp(-tau) toward the observer with tau ~ 0, so the peeled
observer spectrum must agree with the angle-averaged real-packet
spectrum (the standard next-event-estimator consistency check)."""

import numpy as np

from artis_tpu import SimConfig, Simulation, make_toy_1d_model
from artis_tpu.packets import TYPE_ESCAPE, TYPE_RPKT, to_numpy


def _run(grey_op, npkts=3000, vpkt_on=True):
    cfg = SimConfig(npkts=npkts, ntimesteps=5, tmin_days=5.0,
                    tmax_days=25.0, ftstep=5, opacity_case=0,
                    grey_op=grey_op, seed=77, vpkt_on=vpkt_on,
                    vpkt_obs=((0.0, 0.0, 1.0), (1.0, 0.0, 0.0)),
                    vpkt_nnubins=64)
    model = make_toy_1d_model(nshells=8, mni56_msun=0.4, tmin=cfg.tmin)
    sim = Simulation(model, cfg)
    sim.run(verbose=False, checkpoint=False)
    return sim


def test_vpkt_shapes_and_sanity():
    sim = _run(grey_op=0.05)
    assert hasattr(sim, "vspec_I")
    assert sim.vspec_I.shape == (2, 5, 64)
    assert np.all(np.isfinite(sim.vspec_I))
    assert np.all(sim.vspec_I >= 0)
    assert sim.vspec_I.sum() > 0
    # spherical symmetry: the two observers must agree statistically
    a, b = sim.vspec_I[0].sum(), sim.vspec_I[1].sum()
    assert abs(a / b - 1) < 0.2, (a, b)


def test_vpkt_matches_real_spectrum_thin():
    sim = _run(grey_op=0.02)
    # peeled energy per (obs, total) vs escaped r-packet energy / 4pi:
    # both estimate the same isotropic-equivalent luminosity
    arr = to_numpy(sim.packets)
    esc_r = ((arr["ptype"] == TYPE_ESCAPE)
             & (arr["escape_type"] == TYPE_RPKT))
    e_esc = float(arr["e_rf"][esc_r].sum())  # sim units
    for o in range(2):
        e_peel = float(sim.vspec_I[o].sum()) * 4.0 * np.pi
        assert 0.5 < e_peel / max(e_esc, 1e-30) < 2.0, (
            o, e_peel, e_esc)


def test_vpkt_attenuated_when_thick():
    thin = _run(grey_op=0.02, npkts=1500)
    thick = _run(grey_op=2.0, npkts=1500)
    # heavy grey opacity: early peels are strongly attenuated relative
    # to the thin case (exp(-tau) with tau >> 1 in early timesteps)
    r_thin = thin.vspec_I[0, 0].sum() / max(thin.vspec_I[0].sum(),
                                            1e-30)
    r_thick = thick.vspec_I[0, 0].sum() / max(thick.vspec_I[0].sum(),
                                              1e-30)
    assert r_thick < r_thin


def test_vpkt_off_has_no_spectra():
    sim = _run(grey_op=0.05, npkts=300, vpkt_on=False)
    assert not hasattr(sim, "vspec_I")


def test_vpkt_detailed_mode_smoke():
    """vpkt with full detailed transport: exercises the binned
    line-expansion-opacity ray-march (chi_line_exp)."""
    from artis_tpu.atomic import make_synthetic_atomic_data

    cfg = SimConfig(npkts=600, ntimesteps=3, tmin_days=3.0,
                    tmax_days=10.0, ftstep=3, opacity_case=4,
                    grey_op=0.1, seed=13, num_grey_timesteps=1,
                    vpkt_on=True, vpkt_obs=((0.0, 0.0, 1.0),),
                    vpkt_nnubins=64, compact_min_size=64)
    model = make_toy_1d_model(nshells=6, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad)
    sim.run(verbose=False, checkpoint=False)
    assert np.all(np.isfinite(sim.vspec_I))
    assert sim.vspec_I.sum() > 0


def test_read_vpkt_txt(tmp_path):
    """Reference-format vpkt.txt observer file (read_parameterfile_vpkt,
    vpkt.cc:667-770)."""
    from artis_tpu.config import read_vpkt_txt

    p = tmp_path / "vpkt.txt"
    p.write_text("2\n0.5 -0.5\n0.0 90.0\n1\n2\n0 1\n1 10.0 30.0\n0\n")
    cfg = read_vpkt_txt(str(p))
    assert cfg.vpkt_on
    assert len(cfg.vpkt_obs) == 2
    d0, d1 = np.asarray(cfg.vpkt_obs[0]), np.asarray(cfg.vpkt_obs[1])
    np.testing.assert_allclose(np.linalg.norm(d0), 1.0, atol=1e-12)
    np.testing.assert_allclose(d0[2], 0.5, atol=1e-12)
    np.testing.assert_allclose(d1[2], -0.5, atol=1e-12)
    # second observer at phi=90 deg: direction in the y-z plane
    np.testing.assert_allclose(d1[0], 0.0, atol=1e-12)


def test_vpkt_stokes_qu():
    """With polarisation on, e-scatter peels carry Stokes Q/U through
    the Bulla+2015 frame chain (rlc_emiss_vpkt, vpkt.cc:124-180):
    Q/U spectra exist, are finite, |Q|,|U| <= I per bin, and in a
    scattering medium some polarised signal appears. Isotropic
    thermal peels contribute zero polarisation, so the grey run
    without scatterings has Q = U = 0."""
    from artis_tpu.atomic import make_synthetic_atomic_data
    cfg = SimConfig(npkts=2500, ntimesteps=4, tmin_days=5.0,
                    tmax_days=20.0, ftstep=4, opacity_case=4,
                    seed=99, vpkt_on=True, polarization_on=True,
                    num_grey_timesteps=0, num_lte_timesteps=1,
                    vpkt_obs=((0.0, 0.0, 1.0), (1.0, 0.0, 0.0)),
                    vpkt_nnubins=48, compact_min_size=64)
    model = make_toy_1d_model(nshells=6, mni56_msun=0.4, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad)
    sim.run(verbose=False, checkpoint=False)
    assert sim.vspec_Q.shape == sim.vspec_I.shape
    assert np.all(np.isfinite(sim.vspec_Q))
    assert np.all(np.isfinite(sim.vspec_U))
    # per-bin physical bound |Q|, |U| <= I (small f32 slack)
    assert np.all(np.abs(sim.vspec_Q) <= sim.vspec_I + 1e-6)
    assert np.all(np.abs(sim.vspec_U) <= sim.vspec_I + 1e-6)
    # electron scattering happened, so some peels were polarised
    if sim.dep_log[-1]["escounter"] > 100:
        assert (np.abs(sim.vspec_Q).sum()
                + np.abs(sim.vspec_U).sum()) > 0


def test_vpkt_grid_image():
    """Velocity-plane image grid (vpkt_grid, vpkt.cc:441-560): with a
    wavelength window covering the spectrum, peeled contributions bin
    into a finite [NV, NV] image whose flux-weighted centroid is near
    the origin for a spherical ejecta."""
    import os
    cfg = SimConfig(npkts=3000, ntimesteps=4, tmin_days=5.0,
                    tmax_days=20.0, ftstep=4, opacity_case=0,
                    grey_op=0.05, seed=3, vpkt_on=True,
                    vpkt_vgrid_on=True,
                    vpkt_vgrid_lambda_aa=((500.0, 50000.0),),
                    vpkt_vgrid_nv=20,
                    vpkt_obs=((0.0, 0.0, 1.0),), vpkt_nnubins=32)
    model = make_toy_1d_model(nshells=8, mni56_msun=0.4, tmin=cfg.tmin)
    sim = Simulation(model, cfg, out_dir="/tmp/vgrid_out")
    sim.run(verbose=False, checkpoint=False)
    img = np.asarray(sim.vgrid_I)
    assert img.shape == (1, 1, 20, 20)
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.sum() > 0
    # spherical symmetry: centroid within a few bins of centre
    iy, iz = np.indices((20, 20))
    w = img[0, 0]
    cy = (iy * w).sum() / w.sum()
    cz = (iz * w).sum() / w.sum()
    assert abs(cy - 9.5) < 2.5 and abs(cz - 9.5) < 2.5, (cy, cz)
    assert os.path.exists("/tmp/vgrid_out/vpkt_grid.out")


def test_vpkt_thick_cells_kill_peels(monkeypatch):
    """The reference neither creates vpkts in thick cells
    (vpkt_call_estimators, vpkt.cc:846-849) nor lets a vpkt ray cross
    one (vpkt.cc:304-307). With every cell forced thick, the peeled
    observer spectrum of a detailed run must be exactly zero."""
    from artis_tpu.atomic import make_synthetic_atomic_data
    import artis_tpu.driver as drv

    def all_thick(g, cfg, nts, tmid):
        g.thick = np.ones(g.nmodel, dtype=np.int32)

    monkeypatch.setattr(drv, "update_thick_flags", all_thick)
    cfg = SimConfig(npkts=600, ntimesteps=2, tmin_days=3.0,
                    tmax_days=8.0, ftstep=2, opacity_case=4,
                    grey_op=0.1, seed=13, num_grey_timesteps=0,
                    vpkt_on=True, vpkt_obs=((0.0, 0.0, 1.0),),
                    vpkt_nnubins=32, compact_min_size=64)
    model = make_toy_1d_model(nshells=6, tmin=cfg.tmin)
    ad = make_synthetic_atomic_data()
    sim = Simulation(model, cfg, atomic_data=ad)
    sim.run(verbose=False, checkpoint=False)
    assert float(np.asarray(sim.vspec_I).sum()) == 0.0


def test_binned_line_tau_matches_exact_sobolev_sum():
    """The vpkt ray-march integrates the binned line opacity along the
    comoving frequency sweep; with raw-tau binning this must
    reproduce the exact per-resonance Sobolev tau sum (the
    reference's check_tau line walk, vpkt.cc:374-441) up to bin-edge
    smearing."""
    import numpy as np
    from artis_tpu.atomic import make_synthetic_atomic_data
    from artis_tpu.plasma import lte
    from artis_tpu.plasma.macroatom import (line_expansion_opacity,
                                            sobolev_tau)
    from artis_tpu.constants import CLIGHT, DAY

    ad = make_synthetic_atomic_data()
    nd = np.full((1, ad.nelements), 1e8)
    T = np.array([6000.0])
    pops = lte.solve_lte_populations(ad, nd, T)
    nl = lte.level_populations(ad, pops, T)

    t_s = 10.0 * DAY
    tau = sobolev_tau(ad, nl, t_s)[0]

    # radial outward ray from v1=0.05c to v2=0.25c at time t_s:
    # nu_cmf(s) = nu_rf (1 - v(s)/c), sweeping downward
    nu_rf = 3.6e15
    b1, b2 = 0.05, 0.25
    nu_hi, nu_lo = nu_rf * (1 - b1), nu_rf * (1 - b2)
    swept = (ad.line_nu <= nu_hi) & (ad.line_nu > nu_lo)
    tau_exact = float(tau[swept].sum())
    assert tau_exact > 0.1, "need a meaningful line forest in the sweep"

    nbins = 1024
    lognu_min = np.log(1e13)
    dln = (np.log(5e15) - np.log(1e13)) / nbins
    x_unit = CLIGHT * t_s  # sim length unit: c * t (ds_sim = ds/x_unit)
    chi = line_expansion_opacity(ad, nl, t_s, t_s / t_s,
                                 lognu_min, dln, nbins)[0]
    # chi is per sim length with t_sim = 1 (t in units of t_s);
    # integrate along the ray in fine steps
    nstep = 4000
    beta = np.linspace(b1, b2, nstep)
    ds = (b2 - b1) * CLIGHT * t_s / nstep / x_unit  # sim lengths
    nu_c = nu_rf * (1 - beta)
    ib = ((np.log(nu_c) - lognu_min) / dln).astype(int)
    tau_march = float(np.sum(chi[np.clip(ib, 0, nbins - 1)]) * ds)
    assert abs(tau_march / tau_exact - 1) < 0.12, \
        (tau_march, tau_exact)
