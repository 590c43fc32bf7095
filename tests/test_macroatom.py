"""Macro-atom tests: rate-table construction against hand-computed
formulas, and fluorescence branching statistics through the kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu.atomic import _Builder
from artis_tpu.constants import CLIGHT, EV, H, KB, PI
from artis_tpu.packets import TYPE_ESCAPE, TYPE_RPKT
from artis_tpu.plasma import macroatom as ma
from artis_tpu.rng import make_base_key
from artis_tpu.transport.kernel import (TransportParams,
                                        make_planck_table, run_timestep)

from test_line_transport import make_rpkts, make_tables, run_detailed


def _three_level_atom(A_20=1e8, A_21=1e8, e2_ev=4.0, e1_ev=1.5):
    b = _Builder()
    b.add_element(20, abundance=1.0, mass_amu=40.0)
    b.add_ion(1, 50.0 * EV, [0.0, e1_ev * EV, e2_ev * EV],
              [2.0, 4.0, 2.0],
              [(0, 2, A_20, -1.0, False), (1, 2, A_21, -1.0, False)])
    return b.finish()


def test_build_tables_two_channel_rates():
    ad = _three_level_atom()
    st = ma.build_static(ad)
    ncells = 2
    nl = np.zeros((ncells, 3))
    nl[:, 0] = 1e6  # only ground populated -> no stimulated correction
    Te = np.array([8000.0, 12000.0])
    TR = Te.copy()
    W = np.ones(2)
    nne = np.array([1e7, 1e8])
    t_mid = 1e6

    tabs = ma.build_tables(ad, st, nl, Te, TR, W, nne, t_mid)

    # hand-computed: line k with lower=0 upper=2 (highest nu first)
    k = 0 if ad.line_upper[0] == 2 and ad.line_lower[0] == 0 else 1
    nu = ad.line_nu[k]
    A = ad.line_A[k]
    B_ul = CLIGHT**2 / (2 * H * nu**3) * A
    B_lu = (2.0 / 2.0) * B_ul
    tau = B_lu * 1e6 * (H * CLIGHT / (4 * PI)) * t_mid
    beta = -np.expm1(-tau) / tau
    R = A * beta
    eps2 = ad.level_energy[2]
    eps0 = ad.level_energy[0]

    # level 2's RADDEEXC total = sum over both lines of R_k eps_trans
    proc = tabs["proc_cum"][0, 2]
    # reconstruct individual sums
    raddeexc = proc[0]
    assert raddeexc > 0
    # our hand-computed line contributes R*(eps2-eps0)
    contrib = R * (eps2 - eps0)
    # second line has n_l = 0 -> tau = 0 -> R = 0 contribution
    np.testing.assert_allclose(raddeexc, contrib, rtol=1e-5)

    # collisional deexcitation scales linearly with nne
    col0 = tabs["proc_cum"][0, 2, 1] - tabs["proc_cum"][0, 2, 0]
    col1 = tabs["proc_cum"][1, 2, 1] - tabs["proc_cum"][1, 2, 0]
    # cells differ in nne (x10) and Te; check order of magnitude change
    assert col1 > 3 * col0

    # UPSAME weight is epsilon_current * (R_exc + C_exc)
    # (get_individ_internal_up_same, macroatom.cc:129-133): zero for the
    # epsilon = 0 neutral ground state, positive for excited levels
    up_ground = tabs["proc_cum"][0, 0, 3] - tabs["proc_cum"][0, 0, 2]
    assert up_ground == 0.0
    up1 = tabs["proc_cum"][0, 1, 3] - tabs["proc_cum"][0, 1, 2]
    assert up1 > 0


def test_fluorescence_branching():
    """Absorb in the blue line (0->2), re-emit in either line with
    probability proportional to R * eps_trans (macro-atom radiative
    deexcitation channel weights)."""
    NU_A = 1.0e15  # 0->2
    NU_B = 0.4e15  # 1->2
    w0, w1 = 3.0, 1.0  # chosen channel weights

    n = 6000
    nlevels, nlines = 3, 2
    params_kw = dict()
    px, pcdf = make_planck_table()
    f32 = jnp.float32
    params = TransportParams(
        x_unit=f32(1.0), nu_min_r=f32(1e13), nu_max_r=f32(5e15),
        gamma_grey=f32(-1.0), max_path_step=f32(1e30),
        line_nu=jnp.asarray([NU_A, NU_B], f32),
        line_taufac_lu=jnp.asarray([5.0, 0.0], f32),  # only blue absorbs
        line_taufac_ul=jnp.zeros(2, f32),
        line_lower=jnp.asarray([0, 1], jnp.int32),
        line_upper=jnp.asarray([2, 2], jnp.int32),
        ma_byup_perm=jnp.asarray([0, 1], jnp.int32),
        ma_up_start=jnp.asarray([0, 0, 0, 2], jnp.int32),
        ma_bylo_perm=jnp.asarray([0, 1], jnp.int32),
        ma_lo_start=jnp.asarray([0, 1, 2, 2], jnp.int32),
        ma_bytarget_perm=jnp.zeros(1, jnp.int32),
        ma_target_start=jnp.zeros(4, jnp.int32),
        nt_target_level=jnp.full(1, -1, jnp.int32),
        level_cont=jnp.full(3, -1, jnp.int32),
        cont_nu_edge=jnp.zeros(1, f32),
        cont_level=jnp.zeros(1, jnp.int32),
        cont_upperlevel=jnp.zeros(1, jnp.int32),
        cont_sigma=jnp.zeros((1, 2), f32),
        cont_nuinc=f32(0.1),
        bf_lognu_min=f32(np.log(1e13)),
        bf_dlognu=f32((np.log(5e15) - np.log(1e13)) / 1024),
        bf_dlognu_sel=f32((np.log(5e15) - np.log(1e13)) / 128),
        planck_x=jnp.asarray(px), planck_cdf=jnp.asarray(pcdf),
        kpkt_diffusion_dt=f32(0.0),
            rf_lognu_min=f32(np.log(1e14)),
            rf_dlognu=f32((np.log(5e15) - np.log(1e14)) / 64),
            vpkt_obs=jnp.asarray([[0.0, 0.0, 1.0]], f32),
            vpkt_t_edges=jnp.asarray([1.0, 10.0], f32),
            vpkt_lognu_min=f32(np.log(1e14)),
            vpkt_dlognu=f32((np.log(5e15) - np.log(1e14)) / 200),
            vpkt_tau_max=f32(10.0),
    )
    tables = make_tables(ncells=1, rmax=0.2, levelpop=1.0,
                         nlevels=nlevels, nlines=nlines)
    # macro-atom: level 2 deactivates radiatively with channel weights
    proc = np.zeros((2, nlevels, 8), np.float32)
    proc[:, :, :] = 1.0
    tables["ma_proc_cum"] = jnp.asarray(proc)
    wrow = np.tile(np.cumsum([w0, w1]).astype(np.float32), (2, 1))
    tables["ma_w_raddeexc"] = jnp.asarray(wrow)
    tables["ma_w_downsame"] = jnp.asarray(wrow)
    tables["ma_w_upsame"] = jnp.asarray(wrow)

    pk = make_rpkts(n, r0=0.02, nu_cmf=NU_A * 1.005)
    out, est = run_detailed(pk, tables, params, t2=1.6)

    interacted = np.asarray(out.interactions) > 0
    # tau = 5 -> essentially all interact
    assert interacted.mean() > 0.95
    assert int(est["ma_activations"]) > 0.9 * n
    assert int(est["ma_deact_rad"]) >= int(est["ma_activations"]) * 0.99

    # packets redshift up to ~20% between emission and escape, so use
    # wide windows around each line
    nu_out = np.asarray(out.nu_cmf)
    in_b = interacted & (nu_out > 0.25 * NU_A) & (nu_out < 0.55 * NU_A)
    in_a = interacted & (nu_out > 0.7 * NU_A)
    frac_b = in_b.sum() / max(interacted.sum(), 1)
    # expected branching w1/(w0+w1) = 0.25
    assert abs(frac_b - 0.25) < 0.03, frac_b
    # every interacted packet came out in one of the two lines
    assert (in_a.sum() + in_b.sum()) / interacted.sum() > 0.97


def test_ma_internal_jump_cascade():
    """DOWNSAME then raddeexc: force an internal jump 2->1 and check
    packets come out in the red line."""
    NU_A = 1.0e15
    NU_B = 0.4e15
    px, pcdf = make_planck_table()
    f32 = jnp.float32
    params = TransportParams(
        x_unit=f32(1.0), nu_min_r=f32(1e13), nu_max_r=f32(5e15),
        gamma_grey=f32(-1.0), max_path_step=f32(1e30),
        line_nu=jnp.asarray([NU_A, NU_B], f32),
        line_taufac_lu=jnp.asarray([5.0, 0.0], f32),
        line_taufac_ul=jnp.zeros(2, f32),
        line_lower=jnp.asarray([0, 1], jnp.int32),
        line_upper=jnp.asarray([2, 2], jnp.int32),
        ma_byup_perm=jnp.asarray([0, 1], jnp.int32),
        ma_up_start=jnp.asarray([0, 0, 0, 2], jnp.int32),
        ma_bylo_perm=jnp.asarray([0, 1], jnp.int32),
        ma_lo_start=jnp.asarray([0, 1, 2, 2], jnp.int32),
        ma_bytarget_perm=jnp.zeros(1, jnp.int32),
        ma_target_start=jnp.zeros(4, jnp.int32),
        nt_target_level=jnp.full(1, -1, jnp.int32),
        level_cont=jnp.full(3, -1, jnp.int32),
        cont_nu_edge=jnp.zeros(1, f32),
        cont_level=jnp.zeros(1, jnp.int32),
        cont_upperlevel=jnp.zeros(1, jnp.int32),
        cont_sigma=jnp.zeros((1, 2), f32),
        cont_nuinc=f32(0.1),
        bf_lognu_min=f32(np.log(1e13)),
        bf_dlognu=f32((np.log(5e15) - np.log(1e13)) / 1024),
        bf_dlognu_sel=f32((np.log(5e15) - np.log(1e13)) / 128),
        planck_x=jnp.asarray(px), planck_cdf=jnp.asarray(pcdf),
        kpkt_diffusion_dt=f32(0.0),
            rf_lognu_min=f32(np.log(1e14)),
            rf_dlognu=f32((np.log(5e15) - np.log(1e14)) / 64),
            vpkt_obs=jnp.asarray([[0.0, 0.0, 1.0]], f32),
            vpkt_t_edges=jnp.asarray([1.0, 10.0], f32),
            vpkt_lognu_min=f32(np.log(1e14)),
            vpkt_dlognu=f32((np.log(5e15) - np.log(1e14)) / 200),
            vpkt_tau_max=f32(10.0),
    )
    nlevels = 3
    tables = make_tables(ncells=1, rmax=0.2, levelpop=1.0,
                         nlevels=nlevels, nlines=2)
    # level 2: 100% DOWNSAME via line 1 (2->1); level 1: stuck ->
    # k-packet (no downward lines); so every absorbed packet must
    # thermalise via the collisional fallback
    proc = np.zeros((2, nlevels, 8), np.float32)
    proc[:, 2] = [0.0, 0.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]  # downsame
    tables["ma_proc_cum"] = jnp.asarray(proc)
    # downsame selection: only line 1 (2->1) has weight
    wdown = np.tile(np.cumsum([0.0, 1.0]).astype(np.float32), (2, 1))
    tables["ma_w_downsame"] = jnp.asarray(wdown)
    tables["ma_w_raddeexc"] = jnp.asarray(
        np.tile(np.cumsum([1.0, 1.0]).astype(np.float32), (2, 1)))
    tables["ma_w_upsame"] = jnp.asarray(
        np.ones((2, 2), np.float32).cumsum(axis=1))

    pk = make_rpkts(3000, r0=0.02, nu_cmf=NU_A * 1.005)
    out, est = run_detailed(pk, tables, params, t2=1.6)
    assert int(est["ma_jumps"]) > 0
    # jumped to level 1 which has no channels -> collisional fallback
    # to k-packet -> thermal re-emission; all processed in the end
    assert int(est["ma_deact_col"]) > 0
    assert np.all(np.asarray(out.ptype) != 13)  # no MA left behind


def test_device_tables_match_host_build():
    """The jitted float32 device table build (macroatom_device.py)
    must reproduce the float64 host build to f32-cumsum tolerance,
    with and without photoionisation channels."""
    from artis_tpu.atomic import make_synthetic_atomic_data
    from artis_tpu.phixs import make_hydrogenic_phixs
    from artis_tpu.plasma import photoion
    from artis_tpu.plasma.macroatom_device import DeviceTableBuilder

    ad = make_synthetic_atomic_data()
    ph = make_hydrogenic_phixs(ad)
    st = ma.build_static(ad, ph)
    rng = np.random.default_rng(7)
    ncells = 5
    nl = (rng.random((ncells, ad.nlevels_total)) * 1e8).astype(
        np.float64)
    Te = np.linspace(6000.0, 18000.0, ncells)
    TR = np.linspace(7000.0, 20000.0, ncells)
    W = np.linspace(0.1, 1.0, ncells)
    nne = np.full(ncells, 1e8)
    t_mid = 8e5
    pirates = photoion.compute_rates(ad, ph, Te, TR, W, nne)

    host = ma.build_tables(ad, st, nl, Te, TR, W, nne, t_mid,
                           ph=ph, pirates=pirates)
    dev = DeviceTableBuilder(ad, st, ph=ph, line_chunk=257).build(
        nl, Te, TR, W, nne, t_mid, pirates=pirates)

    for key in host:
        a = np.asarray(host[key], np.float64)
        b = np.asarray(dev[key], np.float64)
        assert a.shape == b.shape, key
        # global per-table scale: the f32 build keeps absolute error
        # below ~1e-6 x the table's dynamic range; per-row relative
        # accuracy is meaningless for rows 40 orders of magnitude
        # below the sampling-relevant weights
        scale = np.maximum(np.abs(a).max(), 1e-30)
        err = np.abs(b - a) / scale
        assert err.max() < 5e-4, (key, err.max())


def test_device_tables_scale_smoke():
    """HBM-scalability check (scaled-down for CI; the full
    500-cell x 1e5-line case is exercised by bench.py --tables on
    real hardware): a 3000-line x 64-cell build runs chunked and
    produces finite, monotone cumulative rows."""
    from artis_tpu.atomic import make_synthetic_atomic_data
    from artis_tpu.plasma.macroatom_device import DeviceTableBuilder

    ad = make_synthetic_atomic_data(
        elements=((26, 3, 45), (27, 3, 45), (28, 3, 45)))
    st = ma.build_static(ad)
    ncells = 64
    rng = np.random.default_rng(3)
    nl = (rng.random((ncells, ad.nlevels_total)) * 1e7)
    Te = np.full(ncells, 9000.0)
    b = DeviceTableBuilder(ad, st, line_chunk=1024)
    tabs = b.build(nl, Te, Te, np.ones(ncells), np.full(ncells, 1e8),
                   1e6)
    w = np.asarray(tabs["w_raddeexc"])
    assert w.shape == (ncells, ad.nlines)
    assert np.isfinite(w).all()
    assert (np.diff(w, axis=1) >= -1e-3 * w.max()).all()
