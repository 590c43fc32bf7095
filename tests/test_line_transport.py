"""Quantitative tests of the detailed (Sobolev line + continuum)
r-packet transport against analytic expectations.

These drive the transport kernel directly with hand-built single-line
configurations — the unit-physics tests the reference lacks (its CI is
end-to-end only, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu.constants import H, KB, PI, CLIGHT
from artis_tpu.packets import PacketBatch, TYPE_ESCAPE, TYPE_KPKT, TYPE_RPKT
from artis_tpu.rng import make_base_key
from artis_tpu.transport.kernel import (TransportParams, make_planck_table,
                                        run_timestep)

NU0 = 5e14  # test line frequency [Hz]


def make_params(line_nu=(), taufac=(), nlevels=2, **kw):
    px, pcdf = make_planck_table()
    f32 = jnp.float32
    n = max(len(line_nu), 1)
    line_nu = np.asarray(line_nu if len(line_nu) else [0.0])
    taufac = np.asarray(taufac if len(taufac) else [0.0])
    return TransportParams(
        x_unit=f32(1.0), nu_min_r=f32(1e13), nu_max_r=f32(5e15),
        gamma_grey=f32(-1.0), max_path_step=f32(1e30),
        line_nu=jnp.asarray(line_nu, f32),
        line_taufac_lu=jnp.asarray(taufac, f32),
        line_taufac_ul=jnp.zeros(n, f32),
        line_lower=jnp.zeros(n, jnp.int32),
        line_upper=jnp.asarray(np.minimum(1, nlevels - 1)
                               * np.ones(n), jnp.int32),
        ma_byup_perm=jnp.arange(n, dtype=jnp.int32),
        ma_up_start=jnp.asarray([0] * nlevels + [n], jnp.int32),
        ma_bylo_perm=jnp.arange(n, dtype=jnp.int32),
        ma_lo_start=jnp.asarray([0] + [n] * nlevels, jnp.int32),
        ma_bytarget_perm=jnp.zeros(1, jnp.int32),
        ma_target_start=jnp.zeros(nlevels + 1, jnp.int32),
        nt_target_level=jnp.full(1, -1, jnp.int32),
        level_cont=jnp.full(nlevels, -1, jnp.int32),
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


def make_tables(ncells=1, rmax=0.1, chi_thomson=0.0, kff_base=0.0,
                levelpop=1.0, Te=8000.0, nlevels=2, nlines=1):
    """Single-shell spherical grid tables (sim units).

    The macro-atom tables make any activated level deactivate
    radiatively through line 0 (pure resonance scattering)."""
    f32 = jnp.float32
    nm = ncells
    r_edges = np.linspace(0, rmax, ncells + 1)
    pops = np.zeros((nm + 1, nlevels), np.float32)
    pops[:nm, 0] = levelpop
    proc = np.zeros((nm + 1, nlevels, 8), np.float32)
    proc[:, :, :] = 1.0  # cumulative: raddeexc only
    wrow = np.ones((nm + 1, max(nlines, 1)), np.float32).cumsum(axis=1)
    return {
        "nt_frac_ion": jnp.zeros(nm + 1, jnp.float32),
        "nt_ion_cum": jnp.zeros((nm + 1, 1), jnp.float32),
        "kp_cool_ff": jnp.zeros(nm + 1, jnp.float32),
        "kp_w_collexc": jnp.zeros((nm + 1, max(nlines, 1)), jnp.float32),
        "kp_w_fb": jnp.zeros((nm + 1, 1), jnp.float32),
        "kp_w_collion": jnp.zeros((nm + 1, 1), jnp.float32),
        "chi_bf": jnp.zeros((nm + 1, 1), jnp.float32),
        "bf_sel_cum": jnp.zeros((nm + 1, 1, 1), jnp.float32),
        "ma_w_radrecomb": jnp.zeros((nm + 1, 1), jnp.float32),
        "ma_w_downlower": jnp.zeros((nm + 1, 1), jnp.float32),
        "ma_proc_cum": jnp.asarray(proc),
        "ma_w_raddeexc": jnp.asarray(wrow),
        "ma_w_downsame": jnp.asarray(wrow),
        "ma_w_upsame": jnp.asarray(wrow),
        "cell_mgi": jnp.arange(ncells, dtype=jnp.int32),
        "pos_min": jnp.asarray(r_edges[:-1, None], f32),
        "wid": jnp.asarray(np.diff(r_edges), f32),
        "chi_grey": jnp.zeros(nm + 1, f32),
        "nnetot_sig": jnp.zeros(nm + 1, f32),
        "rho": jnp.zeros(nm + 1, f32),
        "ffegrp": jnp.zeros(nm + 1, f32),
        "Te": jnp.full(nm + 1, Te, f32),
        "thick": jnp.zeros(nm + 1, jnp.int32),
        "rmax": f32(rmax), "vmax": f32(rmax),
        "chi_thomson": jnp.full(nm + 1, chi_thomson, f32),
        "kff_base": jnp.full(nm + 1, kff_base, f32),
        "levelpops": jnp.asarray(pops),
    }


def make_rpkts(n, r0=0.02, nu_cmf=6e14, t0=1.0, seed=1):
    """Radially outward r-packets at radius r0 (sim units)."""
    f32 = lambda x: jnp.full(n, x, jnp.float32)
    i32 = lambda x: jnp.full(n, x, jnp.int32)
    pos = jnp.tile(jnp.asarray([[r0, 0.0, 0.0]], jnp.float32), (n, 1))
    dirvec = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32), (n, 1))
    # first-order Doppler: nu_rf = nu_cmf / (1 - v.r/c); v = r/t
    dopp = 1.0 - r0 / t0
    return PacketBatch(
        pos=pos, dirvec=dirvec,
        nu_cmf=f32(nu_cmf), nu_rf=f32(nu_cmf / dopp),
        e_cmf=f32(1.0), e_rf=f32(1.0 / dopp),
        prop_time=f32(t0), tdecay=f32(0.0),
        ptype=i32(TYPE_RPKT), cell=i32(0), last_cross=i32(0),
        pellet_nucindex=i32(0), pellet_decaytype=i32(0),
        from_particle=jnp.zeros(n, bool),
        escape_type=i32(0), escape_time=f32(-1.0), em_time=f32(t0),
        em_pos=pos,
        nscatterings=i32(0), interactions=i32(0),
        rng_count=i32(0), pkt_id=jnp.arange(n, dtype=jnp.int32),
        nu_decay=f32(0.0), next_trans=i32(-1), ma_level=i32(0),
        ma_activ_level=i32(0), ma_activ_line=i32(-99),
        ma_activ_nu_cmf=f32(0.0), ma_activ_nu_rf=f32(0.0),
        ma_jumps_cur=i32(0),
        stokes_q=f32(0.0), stokes_u=f32(0.0),
        emissiontype=i32(-9999000), absorptiontype=i32(-9999000),
        absorption_nu=f32(0.0),
    )


def run_detailed(pk, tables, params, t2=3.0, seed=7):
    fn = jax.jit(lambda p, tb, pr, key: run_timestep(
        p, tb, pr, jnp.float32(t2), False, key, grid_type="spherical",
        ncoord=tables["cell_mgi"].shape[0], detailed=True,
        max_iters=50_000))
    return fn(pk, tables, params, make_base_key(seed))


def test_single_line_transmission():
    """P(no interaction) through one resonance = exp(-tau_sobolev)."""
    n = 4000
    for tau_target in (0.3, 1.5):
        n_l = 2.0
        t0 = 1.0
        # tau = taufac * n_l * t  ->  taufac = tau / (n_l * t)
        # the packet redshifts into resonance at ldist = t*(nu/nu0 - 1);
        # at that point t has grown, tau uses t at segment start (~t0)
        params = make_params([NU0], [tau_target / n_l / t0])
        tables = make_tables(ncells=1, rmax=0.2, levelpop=n_l)
        pk = make_rpkts(n, r0=0.02, nu_cmf=NU0 * 1.01, t0=t0)
        out, est = run_detailed(pk, tables, params, t2=1.5)
        interacted = np.asarray(out.interactions) > 0
        frac = interacted.mean()
        # time at resonance start differs slightly from t0 due to
        # propagation before resonance; tolerance covers it
        expect = 1.0 - np.exp(-tau_target)
        assert abs(frac - expect) < 0.035, (tau_target, frac, expect)
        # interacting packets were re-emitted at the line frequency
        nu_cmfs = np.asarray(out.nu_cmf)
        esc = np.asarray(out.ptype) == TYPE_ESCAPE
        # all packets eventually escape this thin shell
        assert esc.mean() > 0.99


def test_line_below_frequency_never_hit():
    """A line blueward of the packet can never be reached (packets only
    redshift)."""
    params = make_params([NU0 * 2.0], [100.0])
    tables = make_tables(ncells=1, rmax=0.2)
    pk = make_rpkts(500, nu_cmf=NU0 * 1.5)
    out, est = run_detailed(pk, tables, params, t2=1.5)
    assert np.all(np.asarray(out.interactions) == 0)
    assert np.all(np.asarray(out.ptype) == TYPE_ESCAPE)


def test_multi_line_cascade_order():
    """Packets pass multiple zero-tau lines in descending-frequency
    order; next_trans ends past all reachable lines."""
    lines = np.array([NU0 * 1.008, NU0 * 1.006, NU0 * 1.004, NU0 * 0.5])
    params = make_params(lines, [0.0, 0.0, 0.0, 0.0])
    tables = make_tables(ncells=1, rmax=0.2)
    pk = make_rpkts(100, nu_cmf=NU0 * 1.01)
    out, est = run_detailed(pk, tables, params, t2=1.5)
    assert np.all(np.asarray(out.interactions) == 0)
    # packets escaped having passed the 3 reachable lines
    assert np.all(np.asarray(out.next_trans) >= 3)


def test_two_line_combined_transmission():
    """Two lines each with tau: P(no interaction) = exp(-tau1-tau2)."""
    t1, t2_tau = 0.5, 0.8
    lines = np.array([NU0 * 1.004, NU0 * 1.002])
    params = make_params(lines, [t1 / 2.0, t2_tau / 2.0])
    tables = make_tables(ncells=1, rmax=0.2, levelpop=2.0)
    pk = make_rpkts(4000, nu_cmf=NU0 * 1.006)
    out, est = run_detailed(pk, tables, params, t2=1.5)
    frac_clean = (np.asarray(out.interactions) == 0).mean()
    expect = np.exp(-t1 - t2_tau)
    assert abs(frac_clean - expect) < 0.035


def test_thomson_continuum_events():
    """Pure electron-scattering medium: interaction fraction over a
    known path matches 1 - exp(-chi * d)."""
    chi = 8.0  # per sim length
    tables = make_tables(ncells=1, rmax=0.2, chi_thomson=chi)
    params = make_params()
    r0 = 0.02
    pk = make_rpkts(4000, r0=r0, nu_cmf=NU0)
    # distance to shell edge ~ (rmax - r0)/(1 - rmax) corrected for
    # expansion; use a timestep long enough to escape or scatter
    out, est = run_detailed(pk, tables, params, t2=1.5)
    scattered = np.asarray(out.nscatterings) > 0
    # expected no-scatter probability across the expanding shell:
    # integrate chi * doppler along the path — dominated by chi*d with
    # d =~ (0.2 - 0.02); use loose tolerance for the doppler factor
    d_geo = (0.2 * 1.0 - r0) / (1.0 - 0.2)
    expect = 1.0 - np.exp(-chi * d_geo)
    assert abs(scattered.mean() - expect) < 0.08
    assert int(est["escounter"]) == np.sum(np.asarray(out.nscatterings))


def test_ff_absorption_to_kpkt():
    """Free-free events thermalise packets into k-packets (which then
    re-emit as Planck r-packets)."""
    # kff = kff_base * (nu/1e15)^-3 * (1 - exp(-h nu/k Te))
    tables = make_tables(ncells=1, rmax=0.2, kff_base=30.0, Te=8000.0)
    params = make_params()
    pk = make_rpkts(2000, nu_cmf=NU0)
    out, est = run_detailed(pk, tables, params, t2=1.5)
    # some packets must have been ff-absorbed and re-emitted thermally
    assert int(est["interactions"]) > 0
    # thermal re-emission draws from the Planck distribution at Te;
    # escaped packets include thermally re-emitted ones
    assert np.all(np.asarray(out.ptype) != TYPE_KPKT)  # all processed

def test_tied_f32_line_frequencies_both_processed():
    """At 1e5+ lines adjacent line_nu values collapse to EQUAL f32
    bit patterns (~30 m/s velocity resolution, SCALE_DEMO note). The
    analytic cumulative walk must process BOTH members of a tie, in
    index order: transmission through a tied pair equals
    exp(-(tau_a + tau_b)), exactly as for two resolvable lines."""
    nu_tied = np.float32(NU0 * 1.003)
    lines = np.array([nu_tied, nu_tied], np.float32)
    assert lines[0] == lines[1]  # genuinely identical in f32
    ta, tb = 0.6, 0.9
    params = make_params(lines, [ta / 2.0, tb / 2.0])
    tables = make_tables(ncells=1, rmax=0.2, levelpop=2.0)
    pk = make_rpkts(4000, nu_cmf=NU0 * 1.006)
    out, est = run_detailed(pk, tables, params, t2=1.5)
    frac_clean = (np.asarray(out.interactions) == 0).mean()
    expect = np.exp(-ta - tb)
    assert abs(frac_clean - expect) < 0.035, (frac_clean, expect)
    # every non-interacting packet walked past both tied lines
    clean = np.asarray(out.interactions) == 0
    assert np.all(np.asarray(out.next_trans)[clean] >= 2)

def test_vpkt_peel_consistent_with_escaped_flux_through_lines():
    """Next-event-estimator consistency in the DETAILED kernel with a
    strong line + Thomson scattering: the peeled observer spectrum
    must match the angle-averaged escaping flux (isotropic-equivalent)
    — the observer-ray march (exact per-ray Sobolev line depth +
    continuum) must attenuate by the same optical depth the real
    packets actually experience. A biased vpkt line/continuum tau
    shows up as vspec != escaped/(4 pi)."""
    from artis_tpu.transport.kernel import (run_timestep_chunk,
                                            zero_estimators)
    from artis_tpu.driver import _build_line_walk_blocks

    n = 6000
    tau_line = 2.0
    n_l = 2.0
    params = make_params([NU0], [tau_line / n_l / 1.0])
    tables = make_tables(ncells=1, rmax=0.2, levelpop=n_l,
                         chi_thomson=3.0)  # tau_es ~ 0.5 across cell
    # analytic-walk blocks (the exact vpkt line-depth path needs them)
    nl_pad = jnp.asarray(np.vstack([tables["levelpops"]]), jnp.float32)
    (D_blk, D_lo_blk, tau_blk, D_end, D_lo_end,
     tau_end) = _build_line_walk_blocks(
        nl_pad, params.line_taufac_lu, params.line_taufac_ul,
        params.line_lower, params.line_upper, params.line_nu, nb=1)
    tables["lw_D_blk"] = D_blk
    tables["lw_D_lo_blk"] = D_lo_blk
    tables["lw_tau_blk"] = tau_blk
    tables["lw_D_end"] = D_end
    tables["lw_D_lo_end"] = D_lo_end
    tables["lw_tau_end"] = tau_end
    tables["lw_nu_blk"] = jnp.asarray(
        np.pad(np.asarray(params.line_nu, np.float32),
               (0, 128 - 1)).reshape(1, 128))

    pk = make_rpkts(n, r0=0.02, nu_cmf=NU0 * 1.01)
    est0 = zero_estimators(1, vpkt_shape=(1, 1, 200))
    fn = jax.jit(lambda p, e: run_timestep_chunk(
        p, e, tables, params, jnp.float32(3.0), False,
        make_base_key(7), 50_000, grid_type="spherical", ncoord=1,
        detailed=True, vpkt=True))
    out, est, n_act = fn(pk, est0)
    assert int(n_act) == 0
    esc = np.asarray(out.ptype) == TYPE_ESCAPE
    assert esc.mean() > 0.95
    e_esc = float(np.asarray(out.e_rf)[esc].sum())
    e_peel = float(np.asarray(est["vpkt_I"]).sum()) * 4.0 * np.pi
    ratio = e_peel / e_esc
    assert 0.8 < ratio < 1.25, (ratio, e_peel, e_esc)

def test_line_walk_table_precision_at_production_dynamic_range():
    """Double-single D tables must preserve interval depths at the
    dynamic range of a production linelist (~1e14 between a strong
    line and the total sum; classic_sph_biglines measurement): a
    plain f32 cumsum loses 95%+ of typical intervals. Contract:
    (hi2-hi1)+(lo2-lo1) matches the f64 interval to 1e-5 relative."""
    from artis_tpu.driver import _build_line_walk_blocks

    rng = np.random.default_rng(0)
    nl = 50_000
    # per-line depth spanning 14 decades, frequency-sorted descending
    dcol = 10.0 ** rng.uniform(-14.0, 0.0, nl)
    nu = np.sort(rng.uniform(1e14, 5e15, nl))[::-1].copy()
    taufac = dcol * nu  # so base/nu = dcol with n_l = 1
    nl_pad = jnp.ones((1, 2), jnp.float32)
    out = _build_line_walk_blocks(
        nl_pad, jnp.asarray(taufac, jnp.float32),
        jnp.zeros(nl, jnp.float32),
        jnp.zeros(nl, jnp.int32), jnp.ones(nl, jnp.int32),
        jnp.asarray(nu, jnp.float32), nb=-(-(nl + 1) // 128))
    D_hi, D_lo = np.asarray(out[0]).reshape(1, -1), \
        np.asarray(out[1]).reshape(1, -1)
    # f64 truth from the same f32-rounded inputs
    base = (np.asarray(taufac, np.float32).astype(np.float64)
            / np.maximum(np.asarray(nu, np.float32), 1.0))
    D64 = np.concatenate([[0.0], np.cumsum(base)])
    j1 = rng.integers(0, nl - 200, 3000)
    total = D64[-1]
    for k in (1, 10, 100):
        j2 = j1 + k
        true = D64[j2] - D64[j1]
        ds = ((D_hi[0, j2] - D_hi[0, j1]).astype(np.float64)
              + (D_lo[0, j2] - D_lo[0, j1]))
        # double-single carries ~48 bits: intervals down to ~1e-12 of
        # the total are preserved; below that the interval's tau is
        # < 1e-5 of the total line depth — physically negligible
        # (a plain f32 table loses intervals at 1e-7 of the total,
        # i.e. tau ~ 10 lines on production lists)
        m = true > 1e-11 * total
        assert m.sum() > 200
        rel = np.abs(ds[m] - true[m]) / true[m]
        assert np.percentile(rel, 99) < 1e-3, (k, np.percentile(rel, 99))
        # and the remainder must never be spuriously large
        m2 = true > 0
        assert np.all(ds[m2] <= true[m2] * 1.001 + 2e-11 * total)
