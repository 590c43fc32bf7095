"""Polarised electron-scattering tests: frame geometry invariants and
the classic dipole polarisation statistics (Bulla et al. 2015)."""

import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu.transport import polarization as pol


def test_meridian_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(200, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    ref1, ref2 = pol.meridian(jnp.asarray(n))
    ref1, ref2 = np.asarray(ref1), np.asarray(ref2)
    np.testing.assert_allclose(np.sum(ref1 * n, axis=1), 0, atol=1e-6)
    np.testing.assert_allclose(np.sum(ref2 * n, axis=1), 0, atol=1e-6)
    np.testing.assert_allclose(np.sum(ref1 * ref2, axis=1), 0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(ref1, axis=1), 1, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(ref2, axis=1), 1, atol=1e-5)


def test_frame_transform_preserves_polarization_degree():
    rng = np.random.default_rng(1)
    n = 300
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    q = rng.uniform(-0.5, 0.5, n)
    u = rng.uniform(-0.5, 0.5, n)
    vel = rng.uniform(-0.05, 0.05, (n, 3))
    q2, u2, n_cmf = pol.frame_transform(
        jnp.asarray(d), jnp.asarray(q), jnp.asarray(u), jnp.asarray(vel))
    p_in = np.hypot(q, u)
    p_out = np.hypot(np.asarray(q2), np.asarray(u2))
    # polarisation degree is Lorentz invariant (frame_transform keeps p)
    np.testing.assert_allclose(p_out, p_in, atol=5e-3)


def test_unpolarized_input_scattering_statistics():
    """Scattering unpolarised light: the mean polarisation over many
    scatterings vanishes by symmetry; individual scatterings acquire
    the dipole polarisation p(mu) = (1-mu^2)/(1+mu^2)."""
    n = 20000
    rng = np.random.default_rng(2)
    d = np.tile([[0.0, 0.0, 1.0]], (n, 1))
    pos = np.tile([[0.0, 0.0, 0.01]], (n, 1))
    t = np.ones(n)
    uni = rng.random((n, 36))
    new_dir, q, u, dopp = pol.escat_stokes(
        jnp.asarray(d, jnp.float32), jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(uni, jnp.float32))
    new_dir = np.asarray(new_dir)
    q, u = np.asarray(q), np.asarray(u)
    np.testing.assert_allclose(np.linalg.norm(new_dir, axis=1), 1,
                               atol=1e-4)
    p = np.hypot(q, u)
    assert np.all(p <= 1.0 + 1e-5)
    mu = new_dir @ np.array([0.0, 0.0, 1.0])
    # single-scattering polarisation degree vs angle (Chandrasekhar):
    # p(mu) = (1 - mu^2)/(1 + mu^2), with E perpendicular to the
    # scattering plane. The scattering plane contains the z axis, which
    # is also in the meridian plane of the outgoing direction, so the
    # meridian-frame Q is -p and U vanishes.
    expected = (1 - mu**2) / (1 + mu**2)
    sel = np.abs(mu) < 0.95
    np.testing.assert_allclose(p[sel], expected[sel], atol=0.05)
    np.testing.assert_allclose(q[sel], -expected[sel], atol=0.05)
    assert abs(u.mean()) < 0.05
    assert np.abs(u[sel]).max() < 0.1


def test_peel_stokes_analytic_dipole():
    """Single-scatter peel of unpolarised light against the analytic
    dipole matrix (rlc_emiss_vpkt realtype==1, vpkt.cc:124-180): at
    scattering angle mu the peel weight is 3/(16 pi) (1+mu^2), the
    polarisation degree is (1-mu^2)/(1+mu^2), and for an observer in
    the plane of the incoming direction and the z axis the E field is
    perpendicular to that (meridian) plane, so Q = -p and U = 0."""
    import jax
    n = 64
    thetas = np.linspace(0.05, np.pi - 0.05, n)
    obs = np.stack([np.sin(thetas), np.zeros(n), np.cos(thetas)],
                   axis=-1)
    d = np.tile([[0.0, 0.0, 1.0]], (n, 1))
    # negligible flow velocity: v = pos/t with |pos| ~ 1e-7 c t
    pos = np.tile([[1e-7, 0.0, 1e-7]], (n, 1))
    t = np.ones(n)
    pn, q, u = jax.jit(pol.peel_stokes)(
        jnp.asarray(d, jnp.float32), jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.asarray(t, jnp.float32), jnp.asarray(obs, jnp.float32))
    pn, q, u = np.asarray(pn), np.asarray(q), np.asarray(u)
    mu = np.cos(thetas)
    np.testing.assert_allclose(
        pn, 3.0 / (16.0 * np.pi) * (1 + mu**2), rtol=1e-4)
    p_expect = (1 - mu**2) / (1 + mu**2)
    np.testing.assert_allclose(np.hypot(q, u), p_expect, atol=2e-4)
    np.testing.assert_allclose(q, -p_expect, atol=2e-4)
    np.testing.assert_allclose(u, 0.0, atol=2e-4)


def test_peel_stokes_polarized_input_weight():
    """Polarised incident light: the peel weight follows
    3/(16 pi) (1 + mu^2 + (mu^2 - 1) Qold) with Qold the incident Q
    rotated into the scattering plane (vpkt.cc:147-149). For incoming
    direction z, observer in the x-z plane and incident Stokes given
    in the incoming meridian frame, the scattering-plane rotation
    angle i1 is 0 or pi (same plane), so Qold = Qin."""
    n = 32
    thetas = np.linspace(0.1, np.pi - 0.1, n)
    obs = np.stack([np.sin(thetas), np.zeros(n), np.cos(thetas)],
                   axis=-1)
    # tilt the incoming direction slightly off the z axis: the
    # meridian frame of exactly +-z is degenerate (vpkt.cc:935 divides
    # by sqrt(nx^2+ny^2)) and carries no E-vector information
    d = np.tile([[1e-3, 0.0, 1.0]], (n, 1))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pos = np.tile([[1e-7, 0.0, 1e-7]], (n, 1))
    t = np.ones(n)
    for qin in (0.7, -0.7):
        pn, _, _ = pol.peel_stokes(
            jnp.asarray(d, jnp.float32),
            jnp.full(n, qin, jnp.float32), jnp.zeros(n, jnp.float32),
            jnp.asarray(pos, jnp.float32), jnp.asarray(t, jnp.float32),
            jnp.asarray(obs, jnp.float32))
        mu = np.cos(thetas)
        expect = 3.0 / (16.0 * np.pi) * (1 + mu**2
                                         + (mu**2 - 1) * qin)
        np.testing.assert_allclose(np.asarray(pn), expect, rtol=5e-3)


def test_dipole_angle_distribution():
    """The dipole phase function ~ 1 + mu^2 for unpolarised input."""
    n = 40000
    rng = np.random.default_rng(3)
    d = np.tile([[0.0, 0.0, 1.0]], (n, 1))
    pos = np.tile([[0.0, 0.0, 0.01]], (n, 1))
    uni = rng.random((n, 36))
    new_dir, _, _, _ = pol.escat_stokes(
        jnp.asarray(d, jnp.float32), jnp.zeros(n, jnp.float32),
        jnp.zeros(n, jnp.float32), jnp.asarray(pos, jnp.float32),
        jnp.ones(n, jnp.float32), jnp.asarray(uni, jnp.float32))
    mu = np.asarray(new_dir) @ np.array([0, 0, 1.0])
    # histogram vs (1 + mu^2)/(8/3) density
    hist, edges = np.histogram(mu, bins=20, range=(-1, 1), density=True)
    centers = 0.5 * (edges[1:] + edges[:-1])
    expect = (1 + centers**2) / (8.0 / 3.0)
    np.testing.assert_allclose(hist, expect, rtol=0.12)
