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
