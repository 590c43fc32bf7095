import jax.numpy as jnp
import numpy as np
import pytest

from artis_tpu import geometry as geo


def test_doppler_first_order():
    dirvec = jnp.array([[1.0, 0.0, 0.0]])
    vel = jnp.array([[0.1, 0.0, 0.0]])
    d = geo.doppler_nucmf_on_nurf(dirvec, vel)
    np.testing.assert_allclose(d, 0.9, rtol=1e-6)


def test_doppler_relativistic():
    dirvec = jnp.array([[1.0, 0.0, 0.0]])
    vel = jnp.array([[0.3, 0.0, 0.0]])
    d = geo.doppler_nucmf_on_nurf(dirvec, vel, relativistic=True)
    expected = (1 - 0.3) / np.sqrt(1 - 0.09)
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_aberration_roundtrip():
    rng = np.random.default_rng(3)
    d1 = rng.normal(size=(100, 3))
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    vel = rng.uniform(-0.05, 0.05, size=(100, 3))
    d2 = geo.angle_ab(jnp.asarray(d1, jnp.float32),
                      jnp.asarray(vel, jnp.float32))
    d3 = geo.angle_ab(d2, -jnp.asarray(vel, jnp.float32))
    np.testing.assert_allclose(np.asarray(d3), d1, atol=2e-5)
    # aberrated vectors stay unit vectors
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d2), axis=1),
                               1.0, atol=1e-5)


def test_isotropic_direction_statistics():
    rng = np.random.default_rng(0)
    u1 = jnp.asarray(rng.random(20000), jnp.float32)
    u2 = jnp.asarray(rng.random(20000), jnp.float32)
    d = np.asarray(geo.isotropic_direction(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    assert np.all(np.abs(d.mean(axis=0)) < 0.02)
    # each component should have variance 1/3
    np.testing.assert_allclose(d.var(axis=0), 1 / 3, atol=0.01)


def test_scatter_dir_angle():
    rng = np.random.default_rng(1)
    d_in = rng.normal(size=(500, 3))
    d_in /= np.linalg.norm(d_in, axis=1, keepdims=True)
    cos_theta = jnp.asarray(rng.uniform(-1, 1, 500), jnp.float32)
    u_phi = jnp.asarray(rng.random(500), jnp.float32)
    d_out = np.asarray(geo.scatter_dir(jnp.asarray(d_in, jnp.float32),
                                       cos_theta, u_phi))
    np.testing.assert_allclose(np.linalg.norm(d_out, axis=1), 1.0,
                               atol=1e-4)
    got = np.sum(d_out * d_in, axis=1)
    np.testing.assert_allclose(got, np.asarray(cos_theta), atol=1e-4)


def test_scatter_dir_polar_degenerate():
    # dir along +z / -z exercises the degenerate rotation frame
    d_in = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], jnp.float32)
    cos_theta = jnp.asarray([0.5, -0.25], jnp.float32)
    d_out = np.asarray(geo.scatter_dir(d_in, cos_theta,
                                       jnp.asarray([0.3, 0.8], jnp.float32)))
    np.testing.assert_allclose(np.linalg.norm(d_out, axis=1), 1.0,
                               atol=1e-5)
    got = np.sum(d_out * np.asarray(d_in), axis=1)
    np.testing.assert_allclose(got, [0.5, -0.25], atol=1e-5)


def _uniform_tables(ncoord=4, rmax=0.1):
    wid = 2 * rmax / ncoord
    idx = np.arange(ncoord**3)
    ix, iy, iz = idx % ncoord, (idx // ncoord) % ncoord, idx // ncoord**2
    pos_min = np.stack([-rmax + ix * wid, -rmax + iy * wid,
                        -rmax + iz * wid], axis=1)
    return (jnp.asarray(pos_min, jnp.float32),
            jnp.asarray(np.full(ncoord**3, wid), jnp.float32))


def test_boundary_uniform_simple_crossing():
    ncoord, rmax = 4, 0.1
    pos_min, wid = _uniform_tables(ncoord, rmax)
    # packet at centre of cell (1,1,1), moving +x, at t=1 (no expansion
    # effect on +x boundary since boundary moves at x_b0 < 1)
    cell = np.array([1 + 1 * 4 + 1 * 16], dtype=np.int32)
    pos = jnp.asarray(np.asarray(pos_min)[cell] + 0.025, jnp.float32)
    dirvec = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    t = jnp.asarray([1.0], jnp.float32)
    sdist, snext, lc = geo.boundary_cross_uniform(
        pos, dirvec, t, jnp.asarray(cell), jnp.zeros(1, jnp.int32),
        ncoord, pos_min, wid)
    assert int(snext[0]) == cell[0] + 1
    assert int(lc[0]) == geo.POS_X
    # boundary at x_b0=0 (cell 1 upper bound = -0.1+2*0.05=0.0)
    # crossing: t=(x0-d t0)/(xb-d): x0=-0.025, d=1 -> (-1.025)/(-1)-1=0.025
    np.testing.assert_allclose(float(sdist[0]), 0.025, rtol=1e-4)


def test_boundary_uniform_escape():
    ncoord, rmax = 4, 0.1
    pos_min, wid = _uniform_tables(ncoord, rmax)
    cell = np.array([3 + 3 * 4 + 3 * 16], dtype=np.int32)  # corner cell
    pos = jnp.asarray(np.asarray(pos_min)[cell] + 0.045, jnp.float32)
    dirvec = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t = jnp.asarray([1.0], jnp.float32)
    sdist, snext, lc = geo.boundary_cross_uniform(
        pos, dirvec, t, jnp.asarray(cell), jnp.zeros(1, jnp.int32),
        ncoord, pos_min, wid)
    assert int(snext[0]) == -99


def test_boundary_uniform_matches_ray_march():
    # property test: the analytic crossing point must lie on a face of
    # the (expanding) cell, and the packet must remain inside the cell
    # for all distances short of sdist
    ncoord, rmax = 4, 0.1
    pos_min_j, wid_j = _uniform_tables(ncoord, rmax)
    pos_min = np.asarray(pos_min_j)
    widv = float(np.asarray(wid_j)[0])
    rng = np.random.default_rng(42)
    n = 200
    cells = rng.integers(0, ncoord**3, n)
    frac = rng.uniform(0.05, 0.95, (n, 3))
    t0 = rng.uniform(1.0, 3.0, n)
    pos = (pos_min[cells] + frac * widv) * t0[:, None]
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    sdist, snext, lc = geo.boundary_cross_uniform(
        jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.asarray(t0, jnp.float32), jnp.asarray(cells, jnp.int32),
        jnp.zeros(n, jnp.int32), ncoord, pos_min_j, wid_j)
    sdist = np.asarray(sdist)
    assert np.all(sdist > 0)

    # at the crossing, some coordinate must equal a cell face (scaled)
    t_c = t0 + sdist
    pos_c = pos + d * sdist[:, None]
    lo = pos_min[cells] * t_c[:, None]
    hi = (pos_min[cells] + widv) * t_c[:, None]
    on_face = np.min(np.minimum(np.abs(pos_c - lo), np.abs(pos_c - hi)),
                     axis=1)
    assert np.all(on_face < 5e-6)

    # strictly inside the cell at 50% of the crossing distance
    smid = 0.5 * sdist
    t_m = t0 + smid
    pos_m = pos + d * smid[:, None]
    lo_m = pos_min[cells] * t_m[:, None] - 1e-5
    hi_m = (pos_min[cells] + widv) * t_m[:, None] + 1e-5
    assert np.all((pos_m >= lo_m) & (pos_m <= hi_m))


def test_boundary_spherical_outward():
    n = 8
    r_edges = np.linspace(0, 0.08, n + 1)
    r_min = jnp.asarray(r_edges[:-1], jnp.float32)
    wid = jnp.asarray(np.diff(r_edges), jnp.float32)
    # radially outward packet in shell 3
    r0 = 0.5 * (r_edges[3] + r_edges[4])
    pos = jnp.asarray([[r0, 0.0, 0.0]], jnp.float32)
    dirvec = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    t = jnp.asarray([1.0], jnp.float32)
    cell = jnp.asarray([3], jnp.int32)
    sdist, snext, lc = geo.boundary_cross_spherical(
        pos, dirvec, t, cell, jnp.zeros(1, jnp.int32), n, r_min, wid)
    assert int(snext[0]) == 4
    # outer boundary R(t) = R0 * t; solve r0 + s = R0 (1 + s)
    R0 = r_edges[4]
    expected = (R0 - r0) / (1 - R0)
    np.testing.assert_allclose(float(sdist[0]), expected, rtol=1e-3)


def test_boundary_spherical_inward():
    n = 8
    r_edges = np.linspace(0, 0.08, n + 1)
    r_min = jnp.asarray(r_edges[:-1], jnp.float32)
    wid = jnp.asarray(np.diff(r_edges), jnp.float32)
    # radially inward packet crosses the (expanding) inner shell:
    # r0 - s = R0 * (1 + s)  ->  s = (r0 - R0) / (1 + R0)
    r0 = 0.5 * (r_edges[3] + r_edges[4])
    pos = jnp.asarray([[r0, 0.0, 0.0]], jnp.float32)
    dirvec = jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32)
    t = jnp.asarray([1.0], jnp.float32)
    cell = jnp.asarray([3], jnp.int32)
    sdist, snext, lc = geo.boundary_cross_spherical(
        pos, dirvec, t, cell, jnp.zeros(1, jnp.int32), n, r_min, wid)
    assert int(snext[0]) == 2
    R0 = r_edges[3]
    expected = (r0 - R0) / (1 + R0)
    np.testing.assert_allclose(float(sdist[0]), expected, rtol=1e-3)
