"""Polarised electron scattering: Stokes-parameter machinery.

Rebuild of the reference's polarisation layer (reference:
polarization.cc:6-157 ``escat_rpkt`` and the frame helpers in
vpkt.cc:898-1069: ``meridian``, ``rot_angle``, ``frame_transform``,
``lorentz``) as vectorised jnp functions over packet batches, following
Bulla et al. (2015).

The dipole direction sampling uses a bounded rejection loop (the
reference loops until acceptance; with 12 tries the residual
acceptance failure is < 0.03% and falls back to the last candidate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import geometry as geo

PI = jnp.pi


def meridian(n):
    """Meridian frame axes (ref1, ref2) for direction n
    (vpkt.cc:932-944)."""
    rho = jnp.sqrt(jnp.maximum(n[..., 0] ** 2 + n[..., 1] ** 2, 1e-20))
    ref1 = jnp.stack([-n[..., 0] * n[..., 2] / rho,
                      -n[..., 1] * n[..., 2] / rho,
                      (1.0 - n[..., 2] ** 2) / rho], axis=-1)
    ref2 = jnp.stack([n[..., 2] * ref1[..., 1] - n[..., 1] * ref1[..., 2],
                      n[..., 0] * ref1[..., 2] - n[..., 2] * ref1[..., 0],
                      n[..., 1] * ref1[..., 0] - n[..., 0] * ref1[..., 1]],
                     axis=-1)
    return ref1, ref2


def _quadrant_angle(c1, c2):
    """Angle in [0, 2pi) from cos components in two reference axes
    (rot_angle's case analysis, vpkt.cc:915-923)."""
    c1 = jnp.clip(c1, -1.0, 1.0)
    a = jnp.arccos(jnp.abs(c1))
    ang = jnp.where((c1 > 0) & (c2 > 0), jnp.arccos(c1),
                    jnp.where((c1 > 0) & (c2 < 0), 2 * PI - jnp.arccos(c1),
                              jnp.where((c1 < 0) & (c2 < 0), PI + a,
                                        PI - a)))
    ang = jnp.where(c1 == 0, PI / 2.0, ang)
    ang = jnp.where(c2 == 0, 0.0, ang)
    return ang


def rot_angle(n1, n2, ref1, ref2):
    """Rotation angle between the scattering plane of (n1, n2) and the
    meridian frame of n1 (vpkt.cc:898-929)."""
    ndot = geo.dot3(n1, n2)
    ref1_sc = geo.normalize3(n1 * ndot[..., None] - n2)
    c1 = geo.dot3(ref1_sc, ref1)
    c2 = geo.dot3(ref1_sc, ref2)
    return _quadrant_angle(c1, c2)


def lorentz_efield(e_rf, n_rf, beta):
    """Lorentz transformation of the electric field direction from the
    rest frame to the comoving frame (lorentz, vpkt.cc:1022-1069).
    ``beta`` = v/c."""
    vsqr = jnp.maximum(geo.dot3(beta, beta), 1e-20)
    gamma_rel = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vsqr, 1e-12))

    edotb = geo.dot3(e_rf, beta)
    e_par = (edotb / vsqr)[..., None] * beta
    e_perp = e_rf - e_par
    b_rf = geo.cross3(n_rf, e_rf)
    bdotb = geo.dot3(b_rf, beta)
    b_par = (bdotb / vsqr)[..., None] * beta
    b_perp = b_rf - b_par
    v_cr_b = geo.cross3(beta, b_rf)

    e_cmf = e_par + gamma_rel[..., None] * (e_perp + v_cr_b)
    return geo.normalize3(e_cmf)


def frame_transform(n_rf, q, u, vel, relativistic: bool = True):
    """Transform Stokes (Q, U) between frames: returns (q_cmf, u_cmf,
    n_cmf) (frame_transform, vpkt.cc:947-1019). ``vel`` in units of c
    is the velocity of the target frame."""
    ref1, ref2 = meridian(n_rf)
    p = jnp.sqrt(q * q + u * u)
    psafe = jnp.maximum(p, 1e-30)
    # angle between ref1 and the E field (half the Stokes rotation)
    c2r = q / psafe
    s2r = u / psafe
    half = _quadrant_angle(c2r, s2r) / 2.0
    # the reference's case analysis maps (cos2a, sin2a) quadrants
    # differently from _quadrant_angle for the E-field angle; recompute
    # directly: rot in [0, pi) with 2*rot matching atan2(u, q)
    rot = 0.5 * jnp.arctan2(u, q)
    rot = jnp.where(rot < 0, rot + PI, rot)
    e_rf = (jnp.cos(rot)[..., None] * ref1
            - jnp.sin(rot)[..., None] * ref2)

    n_cmf = geo.normalize3(geo.angle_ab(n_rf, vel))
    e_cmf = lorentz_efield(e_rf, n_rf, vel)

    ref1c, ref2c = meridian(n_cmf)
    er1 = geo.dot3(e_cmf, ref1c)
    er2 = geo.dot3(e_cmf, ref2c)
    # angle between ref1 and E in the cmf (vpkt.cc:1007-1014; note the
    # sign convention: positive ref2 component maps past pi)
    er1c = jnp.clip(er1, -1.0, 1.0)
    a = jnp.arccos(jnp.abs(er1c))
    theta = jnp.where((er1 > 0) & (er2 < 0), jnp.arccos(er1c),
                      jnp.where((er1 < 0) & (er2 < 0), PI - a,
                                jnp.where((er1 < 0) & (er2 > 0), PI + a,
                                          2 * PI - jnp.arccos(er1c))))
    theta = jnp.where(er1 == 0, PI / 2.0, theta)
    theta = jnp.where(er2 == 0, 0.0, theta)
    q_out = jnp.cos(2 * theta) * p
    u_out = jnp.sin(2 * theta) * p
    return q_out, u_out, n_cmf


def peel_stokes(dirvec, q_rf, u_rf, pos, t, obs,
                relativistic: bool = False):
    """Deterministic Stokes peel-off toward a fixed observer
    direction ``obs`` — the dipole-scattering branch of
    rlc_emiss_vpkt (vpkt.cc:124-180): returns (pn, q_obs, u_obs)
    where pn is the polarised phase-function value (the peel weight
    per unit solid angle) and (q_obs, u_obs) the normalised Stokes
    parameters of the peeled photon in the rest frame."""
    vel = geo.flow_velocity(pos, t)

    # Stokes and direction to the comoving frame
    qi, ui, old_dir = frame_transform(dirvec, q_rf, u_rf, vel)
    obs_cmf = geo.normalize3(geo.angle_ab(obs, vel))

    # rotate Stokes into the scattering plane (i1, Bulla+2015)
    ref1, ref2 = meridian(old_dir)
    i1 = rot_angle(old_dir, obs_cmf, ref1, ref2)
    qold = qi * jnp.cos(2 * i1) - ui * jnp.sin(2 * i1)
    uold = qi * jnp.sin(2 * i1) + ui * jnp.cos(2 * i1)

    mu = geo.dot3(old_dir, obs_cmf)
    pn = (3.0 / (16.0 * PI)
          * (1.0 + mu * mu + (mu * mu - 1.0) * qold))
    inew = 0.75 * ((mu * mu + 1.0) + qold * (mu * mu - 1.0))
    qnew = 0.75 * ((mu * mu - 1.0) + qold * (mu * mu + 1.0)) \
        / jnp.maximum(inew, 1e-30)
    unew = 1.5 * mu * uold / jnp.maximum(inew, 1e-30)

    # rotate out of the scattering plane into the observer meridian
    ref1o, ref2o = meridian(obs_cmf)
    i2 = PI + rot_angle(obs_cmf, old_dir, ref1o, ref2o)
    q_cmf = qnew * jnp.cos(2 * i2) + unew * jnp.sin(2 * i2)
    u_cmf = -qnew * jnp.sin(2 * i2) + unew * jnp.cos(2 * i2)

    # back to the rest frame
    q_obs, u_obs, _ = frame_transform(obs_cmf, q_cmf, u_cmf, -vel)
    return pn, q_obs, u_obs


def escat_stokes(dirvec, q_rf, u_rf, pos, t, uniforms,
                 relativistic: bool = False, ntries: int = 12):
    """Polarised electron scattering (escat_rpkt, polarization.cc:6-157).

    uniforms: [N, 3*ntries] random numbers.
    Returns (new_dir_rf, q_new, u_new, doppler_factor).
    """
    vel = geo.flow_velocity(pos, t)

    # Stokes to the comoving frame
    qi, ui, old_dir = frame_transform(dirvec, q_rf, u_rf, vel)

    # dipole rejection sampling (Code & Whitney 1995): accept the first
    # (M, phi) whose phase-function value exceeds the test variate
    accepted = jnp.zeros(dirvec.shape[0], bool)
    M = jnp.zeros(dirvec.shape[0])
    phisc = jnp.zeros(dirvec.shape[0])
    for k in range(ntries):
        zr, zr2, zr3 = (uniforms[:, 3 * k], uniforms[:, 3 * k + 1],
                        uniforms[:, 3 * k + 2])
        M_try = 2 * zr - 1
        mu_try = M_try**2
        phi_try = 2 * PI * zr2
        pfn = (mu_try + 1) + (mu_try - 1) * (jnp.cos(2 * phi_try) * qi
                                             + jnp.sin(2 * phi_try) * ui)
        ok = (2 * zr3 <= pfn) & ~accepted
        M = jnp.where(ok | (~accepted & (k == ntries - 1)), M_try, M)
        phisc = jnp.where(ok | (~accepted & (k == ntries - 1)), phi_try,
                          phisc)
        accepted = accepted | ok

    tsc = jnp.arccos(jnp.clip(M, -1.0, 1.0))
    od = old_dir
    rho = jnp.sqrt(jnp.maximum(1.0 - od[:, 2] ** 2, 1e-20))
    polar = jnp.abs(od[:, 2]) >= 0.99999
    sin_t, cos_t = jnp.sin(tsc), jnp.cos(tsc)
    new_dir = jnp.stack([
        sin_t / rho * (od[:, 1] * jnp.sin(phisc)
                       - od[:, 0] * od[:, 2] * jnp.cos(phisc))
        + od[:, 0] * cos_t,
        sin_t / rho * (-od[:, 0] * jnp.sin(phisc)
                       - od[:, 1] * od[:, 2] * jnp.cos(phisc))
        + od[:, 1] * cos_t,
        sin_t * jnp.cos(phisc) * rho + od[:, 2] * cos_t,
    ], axis=-1)
    new_dir_polar = jnp.stack([
        sin_t * jnp.cos(phisc), sin_t * jnp.sin(phisc),
        jnp.where(od[:, 2] > 0, cos_t, -cos_t)], axis=-1)
    new_dir = jnp.where(polar[:, None], new_dir_polar, new_dir)
    new_dir = geo.normalize3(new_dir)

    # rotate Stokes into the scattering plane (i1)
    ref1, ref2 = meridian(old_dir)
    i1 = rot_angle(old_dir, new_dir, ref1, ref2)
    qold = qi * jnp.cos(2 * i1) - ui * jnp.sin(2 * i1)
    uold = qi * jnp.sin(2 * i1) + ui * jnp.cos(2 * i1)

    # dipole scattering matrix (polarization.cc:103-113)
    mu = geo.dot3(old_dir, new_dir)
    inew = 0.75 * ((mu * mu + 1.0) + qold * (mu * mu - 1.0))
    qnew = 0.75 * ((mu * mu - 1.0) + qold * (mu * mu + 1.0)) \
        / jnp.maximum(inew, 1e-30)
    unew = 1.5 * mu * uold / jnp.maximum(inew, 1e-30)

    # rotate out of the scattering plane (i2)
    ref1n, ref2n = meridian(new_dir)
    i2 = PI + rot_angle(new_dir, old_dir, ref1n, ref2n)
    q_cmf = qnew * jnp.cos(2 * i2) + unew * jnp.sin(2 * i2)
    u_cmf = -qnew * jnp.sin(2 * i2) + unew * jnp.cos(2 * i2)

    # back to the rest frame
    q_rf_new, u_rf_new, dir_rf = frame_transform(new_dir, q_cmf, u_cmf,
                                                 -vel)
    dopp = geo.doppler_nucmf_on_nurf(dir_rf, vel, relativistic)
    return dir_rf, q_rf_new, u_rf_new, dopp
