"""Vectorised kinematics and cell-boundary geometry (simulation units).

Rebuild of the reference's vectors.h/vectors.cc and boundary.cc as
batched pure functions over packet megabatches. All inputs/outputs are
in simulation units (see units.py): lengths in c*tmin, times in tmin,
velocities in units of c — so the speed of light is 1 and the
homologous-flow velocity at position ``pos`` and time ``t`` is simply
``pos / t``.

Reference correspondences:
* doppler factor            vectors.h:81-105
* aberration                vectors.h:63-79
* packet move               vectors.h:113-144
* isotropic direction       vectors.cc:46-65
* scatter through angle     vectors.cc:10-44
* boundary crossing         boundary.cc:101-330
"""

from __future__ import annotations

import jax.numpy as jnp

# cell_boundary codes (boundary.h); 0 = none
BOUNDARY_NONE = 0
NEG_X, POS_X, NEG_Y, POS_Y, NEG_Z, POS_Z = 1, 2, 3, 4, 5, 6


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)


def norm3(a):
    return jnp.sqrt(dot3(a, a))


def normalize3(a):
    return a / jnp.maximum(norm3(a), 1e-30)[..., None]


def cross3(a, b):
    return jnp.cross(a, b)


def flow_velocity(pos, t):
    """Homologous flow velocity (units of c): v = pos / t."""
    return pos / t[..., None]


def doppler_nucmf_on_nurf(dir_rf, vel_rf, relativistic: bool = False):
    """nu_cmf / nu_rf for rest-frame direction and local flow velocity
    (vectors.h:81-105). First order by default; optional full SR."""
    ndotv = dot3(dir_rf, vel_rf)
    dopp = 1.0 - ndotv
    if relativistic:
        betasq = dot3(vel_rf, vel_rf)
        dopp = dopp / jnp.sqrt(1.0 - betasq)
    return dopp


def doppler_packet(pos, dir_rf, t, relativistic: bool = False):
    return doppler_nucmf_on_nurf(dir_rf, flow_velocity(pos, t),
                                 relativistic)


def angle_ab(dir1, vel):
    """Relativistic aberration: direction in frame 2 given direction in
    frame 1 and velocity of frame 2 w.r.t. frame 1 (vectors.h:63-79).
    ``vel`` in units of c."""
    vsqr = dot3(vel, vel)
    gamma_rel = 1.0 / jnp.sqrt(jnp.maximum(1.0 - vsqr, 1e-12))
    ndotv = dot3(dir1, vel)
    fact1 = gamma_rel * (1.0 - ndotv)
    fact2 = gamma_rel - (gamma_rel * gamma_rel * ndotv / (gamma_rel + 1.0))
    return (dir1 - vel * fact2[..., None]) / fact1[..., None]


def isotropic_direction(u1, u2):
    """Isotropic unit vectors from two uniforms (vectors.cc:46-65)."""
    mu = -1.0 + 2.0 * u1
    phi = u2 * 2.0 * jnp.pi
    sintheta = jnp.sqrt(jnp.maximum(1.0 - mu * mu, 0.0))
    return jnp.stack([sintheta * jnp.cos(phi),
                      sintheta * jnp.sin(phi), mu], axis=-1)


def scatter_dir(dir_in, cos_theta, u_phi):
    """Rotate ``dir_in`` through scattering angle theta with random
    azimuth (vectors.cc:10-44)."""
    phi = u_phi * 2.0 * jnp.pi
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
    zprime = cos_theta
    xprime = sin_theta * jnp.cos(phi)
    yprime = sin_theta * jnp.sin(phi)

    dx, dy, dz = dir_in[..., 0], dir_in[..., 1], dir_in[..., 2]
    rho2 = dx * dx + dy * dy
    # when dir_in ~ +-z the rotation frame is degenerate; handle with a
    # fixed frame there
    safe = rho2 > 1e-20
    norm1 = 1.0 / jnp.sqrt(jnp.where(safe, rho2, 1.0))
    norm2 = 1.0 / jnp.maximum(jnp.sqrt(rho2 + dz * dz), 1e-30)

    r11 = dy * norm1
    r12 = -dx * norm1
    r13 = jnp.zeros_like(dx)
    r21 = dx * dz * norm1 * norm2
    r22 = dy * dz * norm1 * norm2
    r23 = -norm2 / norm1
    r31 = dx * norm2
    r32 = dy * norm2
    r33 = dz * norm2

    out = jnp.stack([
        r11 * xprime + r21 * yprime + r31 * zprime,
        r12 * xprime + r22 * yprime + r32 * zprime,
        r13 * xprime + r23 * yprime + r33 * zprime,
    ], axis=-1)
    # degenerate case: dir_in along +-z: scattering frame is trivial
    sgn = jnp.sign(jnp.where(jnp.abs(dz) > 0, dz, 1.0))
    out_polar = jnp.stack([xprime, sgn * yprime, sgn * zprime], axis=-1)
    return jnp.where(safe[..., None], out, out_polar)


# ---------------------------------------------------------------------------
# Boundary crossing
# ---------------------------------------------------------------------------

def boundary_cross_uniform(pos, dirvec, t, cell, last_cross, ncoord,
                           pos_min_table, wid, cmin_pre=None,
                           wid_pre=None):
    """Distance to the next cell boundary on the uniform 3D grid
    (boundary.cc:101-330, GRID_UNIFORM branch).

    All geometry tables are at t=tmin (sim units); boundaries expand
    homologously: x_b(t) = x_b(tmin) * t (tmin == 1 in sim units).

    Returns (sdist, snext, new_last_cross). ``snext == -99`` flags
    escape from the grid.
    """
    idx = cell
    ix = idx % ncoord
    iy = (idx // ncoord) % ncoord
    iz = idx // (ncoord * ncoord)
    cellpt = jnp.stack([ix, iy, iz], axis=-1)  # [N,3]
    strides = jnp.array([1, ncoord, ncoord * ncoord], dtype=jnp.int32)

    # prefetched per-lane geometry (from the packed cell row) avoids
    # two per-iteration gathers
    cmin = (cmin_pre if cmin_pre is not None
            else pos_min_table[cell])  # [N,3] at tmin
    w = (wid_pre if wid_pre is not None else wid[cell])[..., None]
    cmax = cmin + w

    # cell_boundary codes per axis
    negdir = jnp.array([NEG_X, NEG_Y, NEG_Z], dtype=jnp.int32)
    posdir = jnp.array([POS_X, POS_Y, POS_Z], dtype=jnp.int32)

    tstart = t[..., None]
    # tolerance ~ reference's "10 cm": use a relative tolerance on the
    # cell width (robust under float32)
    tol = 1e-5 * w

    # -- recover packets that drifted outside their cell (numerical
    # fix-up, boundary.cc:166-222)
    below = pos < (cmin * tstart - tol)  # outside through the lower face
    above = pos > (cmax * tstart + tol)  # outside through the upper face
    # moving outward relative to the expanding boundary?
    vrel = dirvec - pos / tstart
    moving_up = vrel > 0
    moving_dn = vrel < 0

    # if outside below and truly moving down, jump to the lower neighbour
    # (or escape at the grid edge); vice versa for above.
    at_min = cellpt == 0
    at_max = cellpt == (ncoord - 1)

    fix_dn = below & moving_dn & (last_cross[..., None] != posdir)
    fix_up = above & moving_up & (last_cross[..., None] != negdir)

    # choose at most one fix-up axis (first matching axis wins)
    def first_axis(mask):
        any_m = jnp.any(mask, axis=-1)
        ax = jnp.argmax(mask, axis=-1)
        return any_m, ax

    any_dn, ax_dn = first_axis(fix_dn)
    any_up, ax_up = first_axis(fix_up)
    do_fix = any_dn | any_up
    fix_axis = jnp.where(any_dn, ax_dn, ax_up)
    fix_sign = jnp.where(any_dn, -1, 1)  # direction of cell change
    fix_escape = jnp.where(
        any_dn, jnp.take_along_axis(at_min, ax_dn[..., None], -1)[..., 0],
        jnp.take_along_axis(at_max, ax_up[..., None], -1)[..., 0])
    fix_snext = jnp.where(
        fix_escape, -99, cell + fix_sign * strides[fix_axis])
    # crossing downward means passing the negative face, and vice versa
    fix_lc = jnp.where(any_dn, negdir[fix_axis], posdir[fix_axis])

    # packets outside a face but moving back in: exclude that face from
    # the crossing search so they re-enter cleanly (the reference's
    # "pretending last_cross" recovery, boundary.cc:216-219)
    pretend_dn = below & ~moving_dn  # below the min face, moving back up
    pretend_up = above & ~moving_up  # above the max face, moving back down
    any_p_dn, ax_p_dn = first_axis(pretend_dn)
    any_p_up, ax_p_up = first_axis(pretend_up)
    # excluding the min face requires last_cross == posdir (see the
    # allowed_min test below); excluding the max face requires negdir
    last_cross_eff = jnp.where(any_p_dn, posdir[ax_p_dn], last_cross)
    last_cross_eff = jnp.where(any_p_up, negdir[ax_p_up], last_cross_eff)

    # -- normal crossing-time solve (boundary.cc:253-266):
    # t_cross = (x0 - d*t0) / (x_b - d)  (c == 1, tmin == 1)
    denom_max = cmax - dirvec
    denom_min = cmin - dirvec
    num = pos - dirvec * tstart
    big = jnp.float32(1e30)

    def cross_time(denom, bound):
        tt = num / jnp.where(jnp.abs(denom) > 1e-12, denom,
                             jnp.where(denom >= 0, 1e-12, -1e-12)) - tstart
        return tt

    t_max_b = cross_time(denom_max, cmax)  # [N,3]
    t_min_b = cross_time(denom_min, cmin)

    allowed_max = last_cross_eff[..., None] != negdir
    allowed_min = last_cross_eff[..., None] != posdir
    t_max_b = jnp.where((t_max_b > 0) & allowed_max, t_max_b, big)
    t_min_b = jnp.where((t_min_b > 0) & allowed_min, t_min_b, big)

    tall = jnp.concatenate([t_max_b, t_min_b], axis=-1)  # [N,6]
    kmin = jnp.argmin(tall, axis=-1)
    tcross = jnp.take_along_axis(tall, kmin[..., None], -1)[..., 0]

    is_pos_face = kmin < 3
    axis = kmin % 3
    stride = strides[axis]
    escape = jnp.where(
        is_pos_face, jnp.take_along_axis(at_max, axis[..., None], -1)[..., 0],
        jnp.take_along_axis(at_min, axis[..., None], -1)[..., 0])
    snext = jnp.where(escape, -99,
                      jnp.where(is_pos_face, cell + stride, cell - stride))
    new_lc = jnp.where(is_pos_face, posdir[axis], negdir[axis])

    sdist = tcross  # distance = c * time, c == 1
    # no solution found (tcross still big): treat as stuck-free escape
    stuck = tcross >= big
    snext = jnp.where(stuck, -99, snext)
    sdist = jnp.where(stuck, 0.0, sdist)

    sdist = jnp.where(do_fix, 0.0, sdist)
    snext = jnp.where(do_fix, fix_snext, snext)
    new_lc = jnp.where(do_fix, fix_lc, new_lc)
    return sdist, snext.astype(jnp.int32), new_lc.astype(jnp.int32)


def boundary_cross_spherical(pos, dirvec, t, cell, last_cross, ncells,
                             r_min_table, wid, rmin_pre=None,
                             wid_pre=None):
    """Distance to the next shell boundary on the 1D spherical grid
    (get_shellcrossdist, boundary.cc:14-99 + the SPHERICAL1D branch of
    boundary_cross).

    Shells expand homologously: R_i(t) = R_i(tmin) * t. The crossing
    distance s along the ray solves |pos + s*dir|^2 = (R0*(t + s))^2
    with c == 1 (dir is a unit vector).
    """
    r_in0 = (rmin_pre if rmin_pre is not None
             else r_min_table[cell])  # inner shell radius at tmin
    r_out0 = r_in0 + (wid_pre if wid_pre is not None else wid[cell])
    tstart = t
    big = jnp.float32(1e30)

    def shell_dist(R0, inner):
        # quadratic a s^2 + b s + c = 0
        a = 1.0 - R0 * R0
        b = 2.0 * (dot3(pos, dirvec) - R0 * R0 * tstart)
        c = dot3(pos, pos) - (R0 * tstart) ** 2
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        d1 = (-b + sq) / (2.0 * a)
        d2 = (-b - sq) / (2.0 * a)

        def valid(d):
            posf = pos + d[..., None] * dirvec
            radial_out = dot3(posf, dirvec) > 0
            ok = d > 0
            # inner boundary must be entered moving inward; outer moving
            # outward (boundary.cc:64-79)
            ok = ok & jnp.where(inner, ~radial_out, radial_out)
            ok = ok & (disc > 0)
            return jnp.where(ok, d, big)

        return jnp.minimum(valid(d1), valid(d2))

    d_inner = jnp.where(r_in0 > 0, shell_dist(r_in0, True), big)
    d_outer = shell_dist(r_out0, False)

    inner_first = d_inner < d_outer
    sdist = jnp.where(inner_first, d_inner, d_outer)
    at_edge = cell == (ncells - 1)
    snext = jnp.where(inner_first, cell - 1,
                      jnp.where(at_edge, -99, cell + 1))
    stuck = sdist >= big
    # no forward intersection at all should not happen for a packet
    # inside the shell; nudge outward if it does
    snext = jnp.where(stuck, jnp.where(at_edge, -99, cell + 1), snext)
    sdist = jnp.where(stuck, 0.0, sdist)
    new_lc = jnp.where(inner_first, NEG_X, POS_X)
    return sdist, snext.astype(jnp.int32), new_lc.astype(jnp.int32)
