"""Device-side (jitted) macro-atom transition-rate table build.

The numpy builder in macroatom.py materialises ~10 dense float64
[ncells, nlines] intermediates on the host — fine for toy linelists,
a wall at reference scale (nlines 1e5-1e7; SURVEY.md §7.3).  This
module builds the same per-timestep cumulative tables ON DEVICE in
float32, scanning the linelist in bounded chunks so peak HBM is
  outputs (5 x [ncells, nlines] f32) + O([ncells, chunk]) scratch.
At the 500-cell x 1e5-line scale that is ~1 GB of tables and a few
tens of MB of scratch; beyond that the cell axis is sharded over the
device mesh (grid decomposition) rather than grown on one chip.

The rate formulas are identical to macroatom.bound_bound_rates
(reference: calculate_macroatom_transitionrates, macroatom.cc:57-159;
collisional formulas macroatom.h:52-150); tests assert the f32 device
tables match the float64 host build to cumsum tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import CLIGHT, H, KB, PI, H_ionpot
from .macroatom import (C_0, HCLIGHTOVERFOURPI, CLIGHTSQUAREDOVERTWOH,
                        MA_RADDEEXC, MA_COLDEEXC, MA_DOWNSAME,
                        MA_UPSAME, MA_RADRECOMB, MA_COLRECOMB,
                        MA_DOWNLOWER, MA_UPHIGHER, N_MA_PROC)


def pack_line_constants(ad, ma_static) -> dict:
    """One-time device upload of the per-line constants the table
    build needs (float64 precomputations done once on host)."""
    lo, up = ad.line_lower, ad.line_upper
    B_ul = CLIGHTSQUAREDOVERTWOH / ad.line_nu**3 * ad.line_A
    B_lu = (ad.level_g[up] / ad.level_g[lo]) * B_ul
    eps_trans = ad.level_energy[up] - ad.level_energy[lo]
    return {
        "lo": jnp.asarray(lo, jnp.int32),
        "up": jnp.asarray(up, jnp.int32),
        "nu": jnp.asarray(ad.line_nu, jnp.float32),
        "A": jnp.asarray(ad.line_A, jnp.float32),
        "f_lu": jnp.asarray(ad.line_f, jnp.float32),
        "coll_str": jnp.asarray(ad.line_coll_str, jnp.float32),
        "forbidden": jnp.asarray(ad.line_forbidden, bool),
        "B_ul": jnp.asarray(B_ul, jnp.float32),
        "B_lu": jnp.asarray(B_lu, jnp.float32),
        "eps_trans": jnp.asarray(eps_trans, jnp.float32),
        "eps_lo_abs": jnp.asarray(ad.level_energy[lo], jnp.float32),
        "byup_perm": jnp.asarray(ma_static.byup_perm, jnp.int32),
        "bylo_perm": jnp.asarray(ma_static.bylo_perm, jnp.int32),
        "nlevels": int(ad.nlevels_total),
    }


def _planck_jnu(nu, T, W):
    x = H * nu / (KB * jnp.maximum(T, 1.0))
    # grouped left-to-right so no intermediate reaches nu^3 (which
    # overflows float32 for nu ~ 2e16 Hz)
    b = ((jnp.float32(2.0 * H / CLIGHT**2) * nu) * nu * nu
         / jnp.expm1(jnp.clip(x, 1e-6, 88.0)))
    return W * b


def _line_weights(lc_chunk, nl, Te, TR, W, nne, t_mid, rf=None,
                  jb_vals=None):
    """Per-(cell, chunk-line) weights. ``lc_chunk``: line constants
    sliced to the chunk; ``nl``: levelpops [ncells, nlevels] f32.
    Returns w_rad, w_col, w_down, w_up, w_kexc [ncells, K]."""
    lo, up = lc_chunk["lo"], lc_chunk["up"]
    n_l = nl[:, lo]          # [ncells, K]
    n_u = nl[:, up]
    Te_c = jnp.maximum(Te, 1.0)[:, None]
    nne_c = nne[:, None]

    tau = jnp.maximum((lc_chunk["B_lu"][None, :] * n_l
                       - lc_chunk["B_ul"][None, :] * n_u)
                      * jnp.float32(HCLIGHTOVERFOURPI * t_mid), 0.0)
    beta = jnp.where(tau > 1e-30, -jnp.expm1(-tau)
                     / jnp.maximum(tau, 1e-30), 1.0)
    R_deexc = jnp.where(tau > 1e-30, lc_chunk["A"][None, :] * beta, 0.0)

    if rf is not None:
        # multibin field J_nu at the line frequency
        # (radfield.cc:898-960): per-line bin lookup. ``W_bin`` is
        # either the fitted dilution factor (J = W B(T_R)) or, in
        # raw-estimator mode, the piecewise-constant J_nu itself
        # (detailed bf estimators, radfield.cc:764-828).
        nu_edges, W_bin, TR_bin, is_raw = rf
        b = jnp.searchsorted(nu_edges, lc_chunk["nu"],
                             side="right") - 1
        inside = (b >= 0) & (b < W_bin.shape[1])
        bc = jnp.clip(b, 0, W_bin.shape[1] - 1)
        if is_raw:
            Jnu = jnp.where(inside[None, :], W_bin[:, bc], 0.0)
        else:
            Jnu = jnp.where(
                inside[None, :],
                _planck_jnu(lc_chunk["nu"][None, :], TR_bin[:, bc],
                            W_bin[:, bc]), 0.0)
    else:
        Jnu = _planck_jnu(lc_chunk["nu"][None, :], TR[:, None],
                          W[:, None])
    if jb_vals is not None:
        # detailed per-line Jb_lu estimators override the modelled
        # field at the selected lines (macroatom.cc:1006-1015);
        # jb_col maps each line to its column in jb_vals, with the
        # last (zero) column as the no-estimator sentinel
        col = lc_chunk["jb_col"]
        has_jb = col < jb_vals.shape[1] - 1
        Jnu = jnp.where(has_jb[None, :],
                        jb_vals[:, jnp.clip(col, 0,
                                            jb_vals.shape[1] - 1)],
                        Jnu)
    R_over_J = jnp.where(
        n_l > 0,
        (lc_chunk["B_lu"][None, :] - lc_chunk["B_ul"][None, :]
         * n_u / jnp.maximum(n_l, 1e-30)) * beta,
        lc_chunk["B_lu"][None, :] * beta)
    R_exc = jnp.where(tau > 1e-30, jnp.maximum(R_over_J, 0.0) * Jnu,
                      0.0)

    # collisional rates (macroatom.h:52-150)
    eps_trans = lc_chunk["eps_trans"][None, :]
    eokt = eps_trans / (jnp.float32(KB) * Te_c)
    eokt_c = jnp.minimum(eokt, 88.0)
    sqTe = jnp.sqrt(Te_c)
    cs = lc_chunk["coll_str"][None, :]
    forb = lc_chunk["forbidden"][None, :]
    f_lu = lc_chunk["f_lu"][None, :]
    g_l = lc_chunk["g_l"][None, :]
    g_u = lc_chunk["g_u"][None, :]

    gaunt = jnp.where(
        eokt > 0.33421, 0.2,
        0.276 * jnp.exp(eokt_c)
        * (-0.5772156649 - jnp.log(jnp.maximum(eokt, 1e-30))))
    hioneps2 = (jnp.float32(H_ionpot) / eps_trans) ** 2
    vr_deexc = (jnp.float32(C_0 * 14.51039491) * nne_c * sqTe * f_lu
                * hioneps2 * eokt * (g_l / g_u) * gaunt)
    vr_exc = (jnp.float32(C_0 * 14.51039491) * nne_c * sqTe * f_lu
              * hioneps2 * eokt * jnp.exp(-eokt_c)
              * jnp.maximum(gaunt, 0.2))
    axel_deexc = nne_c * jnp.float32(8.629e-6 * 0.01) * g_l / sqTe
    axel_exc = (nne_c * jnp.float32(8.629e-6 * 0.01)
                * jnp.exp(-eokt_c) * g_u / sqTe)
    cs_deexc = nne_c * jnp.float32(8.629e-6) * cs / g_u / sqTe
    cs_exc = (nne_c * jnp.float32(8.629e-6) * cs * jnp.exp(-eokt_c)
              / g_l / sqTe)
    C_deexc = jnp.where(cs >= 0, cs_deexc,
                        jnp.where(forb, axel_deexc, vr_deexc))
    C_exc = jnp.where(cs >= 0, cs_exc,
                      jnp.where(forb, axel_exc, vr_exc))
    # nne-free variant (the formulas are linear in nne): used for the
    # per-nne k-packet channel weights, which must not underflow in
    # f32 when nne -> 0
    C_exc1 = jnp.where(cs >= 0,
                       jnp.float32(8.629e-6) * cs * jnp.exp(-eokt_c)
                       / g_l / sqTe,
                       jnp.where(forb,
                                 jnp.float32(8.629e-6 * 0.01)
                                 * jnp.exp(-eokt_c) * g_u / sqTe,
                                 jnp.float32(C_0 * 14.51039491) * sqTe
                                 * f_lu * hioneps2 * eokt
                                 * jnp.exp(-eokt_c)
                                 * jnp.maximum(gaunt, 0.2)))

    eps_lo = lc_chunk["eps_lo_abs"][None, :]
    w_rad = R_deexc * eps_trans
    w_col = C_deexc * eps_trans
    w_down = (R_deexc + C_deexc) * eps_lo
    w_up = (R_exc + C_exc) * eps_lo
    # k-packet collexc channel weight SCALED by 1/nne (every kpkt
    # cooling channel is linear in nne, so the per-nne weights give
    # the identical selection CDF without f32 underflow at nne -> 0 —
    # the regime that sets the reference's ignition-timestep UV
    # spectrum, where collexc wins the ratio as the charged-particle
    # channels vanish faster; do_kpkt, kpkt.cc:518-560)
    w_kexc = C_exc1 * eps_trans * n_l
    return w_rad, w_col, w_down, w_up, w_kexc


@partial(jax.jit, static_argnames=("nlevels", "nchunks", "has_rf", "has_jb",
                                   "rf_raw"))
def _build_core(lc, g_l_all, g_u_all, nl, Te, TR, W, nne, t_mid,
                rf_arrays, jb_vals=None, *, nlevels: int,
                nchunks: int, has_rf: bool, rf_raw: bool = False,
                has_jb: bool = False):
    """Chunked scan over the (padded) linelist: per-line weights in
    global order + per-level process aggregates."""
    ncells = nl.shape[0]
    npad = lc["lo"].shape[0]
    K = npad // nchunks
    rf = rf_arrays + (rf_raw,) if has_rf else None

    def body(proc, i):
        s = i * K
        chunk = {k: jax.lax.dynamic_slice_in_dim(lc[k], s, K)
                 for k in ("lo", "up", "nu", "A", "f_lu", "coll_str",
                           "forbidden", "B_ul", "B_lu", "eps_trans",
                           "eps_lo_abs")
                 + (("jb_col",) if has_jb else ())}
        chunk["g_l"] = jax.lax.dynamic_slice_in_dim(g_l_all, s, K)
        chunk["g_u"] = jax.lax.dynamic_slice_in_dim(g_u_all, s, K)
        w_rad, w_col, w_down, w_up, w_kexc = _line_weights(
            chunk, nl, Te, TR, W, nne, t_mid, rf=rf,
            jb_vals=jb_vals if has_jb else None)
        # per-level process sums (np.add.at analogue)
        up_i, lo_i = chunk["up"], chunk["lo"]
        proc = proc.at[:, up_i, MA_RADDEEXC].add(w_rad)
        proc = proc.at[:, up_i, MA_COLDEEXC].add(w_col)
        proc = proc.at[:, up_i, MA_DOWNSAME].add(w_down)
        proc = proc.at[:, lo_i, MA_UPSAME].add(w_up)
        return proc, (w_rad, w_down, w_up, w_kexc)

    proc0 = jnp.zeros((ncells, nlevels, N_MA_PROC), jnp.float32)
    proc, (w_rad, w_down, w_up, w_kexc) = jax.lax.scan(
        body, proc0, jnp.arange(nchunks))
    # [nchunks, ncells, K] -> [ncells, npad]
    tr = lambda a: jnp.moveaxis(a, 0, 1).reshape(ncells, npad)
    return proc, tr(w_rad), tr(w_down), tr(w_up), tr(w_kexc)


class DeviceTableBuilder:
    """Builds the per-timestep macro-atom / kpkt cumulative tables on
    device.  Constants are uploaded once; ``build`` jits per shape."""

    def __init__(self, ad, ma_static, ph=None, line_chunk: int = 8192,
                 jb_sel=None):
        self.ad = ad
        self.ma_static = ma_static
        self.ph = ph
        self.nlines = ad.nlines
        nchunks = max(1, -(-ad.nlines // line_chunk))
        self.npad = nchunks * line_chunk
        self.nchunks = nchunks
        lc = pack_line_constants(ad, ma_static)
        self.nlevels = lc.pop("nlevels")
        padn = self.npad - ad.nlines
        # pad with inert lines (A=0, coll_str=0 non-forbidden ->
        # every weight 0; lo=up=0 keeps gathers in range)
        pad_spec = {"lo": 0, "up": 0, "nu": 1.0, "A": 0.0, "f_lu": 0.0,
                    "coll_str": 0.0, "forbidden": False, "B_ul": 0.0,
                    "B_lu": 0.0, "eps_trans": 1.0, "eps_lo_abs": 0.0}
        self.lc = {
            k: jnp.concatenate(
                [v, jnp.full((padn,), pad_spec[k], v.dtype)])
            for k, v in lc.items() if k not in ("byup_perm",
                                                "bylo_perm")}
        self.byup_perm = jnp.asarray(ma_static.byup_perm, jnp.int32)
        self.bylo_perm = jnp.asarray(ma_static.bylo_perm, jnp.int32)
        g = np.asarray(ad.level_g, np.float32)
        self.g_l = jnp.concatenate(
            [jnp.asarray(g[ad.line_lower]), jnp.ones(padn, jnp.float32)])
        self.g_u = jnp.concatenate(
            [jnp.asarray(g[ad.line_upper]), jnp.ones(padn, jnp.float32)])
        # detailed Jb_lu estimator columns: line -> index into the
        # per-cell jb_vals array (last column = no-estimator sentinel)
        self.jb_nsel = 0 if jb_sel is None else len(jb_sel)
        if self.jb_nsel:
            col = np.full(self.npad, self.jb_nsel, np.int32)
            col[np.asarray(jb_sel)] = np.arange(self.jb_nsel,
                                                dtype=np.int32)
            self.lc["jb_col"] = jnp.asarray(col)

    def build(self, levelpops, Te, TR, W, nne, t_mid,
              pirates=None, radfield=None, jb_vals=None) -> dict:
        """Returns the same table dict as macroatom.build_tables, as
        device float32 arrays (un-padded back to nlines columns)."""
        ad, ph = self.ad, self.ph
        nl = jnp.asarray(levelpops, jnp.float32)
        Te_j = jnp.asarray(Te, jnp.float32)
        TR_j = jnp.asarray(TR, jnp.float32)
        W_j = jnp.asarray(W, jnp.float32)
        nne_j = jnp.asarray(nne, jnp.float32)
        has_rf = radfield is not None
        rf_raw = has_rf and hasattr(radfield, "J_bin")
        if rf_raw:
            rf_arrays = (jnp.asarray(radfield.nu_edges, jnp.float32),
                         jnp.asarray(radfield.Jnu_dens, jnp.float32),
                         jnp.asarray(radfield.T_R, jnp.float32))
        elif has_rf:
            rf_arrays = (jnp.asarray(radfield.nu_edges, jnp.float32),
                         jnp.asarray(radfield.W, jnp.float32),
                         jnp.asarray(radfield.T_R, jnp.float32))
        else:
            rf_arrays = (jnp.zeros(1, jnp.float32),
                         jnp.zeros((1, 1), jnp.float32),
                         jnp.zeros((1, 1), jnp.float32))
        has_jb = jb_vals is not None and self.jb_nsel > 0
        jbv = (jnp.asarray(jb_vals, jnp.float32) if has_jb
               else jnp.zeros((nl.shape[0], 1), jnp.float32))
        proc, w_rad, w_down, w_up, w_kexc = _build_core(
            self.lc, self.g_l, self.g_u, nl, Te_j, TR_j, W_j, nne_j,
            jnp.float32(t_mid), rf_arrays, jbv, nlevels=self.nlevels,
            nchunks=self.nchunks, has_rf=has_rf, rf_raw=rf_raw,
            has_jb=has_jb)
        n = self.nlines

        # ionisation / recombination channels [ncells, ncont] (small;
        # host-computed pirates, matching macroatom.build_tables)
        if ph is not None and pirates is not None:
            eps = ad.level_energy
            eps_lower_c = jnp.asarray(eps[ph.cont_level], jnp.float32)
            eps_trans_c = jnp.asarray(
                eps[ph.cont_upperlevel] - eps[ph.cont_level],
                jnp.float32)
            R_rec = nne_j[:, None] * jnp.asarray(pirates.alpha_sp,
                                                 jnp.float32)
            C_rec = jnp.asarray(pirates.c_rec, jnp.float32)
            w_radrec = R_rec * eps_trans_c[None, :]
            w_colrec = C_rec * eps_trans_c[None, :]
            w_downlower = (R_rec + C_rec) * eps_lower_c[None, :]
            w_uphigher = ((jnp.asarray(pirates.gamma_corr, jnp.float32)
                           + jnp.asarray(pirates.c_ion, jnp.float32))
                          * eps_lower_c[None, :])
            cu = jnp.asarray(ph.cont_upperlevel, jnp.int32)
            cl = jnp.asarray(ph.cont_level, jnp.int32)
            proc = proc.at[:, cu, MA_RADRECOMB].add(w_radrec)
            proc = proc.at[:, cu, MA_COLRECOMB].add(w_colrec)
            proc = proc.at[:, cu, MA_DOWNLOWER].add(w_downlower)
            proc = proc.at[:, cl, MA_UPHIGHER].add(w_uphigher)
            btp = jnp.asarray(self.ma_static.bytarget_perm, jnp.int32)
            w_radrec_cum = jnp.cumsum(w_radrec[:, btp], axis=1)
            w_downlower_cum = jnp.cumsum(w_downlower[:, btp], axis=1)
        else:
            ncells = nl.shape[0]
            w_radrec_cum = jnp.zeros((ncells, 1), jnp.float32)
            w_downlower_cum = jnp.zeros((ncells, 1), jnp.float32)

        return {
            "proc_cum": jnp.cumsum(proc, axis=2),
            "w_raddeexc": jnp.cumsum(
                w_rad[:, :n][:, self.byup_perm], axis=1),
            "w_downsame": jnp.cumsum(
                w_down[:, :n][:, self.byup_perm], axis=1),
            "w_upsame": jnp.cumsum(
                w_up[:, :n][:, self.bylo_perm], axis=1),
            "w_kcollexc": jnp.cumsum(w_kexc[:, :n], axis=1),
            "w_radrecomb": w_radrec_cum,
            "w_downlower": w_downlower_cum,
        }
