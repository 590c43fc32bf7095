"""Propagation grid and per-cell model state.

Rebuild of the reference's grid layer (reference: grid.cc) as an
immutable host-side ``Grid`` (geometry + mappings, numpy float64) plus
a ``GridTables`` pytree of per-cell device arrays in simulation units
that the transport kernels consume.

Geometry supported:
* spherical 1D shells (spherical1d_grid_setup, grid.cc:2104-2130)
* uniform cubic 3D grid (uniform_grid_setup, grid.cc:2028-2102), with
  cell ordering x-fastest, matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from . import decay as decay_mod
from .config import SimConfig
from .constants import (CLIGHT, GRID_SPHERICAL1D, GRID_UNIFORM, ME, MH, PI,
                        QE, STEBO)
from .model import MAX_Z_ABUND, Model
from .units import Units

# standard atomic weights for Z=1..30 (for electron density estimates)
ATOMIC_WEIGHTS = np.array([
    1.008, 4.0026, 6.94, 9.0122, 10.81, 12.011, 14.007, 15.999, 18.998,
    20.180, 22.990, 24.305, 26.982, 28.085, 30.974, 32.06, 35.45, 39.948,
    39.098, 40.078, 44.956, 47.867, 50.942, 51.996, 54.938, 55.845,
    58.933, 58.693, 63.546, 65.38,
])


@dataclasses.dataclass
class Grid:
    """Host-side propagation grid + modelgrid state (float64 CGS)."""
    grid_type: int
    ncoordgrid: tuple[int, int, int]
    ngrid: int
    nmodel: int  # number of model cells (empty sentinel = nmodel)
    cell_mgi: np.ndarray  # [ngrid] propagation cell -> model cell
    # geometry at t=tmin (CGS)
    pos_min: np.ndarray  # [ngrid, ndim] lower cell corner at tmin [cm]
    wid: np.ndarray  # [ngrid] or scalar-per-cell width at tmin [cm]
    vmax: float
    rmax: float  # vmax * tmin
    tmin: float
    # per-modelcell state (length nmodel; empty cells handled via mgi map)
    rho_init: np.ndarray  # [nmodel] density at tmin
    rho: np.ndarray
    ffegrp: np.ndarray
    kappagrey: np.ndarray
    Te: np.ndarray
    TR: np.ndarray
    TJ: np.ndarray
    W: np.ndarray
    thick: np.ndarray  # int
    nnetot: np.ndarray  # total electron density (bound+free) [1/cm^3]
    nne: np.ndarray  # free electron density [1/cm^3]
    elem_abund: np.ndarray  # [nmodel, MAX_Z_ABUND] current mass fractions
    vol_init: np.ndarray  # [nmodel] model cell volume at tmin [cm^3]
    elem_abund_init: Optional[np.ndarray] = None  # snapshot at t_model
    # [nmodel] initial thermal energy per mass at tmin [erg/g]
    # (modelgrid q column, grid.cc:1208 — reader already rescaled by
    # t_model/tmin); used with cfg.use_model_initial_energy
    init_energyq: Optional[np.ndarray] = None
    # [nmodel] initial electron fraction (model cellYe column or the
    # Ye.txt override, read_possible_yefile grid.cc:528); -1 = unset
    init_ye: Optional[np.ndarray] = None
    opcase3_normal: float = 0.0
    rho_crit: float = 0.0
    mtot_input: float = 0.0
    mfeg: float = 0.0
    # [ngrid] True where a propagation cell lies outside the ejecta
    # sphere (radial pos >= rmax) when a lower-dimensional model is
    # mapped onto the 3D Cartesian grid (map_1dmodeltogrid,
    # grid.cc:910-940: those cells get the npts_model sentinel)
    cell_outside: Optional[np.ndarray] = None

    @property
    def ndim(self) -> int:
        return 1 if self.grid_type == GRID_SPHERICAL1D else 3

    def cellcoordmax(self, cellindex: int, axis: int) -> float:
        return self.pos_min[cellindex, axis] + self.wid[cellindex]

    @property
    def cell_keep(self) -> np.ndarray:
        """[ngrid] True where a propagation cell has an associated
        non-empty model cell (reference: mgi != npts_model and
        rho_init > 0)."""
        keep = self.rho_init[self.cell_mgi] > 0
        if self.cell_outside is not None:
            keep = keep & ~self.cell_outside
        return keep

    @property
    def vol_gridcell(self) -> np.ndarray:
        """[ngrid] propagation-cell volume at tmin (vol_init_gridcell,
        grid.cc:110-123): the cube volume on the uniform grid, the
        shell volume on the spherical grid."""
        if self.grid_type == GRID_SPHERICAL1D:
            return self.vol_init[self.cell_mgi]
        return np.asarray(self.wid, np.float64) ** 3


def build_grid(model: Model, cfg: SimConfig) -> Grid:
    """Construct the propagation grid from a model (grid_init,
    grid.cc:2132-2229)."""
    tmin = cfg.tmin
    vmax = model.vmax
    rmax = vmax * tmin

    cell_outside = None
    if model.ndim == 1 and cfg.grid_force_uniform:
        # 1D model mapped onto the uniform 3D Cartesian propagation
        # grid — the reference's default kilonova mode
        # (GRID_TYPE=GRID_UNIFORM with a 1D model;
        # map_1dmodeltogrid, grid.cc:910-940)
        n = model.ncells
        nc = cfg.grid_ncoord
        ngrid = nc ** 3
        grid_type = GRID_UNIFORM
        ncoordgrid = (nc, nc, nc)
        widval = 2.0 * rmax / nc
        idx = np.arange(ngrid)
        ix = idx % nc
        iy = (idx // nc) % nc
        iz = idx // (nc * nc)
        pos_min = np.stack([
            -rmax + ix * widval, -rmax + iy * widval,
            -rmax + iz * widval,
        ], axis=1)
        wid = np.full(ngrid, widval)
        centre = pos_min + 0.5 * widval
        radial_pos = np.linalg.norm(centre, axis=1)
        vcell = radial_pos / tmin
        cell_mgi = np.minimum(
            np.searchsorted(model.vout, vcell, side="left"),
            n - 1).astype(np.int32)
        cell_outside = radial_pos >= rmax
        # model-cell volume = cube volume x associated propagation
        # cells (vol_init_modelcell, grid.cc:93-108); the estimator
        # normalisation uses this simulated volume, not the analytic
        # shell volume (grid.cc:1637 comment)
        rho_model = np.asarray(model.rho, np.float64)
        keep = ~cell_outside & (rho_model[cell_mgi] > 0)
        assoc = np.bincount(cell_mgi[keep], minlength=n)
        vol = widval ** 3 * assoc
    elif model.ndim == 1:
        # spherical shells; propagation cell == model cell
        n = model.ncells
        vout = model.vout
        vin = np.concatenate([[0.0], vout[:-1]])
        pos_min = (vin * tmin)[:, None]
        wid = (vout - vin) * tmin
        grid_type = GRID_SPHERICAL1D
        ncoordgrid = (n, 1, 1)
        ngrid = n
        cell_mgi = np.arange(n, dtype=np.int32)
        vol = 4.0 / 3.0 * np.pi * ((vout * tmin) ** 3 - (vin * tmin) ** 3)
    elif model.ndim == 3:
        nc = model.ncoord3d[0]
        assert model.ncoord3d == (nc, nc, nc)
        ngrid = nc ** 3
        assert model.ncells == ngrid
        grid_type = GRID_UNIFORM
        ncoordgrid = (nc, nc, nc)
        cell_mgi = np.arange(ngrid, dtype=np.int32)
        widval = 2.0 * rmax / nc
        # ordering x fastest (grid.cc:2083-2101)
        idx = np.arange(ngrid)
        ix = idx % nc
        iy = (idx // nc) % nc
        iz = idx // (nc * nc)
        pos_min = np.stack([
            -rmax + ix * widval, -rmax + iy * widval, -rmax + iz * widval,
        ], axis=1)
        wid = np.full(ngrid, widval)
        vol = np.full(ngrid, widval ** 3)
    elif model.ndim == 2:
        # axisymmetric (r_cyl, z) models propagate on a 3D Cartesian
        # cube here (the reference uses a native cylindrical grid,
        # grid.cc GRID_CYLINDRICAL2D; nearest-cell sampling preserves
        # the model's mass/abundance structure)
        from .model import model_2d_to_3d
        return build_grid(model_2d_to_3d(model), cfg)
    else:
        raise NotImplementedError(
            f"unsupported model dimensionality {model.ndim}")

    nmodel = model.ncells
    rho_init = np.asarray(model.rho, dtype=np.float64)
    if cell_outside is not None:
        # model shells with no associated propagation cells are empty
        # (the reference drops them from the nonempty-cell list,
        # grid.cc:862-870); zero density keeps every solver and
        # estimator normalisation away from their 0 simulated volume
        rho_init = np.where(np.asarray(vol) > 0, rho_init, 0.0)

    # empty-cell handling: cells with zero density are mapped to the
    # empty sentinel mgi == nmodel (allocate_nonemptymodelcells analogue)
    elem = (model.elem_abund if model.elem_abund is not None
            else np.zeros((nmodel, MAX_Z_ABUND)))

    g = Grid(
        grid_type=grid_type, ncoordgrid=ncoordgrid, ngrid=ngrid,
        nmodel=nmodel, cell_mgi=cell_mgi, pos_min=pos_min, wid=wid,
        vmax=vmax, rmax=rmax, tmin=tmin,
        rho_init=rho_init, rho=rho_init.copy(),
        ffegrp=np.asarray(model.ffegrp, dtype=np.float64),
        kappagrey=np.zeros(nmodel),
        Te=np.zeros(nmodel), TR=np.zeros(nmodel), TJ=np.zeros(nmodel),
        W=np.ones(nmodel), thick=np.zeros(nmodel, dtype=np.int32),
        nnetot=np.zeros(nmodel), nne=np.zeros(nmodel),
        elem_abund=np.asarray(elem, dtype=np.float64),
        vol_init=vol,
        elem_abund_init=np.asarray(elem, dtype=np.float64).copy(),
        init_energyq=(np.asarray(model.init_energyq, np.float64)
                      if getattr(model, "init_energyq", None) is not None
                      else None),
        init_ye=(np.asarray(model.init_ye, np.float64)
                 if getattr(model, "init_ye", None) is not None
                 else None),
        cell_outside=cell_outside,
    )
    g.mtot_input = float(np.sum(rho_init * vol))
    g.mfeg = float(np.sum(rho_init * vol * g.ffegrp))

    # critical density for opacity_case 3 (grid_init, grid.cc:2162-2168)
    g.rho_crit = (ME * CLIGHT * (56 * MH)
                  / (PI * QE * QE * cfg.rho_crit_para * 3000e-8 * tmin))

    calculate_kappagrey(g, cfg)
    calculate_electron_densities(g)
    return g


def calculate_kappagrey(g: Grid, cfg: SimConfig):
    """Grey opacity per cell [cm^2/g] for opacity cases 0-5
    (calculate_kappagrey, grid.cc:616-717)."""
    oc = cfg.opacity_case
    rho = g.rho_init
    fe = g.ffegrp
    pos = rho > 0

    if oc == 0:
        kappa = np.full_like(rho, cfg.grey_op)
    elif oc in (1, 4):
        kappa = ((0.9 * fe + 0.1) * cfg.grey_op
                 / (0.9 * g.mfeg / g.mtot_input + 0.1))
    elif oc == 2:
        # normalised so the density-weighted mean opacity is GREY_OP;
        # sums run over kept propagation cells (grid.cc opcase loops
        # skip the npts_model sentinel)
        kc = g.cell_keep
        rho_sum = float(np.sum(rho[g.cell_mgi[kc]]))
        fe_sum = float(np.sum(fe[g.cell_mgi[kc]]))
        nonempty = int(np.sum(rho[g.cell_mgi[kc]] > 0))
        opcase2_normal = (cfg.grey_op * rho_sum
                          / (0.9 * fe_sum + 0.1 * nonempty))
        with np.errstate(divide="ignore", invalid="ignore"):
            kappa = opcase2_normal / rho * (0.9 * fe + 0.1)
    elif oc == 3:
        k3 = 0.9 * fe + 0.1
        k3 = np.where(rho > g.rho_crit, k3 * g.rho_crit / np.maximum(rho, 1e-300), k3)
        kc = g.cell_keep
        rho_sum = float(np.sum(rho[g.cell_mgi[kc]]))
        opcase3_sum = float(np.sum((k3 * rho)[g.cell_mgi[kc]]))
        g.opcase3_normal = cfg.grey_op * rho_sum / max(opcase3_sum, 1e-300)
        kappa = k3 * g.opcase3_normal
    elif oc == 5:
        # electron-fraction-dependent kilonova opacities
        # (Tanaka et al. 2020 table 1; grid.cc:674-693). The reference
        # uses the model's initial electron fraction (cellYe column or
        # the Ye.txt override, read_possible_yefile grid.cc:528);
        # without one, fall back to the composition estimate.
        ye = g.elem_abund @ (np.arange(1, MAX_Z_ABUND + 1) / ATOMIC_WEIGHTS)
        ye = np.where(ye > 0, ye, 0.25)
        if getattr(g, "init_ye", None) is not None:
            ye = np.where(g.init_ye >= 0, g.init_ye, ye)
        kappa = np.select(
            [ye <= 0.1, ye <= 0.15, ye <= 0.2, ye <= 0.25, ye <= 0.3,
             ye <= 0.35],
            [19.5, 32.2, 22.3, 5.6, 5.36, 3.3], default=0.96)
    else:
        raise ValueError(f"unknown opacity case {oc}")

    g.kappagrey = np.where(pos, kappa, 0.0)


def calculate_electron_densities(g: Grid, elements_z=None):
    """Total (bound+free) electron density per cell
    (calculate_electron_densities, update_grid.cc:1660-1687; used for
    Compton scattering of gamma rays).

    ``elements_z``: when an atomic dataset is loaded, the reference
    counts nnetot over the MODEL-ATOM elements only (nnelement x Z for
    element in get_nelements(), update_grid.cc:1669-1674) — in
    r-process models where most mass sits in unmodelled Z > 30
    species this is far less than the all-matter value, and gamma-ray
    deposition follows it. Pass the dataset's Z list for parity."""
    zs = np.arange(1, MAX_Z_ABUND + 1)
    weights = zs / (ATOMIC_WEIGHTS * MH)
    if elements_z is not None:
        mask = np.zeros(MAX_Z_ABUND)
        for z in np.asarray(elements_z).ravel():
            if 1 <= int(z) <= MAX_Z_ABUND:
                mask[int(z) - 1] = 1.0
        per_gram = g.elem_abund @ (weights * mask)
    else:
        # n_e,tot = rho * sum_Z X_Z * Z / (A_Z * m_H); fall back to
        # Z/A ~ 0.5 matter if no composition is given
        per_gram = g.elem_abund @ weights
        per_gram = np.where(per_gram > 0, per_gram, 0.5 / MH)
    g.nnetot = g.rho * per_gram
    g.nne = g.nnetot  # refined by the plasma solver when enabled


def assign_initial_temperatures(g: Grid, dm: decay_mod.DecayModel,
                                tmid0: float, cfg: SimConfig):
    """Initial LTE temperatures from trapped decay energy
    (assign_initial_temperatures, grid.cc:1879-1929)."""
    endecay = dm.endecay_t0_to_time_withexpansion(tmid0)
    if cfg.use_model_initial_energy and g.init_energyq is not None:
        # model initial thermal energy adds to the trapped decay
        # energy budget (grid.cc:1901-1903)
        endecay = endecay + g.init_energyq
    T = (CLIGHT / 4.0 / STEBO * (g.tmin / tmid0) ** 3
         * g.rho_init * endecay) ** 0.25
    T = np.clip(np.where(np.isfinite(T), T, cfg.mintemp),
                cfg.mintemp, cfg.maxtemp)
    T = np.where(g.rho_init > 0, T, 0.0)
    g.Te = T.copy()
    g.TJ = T.copy()
    g.TR = T.copy()
    g.W = np.ones_like(T)
    g.thick = np.zeros(g.nmodel, dtype=np.int32)


# ---------------------------------------------------------------------------
# Device tables
# ---------------------------------------------------------------------------

def make_units(cfg: SimConfig, etot: float) -> Units:
    return Units(tmin=cfg.tmin, e0=etot / cfg.npkts)


def grid_device_tables(g: Grid, cfg: SimConfig, units: Units,
                       jnp=None, levelpops=None, kff_base=None) -> dict:
    """Pack per-cell state into device arrays in simulation units.

    Returned dict (all arrays have an extra trailing "empty cell" slot
    at index nmodel, mirroring the reference's empty-cell sentinel):

      cell_mgi        [ngrid] int32
      pos_min         [ngrid, ndim] f32 (sim length at tmin)
      wid             [ngrid] f32
      chi_grey        [nmodel+1] grey opacity kappa*rho [per sim length]
      nnetot_sig      [nmodel+1] sigma_T * nnetot [per sim length]
      rho             [nmodel+1] density [g/cm^3] (CGS; used by gamma
                      photoelectric/pair-production fits)
      ffegrp, Te, thick, ...
    """
    import jax.numpy as jnp_mod
    jnp = jnp or jnp_mod
    f = lambda x: jnp.asarray(x, dtype=jnp.float32)

    def padded(x, fill=0.0):
        return np.concatenate([np.asarray(x, dtype=np.float64),
                               [fill]]).astype(np.float32)

    x_unit = units.x_unit
    chi_grey = g.kappagrey * g.rho * x_unit  # optical depth per sim length
    from .constants import SIGMA_T
    nnetot_sig = SIGMA_T * g.nnetot * x_unit

    # empty (rho == 0) cells map to the sentinel row nmodel on device:
    # the kernel free-streams there (is_empty) and estimator
    # scatter-adds land in the dummy slot, as in the reference where
    # empty propagation cells have no associated model cell
    # (grid.cc get_propcell_modelgridindex / npts_model sentinel)
    cell_mgi_dev = np.where(g.cell_keep, g.cell_mgi,
                            g.nmodel).astype(np.int32)

    tables = {
        "cell_mgi": jnp.asarray(cell_mgi_dev, dtype=jnp.int32),
        "pos_min": f(g.pos_min / x_unit),
        "wid": f(g.wid / x_unit),
        "chi_grey": jnp.asarray(padded(chi_grey)),
        "nnetot_sig": jnp.asarray(padded(nnetot_sig)),
        "rho": jnp.asarray(padded(g.rho)),
        "ffegrp": jnp.asarray(padded(g.ffegrp)),
        "Te": jnp.asarray(padded(g.Te)),
        "thick": jnp.asarray(
            np.concatenate([g.thick, [1]]).astype(np.int32)),
        "rmax": jnp.float32(g.rmax / x_unit),
        "vmax": jnp.float32(g.vmax / CLIGHT),
        # detailed (opacity_case 4) transport tables; dummies in grey
        # mode so the pytree structure is stable
        "chi_thomson": jnp.asarray(padded(SIGMA_T * g.nne * x_unit)),
        "kff_base": jnp.asarray(
            padded(kff_base if kff_base is not None
                   else np.zeros(g.nmodel))),
        "levelpops": (jnp.asarray(
            np.concatenate([levelpops,
                            np.zeros((1, levelpops.shape[1]))],
                           axis=0), dtype=jnp.float32)
            if levelpops is not None
            else jnp.zeros((g.nmodel + 1, 1), jnp.float32)),
        # macro-atom tables (replaced by plasma/macroatom.py builds in
        # detailed mode; dummy shapes keep the pytree stable)
        "ma_proc_cum": jnp.zeros((g.nmodel + 1, 1, 4), jnp.float32),
        "kp_cool_ff": jnp.asarray(
            padded(getattr(g, "cool_ff", np.zeros(g.nmodel)))),
        "kp_w_collexc": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "kp_w_fb": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "kp_w_collion": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "chi_bf": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "bf_sel_cum": jnp.zeros((g.nmodel + 1, 1, 1), jnp.float32),
        "nt_frac_ion": jnp.zeros(g.nmodel + 1, jnp.float32),
        "nt_ion_cum": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "ma_w_raddeexc": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "ma_w_downsame": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
        "ma_w_upsame": jnp.zeros((g.nmodel + 1, 1), jnp.float32),
    }
    return tables
