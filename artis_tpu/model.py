"""Ejecta model container and readers.

Rebuild of the reference's model input layer
(reference: grid.cc:1080-1735 ``read_ejecta_model`` and friends).
The model is a host-side numpy container; ``grid.py`` maps it onto the
propagation grid and produces packed device tables.

Supported inputs:
* reference-format 1D ``model.txt`` (read_1d_model, grid.cc:1228-1360)
* reference-format 3D ``model.txt`` (read_3d_model, grid.cc:1437-1601)
* reference-format ``abundances.txt`` (Z=1..30 mass fractions per cell)
* synthetic toy models for tests/benchmarks
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from .constants import DAY, MSUN
from .nucdata import ELSYMBOLS, NuclideTable

MAX_Z_ABUND = 30  # abundances.txt covers H..Zn (Z=1..30)


def _noncomment_lines(path: str):
    with open(path) as f:
        for line in f:
            s = line.strip()
            if s and not s.startswith("#"):
                yield s


def _parse_headerline(line: str) -> tuple[list[int], list[int], list[str]]:
    """Parse a model.txt column-name header like
    ``#index vel log_rho X_Fegroup X_Ni56 ... X_Sr89 cellYe`` into
    (zlist, alist, colnames) (read_model_headerline, grid.cc:1080-1130)."""
    names = line.lstrip("#").split()
    # drop the standard leading columns
    standard = {"index", "inputcellid", "velocity_outer", "vel_r_max_kmps",
                "logrho", "rho", "pos_x_min", "pos_y_min", "pos_z_min",
                "X_Fegroup", "X_Ni56", "X_Co56", "X_Fe52", "X_Cr48",
                "X_Ni57", "X_Co57", "vel", "log_rho"}
    zlist, alist, colnames = [], [], []
    for name in names:
        if name in standard:
            continue
        colnames.append(name)
        if name.startswith("X_") and name[2:3].isalpha():
            nucstr = name[2:]
            sym = "".join(c for c in nucstr if c.isalpha())
            astr = "".join(c for c in nucstr if c.isdigit())
            if astr and sym in ELSYMBOLS:
                zlist.append(ELSYMBOLS.index(sym))
                alist.append(int(astr))
                continue
        zlist.append(-1)
        alist.append(-1)
    return zlist, alist, colnames


@dataclasses.dataclass
class Model:
    """Ejecta snapshot at time ``t_model``.

    ``initradioabund`` holds mass fractions for every nuclide in
    ``nuclide_table`` (column order = table order). ``elem_abund``
    holds elemental mass fractions for Z=1..MAX_Z_ABUND.
    """
    ndim: int
    t_model: float  # [s]
    vmax: float  # [cm/s] outermost ejecta velocity (per axis for 3D)
    rho: np.ndarray  # [ncells] density at t=tmin [g/cm^3]
    ffegrp: np.ndarray  # [ncells] Fe-group mass fraction
    initradioabund: np.ndarray  # [ncells, n_nuclides]
    nuclide_table: NuclideTable
    elem_abund: Optional[np.ndarray] = None  # [ncells, MAX_Z_ABUND]
    vout: Optional[np.ndarray] = None  # 1D: outer shell velocities [cm/s]
    ncoord3d: Optional[tuple[int, int, int]] = None  # 3D model grid shape
    ncoord2d: Optional[tuple[int, int]] = None  # 2D (nr, nz) model shape
    init_ye: Optional[np.ndarray] = None  # [ncells] electron fraction
    init_energyq: Optional[np.ndarray] = None  # [ncells] initial energy/mass

    @property
    def ncells(self) -> int:
        return len(self.rho)

    def scale_rho_to_tmin(self, tmin: float):
        """Model densities are given at t_model; homologous expansion
        scales them to the simulation start (grid.cc:1302)."""
        factor = (self.t_model / tmin) ** 3
        self.rho = self.rho * factor


def read_1d_model(path: str, tmin: float,
                  data_path: Optional[str] = None) -> Model:
    """Read a reference-format 1D spherical model.txt
    (read_1d_model, grid.cc:1228-1360)."""
    lines = list(_noncomment_lines(path))
    npts = int(lines[0])
    t_model = float(lines[1]) * DAY

    # optional header line with custom nuclide columns
    with open(path) as f:
        raw = [ln.strip() for ln in f if ln.strip()]
    header = None
    seen_noncomment = 0
    for ln in raw:
        if ln.startswith("#"):
            if seen_noncomment == 2:
                header = ln
                break
            continue
        seen_noncomment += 1
        if seen_noncomment > 2:
            break
    zlist: list[int] = []
    alist: list[int] = []
    colnames: list[str] = []
    if header:
        zlist, alist, colnames = _parse_headerline(header)

    nt = NuclideTable.create(zlist, alist, data_path=data_path)

    vout = np.zeros(npts)
    rho_tmin = np.zeros(npts)
    ffegrp = np.zeros(npts)
    abund = np.zeros((npts, len(nt)))
    init_ye = np.full(npts, -1.0)
    init_q = np.zeros(npts)
    rows = lines[2:2 + npts]
    assert len(rows) == npts, f"model.txt: expected {npts} rows"

    def setab(mgi, z, a, val):
        if nt.exists(z, a):
            abund[mgi, nt.index(z, a)] = val

    for mgi, row in enumerate(rows):
        vals = row.split()
        assert int(vals[0]) == mgi + 1
        vout[mgi] = float(vals[1]) * 1e5  # km/s -> cm/s
        rho_t = 10.0 ** float(vals[2])
        rho_tmin[mgi] = rho_t * (t_model / tmin) ** 3
        ffegrp[mgi] = float(vals[3])
        f56ni, f56co, f52fe, f48cr = (float(v) for v in vals[4:8])
        setab(mgi, 28, 56, f56ni)
        setab(mgi, 27, 56, f56co)
        setab(mgi, 26, 52, f52fe)
        setab(mgi, 24, 48, f48cr)
        rest = vals[8:]
        if len(rest) >= 2 and not zlist:
            setab(mgi, 28, 57, float(rest[0]))
            setab(mgi, 27, 57, float(rest[1]))
        elif zlist:
            if len(rest) >= 2:
                setab(mgi, 28, 57, float(rest[0]))
                setab(mgi, 27, 57, float(rest[1]))
                custom_vals = rest[2:]
            else:
                custom_vals = rest
            for name, (z, a), v in zip(colnames, zip(zlist, alist),
                                       custom_vals):
                if z > 0:
                    setab(mgi, z, a, float(v))
                elif name == "cellYe":
                    init_ye[mgi] = float(v)
                elif name == "q":
                    # initial thermal energy per mass, rescaled from
                    # t_model to tmin (grid.cc:1206-1208)
                    init_q[mgi] = float(v) * t_model / tmin

    return Model(ndim=1, t_model=t_model, vmax=float(vout[-1]),
                 rho=rho_tmin, ffegrp=ffegrp, initradioabund=abund,
                 nuclide_table=nt, vout=vout,
                 init_ye=init_ye if np.any(init_ye >= 0) else None,
                 init_energyq=init_q if np.any(init_q != 0) else None)


def _find_headerline(path: str, after_noncomment: int) -> Optional[str]:
    """Return the comment header line that follows the first
    ``after_noncomment`` non-comment lines, if present."""
    seen = 0
    with open(path) as f:
        for ln in f:
            s = ln.strip()
            if not s:
                continue
            if s.startswith("#"):
                if seen == after_noncomment:
                    return s
                continue
            seen += 1
            if seen > after_noncomment:
                return None
    return None


def _apply_abund_row(vals: list[float], mgi: int, abund: np.ndarray,
                     ffegrp: np.ndarray, init_ye: np.ndarray,
                     init_q: np.ndarray, nt: NuclideTable,
                     zlist, alist, colnames, t_model: float, tmin: float):
    """Apply one model.txt abundance row: the 5/7 standard columns plus
    any custom header columns (read_2d3d_modelradioabundanceline,
    grid.cc:1158-1225)."""
    ffegrp[mgi] = vals[0]
    std = [(28, 56), (27, 56), (26, 52), (24, 48), (28, 57), (27, 57)]
    for (z, a), v in zip(std, vals[1:7]):
        if nt.exists(z, a):
            abund[mgi, nt.index(z, a)] = v
    custom = vals[7:]
    for i, name in enumerate(colnames):
        if i >= len(custom):
            break
        v = custom[i]
        z, a = zlist[i], alist[i]
        if z > 0:
            if nt.exists(z, a):
                abund[mgi, nt.index(z, a)] = v
        elif name == "cellYe":
            init_ye[mgi] = v
        elif name == "q":
            # stored per unit mass at t_model; adiabatic expansion to
            # tmin (grid.cc:1206-1208)
            init_q[mgi] = v * t_model / tmin


def read_3d_model(path: str, tmin: float,
                  data_path: Optional[str] = None) -> Model:
    """Read a reference-format 3D Cartesian model.txt
    (read_3d_model, grid.cc:1459-1601).

    Layout: npts / t_model_days / vmax_cms, then per cell TWO lines:
    ``index x y z rho`` (positions at t_model, xyz or zyx order) and
    the abundance row. Cell index increments x fastest."""
    lines = list(_noncomment_lines(path))
    npts = int(lines[0].split()[0])
    nc = round(npts ** (1.0 / 3.0))
    assert nc ** 3 == npts, f"3D model npts {npts} is not a cube"
    t_model = float(lines[1].split()[0]) * DAY
    vmax = float(lines[2].split()[0])

    header = _find_headerline(path, after_noncomment=3)
    zlist, alist, colnames = ([], [], [])
    if header:
        zlist, alist, colnames = _parse_headerline(header)
    nt = NuclideTable.create(zlist, alist, data_path=data_path)

    rows = lines[3:]
    assert len(rows) >= 2 * npts, "3D model.txt: missing cell rows"
    rho_tmin = np.zeros(npts)
    ffegrp = np.zeros(npts)
    abund = np.zeros((npts, len(nt)))
    init_ye = np.full(npts, -1.0)
    init_q = np.zeros(npts)

    xmax = vmax * t_model
    cw = 2 * xmax / nc
    posmatch_xyz = True
    posmatch_zyx = True
    for mgi in range(npts):
        a_vals = rows[2 * mgi].split()
        assert int(a_vals[0]) == mgi + 1, "3D model.txt: bad cell index"
        pos_in = [float(v) for v in a_vals[1:4]]
        rho_model = float(a_vals[4])
        # expected position with x fastest (grid.cc:1545-1556); accept
        # either xyz or zyx column order like the reference
        exp = [-xmax + cw * ((mgi // nc ** ax) % nc) for ax in range(3)]
        for ax in range(3):
            if abs(exp[ax] - pos_in[ax]) > 0.5 * cw:
                posmatch_xyz = False
            if abs(exp[ax] - pos_in[2 - ax]) > 0.5 * cw:
                posmatch_zyx = False
        assert rho_model >= 0
        rho_tmin[mgi] = rho_model * (t_model / tmin) ** 3
        b_vals = [float(v) for v in rows[2 * mgi + 1].split()]
        if rho_model > 0:
            _apply_abund_row(b_vals, mgi, abund, ffegrp, init_ye, init_q,
                             nt, zlist, alist, colnames, t_model, tmin)
    assert posmatch_xyz or posmatch_zyx, \
        "3D model.txt cell positions inconsistent with the index order"

    return Model(ndim=3, t_model=t_model, vmax=vmax, rho=rho_tmin,
                 ffegrp=ffegrp, initradioabund=abund, nuclide_table=nt,
                 ncoord3d=(nc, nc, nc),
                 init_ye=init_ye if np.any(init_ye >= 0) else None,
                 init_energyq=init_q if np.any(init_q != 0) else None)


def read_2d_model(path: str, tmin: float,
                  data_path: Optional[str] = None) -> Model:
    """Read a reference-format 2D axisymmetric (r_cyl, z) model.txt
    (read_2d_model, grid.cc:1372-1457).

    Layout: ``nr nz`` / t_model_days / vmax_cms, then per cell TWO
    lines: ``index r_mid z_mid rho`` and the abundance row; cell index
    increments r fastest. Use :func:`model_2d_to_3d` to map onto the
    Cartesian propagation grid."""
    lines = list(_noncomment_lines(path))
    nr, nz = (int(v) for v in lines[0].split()[:2])
    npts = nr * nz
    t_model = float(lines[1].split()[0]) * DAY
    vmax = float(lines[2].split()[0])

    header = _find_headerline(path, after_noncomment=3)
    zlist, alist, colnames = ([], [], [])
    if header:
        zlist, alist, colnames = _parse_headerline(header)
    nt = NuclideTable.create(zlist, alist, data_path=data_path)

    rows = lines[3:]
    assert len(rows) >= 2 * npts, "2D model.txt: missing cell rows"
    rho_tmin = np.zeros(npts)
    ffegrp = np.zeros(npts)
    abund = np.zeros((npts, len(nt)))
    init_ye = np.full(npts, -1.0)
    init_q = np.zeros(npts)
    for mgi in range(npts):
        a_vals = rows[2 * mgi].split()
        assert int(a_vals[0]) == mgi + 1, "2D model.txt: bad cell index"
        rho_model = float(a_vals[3])
        rho_tmin[mgi] = rho_model * (t_model / tmin) ** 3
        b_vals = [float(v) for v in rows[2 * mgi + 1].split()]
        if rho_model > 0:
            _apply_abund_row(b_vals, mgi, abund, ffegrp, init_ye, init_q,
                             nt, zlist, alist, colnames, t_model, tmin)

    return Model(ndim=2, t_model=t_model, vmax=vmax, rho=rho_tmin,
                 ffegrp=ffegrp, initradioabund=abund, nuclide_table=nt,
                 ncoord2d=(nr, nz),
                 init_ye=init_ye if np.any(init_ye >= 0) else None,
                 init_energyq=init_q if np.any(init_q != 0) else None)


def model_2d_to_3d(m: Model, ncoord: int = 50) -> Model:
    """Map a 2D axisymmetric model onto a 3D Cartesian cube by
    nearest-cell sampling in (r_cyl, z).

    The reference propagates 2D models on a cylindrical grid
    (grid.cc GRID_CYLINDRICAL2D); here the propagation grid is the
    TPU-friendly uniform cube, so the axisymmetric state is rotated
    into 3D. Mass is conserved per sampled cell by construction of the
    homologous density field."""
    assert m.ndim == 2 and m.ncoord2d is not None
    nr, nz = m.ncoord2d
    axis = ((np.arange(ncoord) + 0.5) / ncoord * 2 - 1) * m.vmax
    X, Y, Z = np.meshgrid(axis, axis, axis, indexing="ij")
    # cell ordering: x fastest (uniform_grid_setup, grid.cc:2083-2101)
    Xf = X.transpose(2, 1, 0).ravel()
    Yf = Y.transpose(2, 1, 0).ravel()
    Zf = Z.transpose(2, 1, 0).ravel()
    r_cyl = np.sqrt(Xf ** 2 + Yf ** 2)
    ir = np.clip((r_cyl / m.vmax * nr).astype(int), 0, nr - 1)
    iz = np.clip(((Zf + m.vmax) / (2 * m.vmax) * nz).astype(int),
                 0, nz - 1)
    src = iz * nr + ir
    outside = (r_cyl > m.vmax) | (np.abs(Zf) > m.vmax)
    rho = np.where(outside, 0.0, m.rho[src])
    n3 = ncoord ** 3
    abund = np.where(outside[:, None], 0.0, m.initradioabund[src])
    ffegrp = np.where(outside, 0.0, m.ffegrp[src])
    ye = (np.where(outside, -1.0, m.init_ye[src])
          if m.init_ye is not None else None)
    q = (np.where(outside, 0.0, m.init_energyq[src])
         if m.init_energyq is not None else None)
    elem = (np.where(outside[:, None], 0.0, m.elem_abund[src])
            if m.elem_abund is not None else None)
    assert len(rho) == n3
    return Model(ndim=3, t_model=m.t_model, vmax=m.vmax, rho=rho,
                 ffegrp=ffegrp, initradioabund=abund,
                 nuclide_table=m.nuclide_table, elem_abund=elem,
                 ncoord3d=(ncoord, ncoord, ncoord), init_ye=ye,
                 init_energyq=q)


def read_abundances(path: str, ncells: int,
                    normalise: bool = True) -> np.ndarray:
    """Read abundances.txt: per-cell elemental mass fractions
    (abundances_read, grid.cc:1007-1079). Returns [ncells, 30].

    The file may carry MORE than 30 element columns (kilonova
    r-process compositions go to Z ~ 110; the reference reads up to
    150, grid.cc:1040-1049) — each row is normalised by the sum over
    ALL of its columns, then truncated to Z <= 30. Truncate-then-
    normalise would inflate the Fe-group fractions by 1/sum(Z<=30)
    (15-500x in r-process ejecta). ``normalise=False`` matches the
    reference's 3D-model behaviour (normfactor = 1, grid.cc:1052).

    Uses the native bulk parser (native/fastparse.c) when available —
    3D models have up to ~1e6 rows."""
    from .native import load_numbers
    nums = load_numbers(path)

    def finish(out, rowsum):
        if normalise:
            out = np.where(rowsum > 0, out / np.maximum(rowsum, 1e-300),
                           out)
        return out

    # fast path: uniform column count
    nrows_guess = max(ncells, 1)
    if len(nums) % nrows_guess == 0:
        ncols = len(nums) // nrows_guess
        if ncols >= 2:
            table = nums.reshape(-1, ncols)
            ids = table[:, 0]
            if np.array_equal(ids, np.arange(1, len(ids) + 1)):
                out = np.zeros((ncells, MAX_Z_ABUND))
                nz = min(MAX_Z_ABUND, ncols - 1)
                out[:, :nz] = table[:ncells, 1:1 + nz]
                rowsum = table[:ncells, 1:].sum(axis=1, keepdims=True)
                return finish(out, rowsum)
    # line-based parse (ragged or mismatched files)
    out = np.zeros((ncells, MAX_Z_ABUND))
    rowsum = np.zeros((ncells, 1))
    i = -1
    for i, line in enumerate(_noncomment_lines(path)):
        vals = line.split()
        mgi = int(vals[0]) - 1
        if not 0 <= mgi < ncells:
            continue
        row = np.array([float(v) for v in vals[1:]])
        n = min(len(row), MAX_Z_ABUND)
        out[mgi, :n] = row[:n]
        rowsum[mgi, 0] = row.sum()
    assert i + 1 >= ncells
    return finish(out, rowsum)


def make_toy_1d_model(nshells: int = 32, vmax: float = 2.5e9,
                      mtot_msun: float = 1.0, mni56_msun: float = 0.5,
                      t_model_days: float = 1.0, tmin: float = 3.0 * DAY,
                      data_path: Optional[str] = None) -> Model:
    """Synthetic W7-like 1D model for tests and benchmarks: exponential
    density profile, Ni56 concentrated in the inner half."""
    nt = NuclideTable.create(data_path=data_path)
    t_model = t_model_days * DAY
    vout = vmax * (np.arange(1, nshells + 1) / nshells)
    vin = np.concatenate([[0.0], vout[:-1]])
    vmid = 0.5 * (vin + vout)

    # exponential in velocity: rho ~ exp(-v/ve)
    ve = vmax / 4.0
    rho_shape = np.exp(-vmid / ve)
    vol_tmodel = 4.0 / 3.0 * np.pi * ((vout * t_model) ** 3
                                      - (vin * t_model) ** 3)
    mass_shape = rho_shape * vol_tmodel
    rho_tmodel = rho_shape * (mtot_msun * MSUN / mass_shape.sum())
    rho_tmin = rho_tmodel * (t_model / tmin) ** 3

    # Ni56 inside ~ half the mass
    xni = np.where(vmid < 0.55 * vmax, 1.0, 0.05)
    mass = rho_tmodel * vol_tmodel
    xni = xni * (mni56_msun * MSUN / np.sum(xni * mass))
    xni = np.clip(xni, 0.0, 0.95)

    abund = np.zeros((nshells, len(nt)))
    abund[:, nt.index(28, 56)] = xni
    ffegrp = np.clip(xni + 0.1, 0.0, 1.0)

    elem = np.zeros((nshells, MAX_Z_ABUND))
    elem[:, 28 - 1] = xni  # Ni
    elem[:, 26 - 1] = np.clip(ffegrp - xni, 0, 1)  # Fe
    elem[:, 14 - 1] = np.clip(1.0 - ffegrp, 0, 1)  # Si for the rest

    return Model(ndim=1, t_model=t_model, vmax=float(vmax), rho=rho_tmin,
                 ffegrp=ffegrp, initradioabund=abund, nuclide_table=nt,
                 elem_abund=elem, vout=vout)


def make_toy_3d_model(ncoord: int = 16, vmax: float = 2.5e9,
                      mtot_msun: float = 1.0, mni56_msun: float = 0.5,
                      t_model_days: float = 1.0, tmin: float = 3.0 * DAY,
                      data_path: Optional[str] = None) -> Model:
    """Synthetic spherically-symmetric 3D model on a uniform cube."""
    nt = NuclideTable.create(data_path=data_path)
    t_model = t_model_days * DAY
    axis = (np.arange(ncoord) + 0.5) / ncoord * 2 - 1  # cell centres [-1,1]
    X, Y, Z = np.meshgrid(axis, axis, axis, indexing="ij")
    # cell ordering: x fastest (uniform_grid_setup, grid.cc:2083-2101)
    vfrac = np.sqrt(X**2 + Y**2 + Z**2).transpose(2, 1, 0).ravel()
    vmid = vfrac * vmax

    inside = vfrac <= 1.0
    ve = vmax / 4.0
    rho_shape = np.where(inside, np.exp(-vmid / ve), 0.0)
    cellvol = (2 * vmax * t_model / ncoord) ** 3
    rho_tmodel = rho_shape * (mtot_msun * MSUN
                              / max(np.sum(rho_shape * cellvol), 1e-300))
    rho_tmin = rho_tmodel * (t_model / tmin) ** 3

    xni = np.where(inside & (vmid < 0.55 * vmax), 1.0, 0.05) * inside
    mass = rho_tmodel * cellvol
    denom = np.sum(xni * mass)
    if denom > 0:
        xni = np.clip(xni * (mni56_msun * MSUN / denom), 0.0, 0.95)
    ffegrp = np.clip(xni + 0.1, 0.0, 1.0) * inside

    n = ncoord ** 3
    abund = np.zeros((n, len(nt)))
    abund[:, nt.index(28, 56)] = xni
    elem = np.zeros((n, MAX_Z_ABUND))
    elem[:, 28 - 1] = xni
    elem[:, 26 - 1] = np.clip(ffegrp - xni, 0, 1)
    elem[:, 14 - 1] = np.where(inside, np.clip(1.0 - ffegrp, 0, 1), 0.0)

    return Model(ndim=3, t_model=t_model, vmax=float(vmax), rho=rho_tmin,
                 ffegrp=ffegrp, initradioabund=abund, nuclide_table=nt,
                 elem_abund=elem, ncoord3d=(ncoord, ncoord, ncoord))


def read_ye_file(path: str, nmodel: int) -> np.ndarray:
    """Ye.txt: per-cell initial electron fraction override
    (read_possible_yefile, grid.cc:528-553). Format: first line =
    row count, then ``mgi+1  Ye`` rows; out-of-range rows ignored.
    Returns a [nmodel] array with -1 where no value was given."""
    ye = np.full(nmodel, -1.0)
    with open(path) as f:
        n = int(f.readline().split()[0])
        for _ in range(n):
            parts = f.readline().split()
            if len(parts) < 2:
                continue
            mgi = int(parts[0]) - 1
            if 0 <= mgi < nmodel:
                ye[mgi] = float(parts[1])
    return ye


def apply_ye_file(model: Model, path: str) -> None:
    """Apply a Ye.txt override onto ``model.init_ye`` (cells without a
    row keep the model-file value)."""
    ye = read_ye_file(path, model.ncells)
    base = (model.init_ye if model.init_ye is not None
            else np.full(model.ncells, -1.0))
    model.init_ye = np.where(ye >= 0, ye, base)


def read_gridcontributions(path: str):
    """gridcontributions.txt: SPH/trajectory particle -> model cell
    mass-fraction contributions shipped with kilonova models (present
    in the reference's kilonova test data; consumed by its artistools
    preprocessing rather than sn3d itself). Returns a dict of column
    arrays: particleid, cellindex (1-based in file, converted to
    0-based), frac_of_cellmass, frac_of_cellmass_includemissing."""
    pid, cell, frac, fracm = [], [], [], []
    with open(path) as f:
        header = f.readline().split()
        ncols = len(header)
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            pid.append(int(parts[0]))
            cell.append(int(parts[1]) - 1)
            frac.append(float(parts[2]))
            fracm.append(float(parts[3]) if ncols > 3
                         and len(parts) > 3 else float(parts[2]))
    return {
        "particleid": np.asarray(pid, np.int64),
        "cellindex": np.asarray(cell, np.int64),
        "frac_of_cellmass": np.asarray(frac),
        "frac_of_cellmass_includemissing": np.asarray(fracm),
    }
