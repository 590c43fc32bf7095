"""Rank-distributed grid solve (the reference's update_grid split).

The reference assigns each MPI rank a contiguous range of non-empty
model cells (setup_nstart_ndo, grid.cc:1931-1998), has every rank run
the plasma solves — NLTE populations, Spencer-Fano, thermal balance —
for its own cells only, and allgathers the per-cell results afterwards
(sn3d.cc:191-314, 951-964).

artis_tpu's plasma solvers are batched numpy over a leading [ncells]
axis, so the same decomposition is a row split: every per-cell input
is sliced to the rank's owned range, the solver runs on the slice, and
the slices concatenate back into the global array (the allgather).
Because every solver is row-independent (no cross-cell coupling — the
per-cell fallbacks and singular-matrix handling are local too), the
sharded result is BITWISE equal to the full-batch solve; this is
pinned by tests/test_plasma_sharded.py.

In this single-process environment the ranges run sequentially, so
the interesting measurement is the per-range wall (what one rank of D
would pay, ~1/D of the total — tools/bench_plasma_solve.py --ranks).
On a real multi-host TPU deployment each host executes exactly one
range; the DD driver reuses the transport decomposition's cell ranges
(domain.plan_decomposition) so transport tables and plasma state
share one ownership map.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional, Sequence

import numpy as np


# Struct fields that are replicated (not per-cell) even if their
# leading dimension coincidentally equals ncells — e.g. a DD run on an
# nmodel == nbins+1 grid must never slice the radfield frequency
# edges, or Jnu lookups would silently read shifted bins.
_REPLICATED_FIELDS = frozenset({"nu_edges"})


def _slice_rows(obj, sl: slice, ncells: int, name: str = ""):
    """Return ``obj`` with every per-cell array row-sliced.

    Per-cell = a numpy array whose leading dimension equals
    ``ncells`` and whose field name is not in ``_REPLICATED_FIELDS``.
    Handles plain arrays, dataclass structs (PhotoionRates, the
    radfield fit structs), dicts, and tuples/lists; scalars and
    non-matching arrays pass through unchanged (they are replicated
    inputs, e.g. atomic tables)."""
    if obj is None:
        return None
    if isinstance(obj, np.ndarray):
        if (obj.ndim >= 1 and obj.shape[0] == ncells
                and name not in _REPLICATED_FIELDS):
            return obj[sl]
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{
            f.name: _slice_rows(getattr(obj, f.name), sl, ncells,
                                f.name)
            for f in dataclasses.fields(obj)
            if isinstance(getattr(obj, f.name), np.ndarray)})
    if isinstance(obj, dict):
        return {k: _slice_rows(v, sl, ncells, k)
                for k, v in obj.items()}
    if isinstance(obj, (tuple, list)):
        t = type(obj)
        return t(_slice_rows(v, sl, ncells) for v in obj)
    return obj


def ranges_from_starts(starts: Sequence[int]) -> list[slice]:
    return [slice(int(starts[d]), int(starts[d + 1]))
            for d in range(len(starts) - 1)
            if int(starts[d + 1]) > int(starts[d])]


def run_ranges(fn: Callable, slices: Sequence[slice], workers: int = 1,
               timings: Optional[list] = None) -> list:
    """Execute ``fn(sl)`` for every range, optionally concurrently.

    With ``workers > 1`` the ranges run on a thread pool — the
    single-host stand-in for the reference's one-rank-per-range MPI
    execution (sn3d.cc:951-964).  Threads (not processes) because the
    heavy work inside every solve releases the GIL: LAPACK
    gesv/trtrs, BLAS GEMMs and large-array numpy ufuncs all drop it,
    so ranges overlap on separate cores without forking a process
    that holds a live TPU client.  Results come back in range order;
    per-range walls append to ``timings``."""
    if workers <= 1 or len(slices) <= 1:
        out = []
        for sl in slices:
            t0 = time.perf_counter()
            out.append(fn(sl))
            if timings is not None:
                timings.append(time.perf_counter() - t0)
        return out

    from concurrent.futures import ThreadPoolExecutor

    walls = [0.0] * len(slices)

    def timed(i, sl):
        t0 = time.perf_counter()
        r = fn(sl)
        walls[i] = time.perf_counter() - t0
        return r

    with ThreadPoolExecutor(max_workers=min(workers,
                                            len(slices))) as ex:
        out = list(ex.map(timed, range(len(slices)), slices))
    if timings is not None:
        timings.extend(walls)
    return out


def solve_nlte_pops_sharded(starts: Sequence[int], ad, ph, pirates,
                            levelpops: np.ndarray,
                            elem_numberdens: np.ndarray,
                            Te, TR, W, nne, t_mid: float,
                            radfield=None,
                            nt_ion_rate_ion=None,
                            nt_auger_prob=None, jb_lu=None,
                            timings: Optional[list] = None,
                            workers: int = 1) -> np.ndarray:
    """Rank-distributed solve_nlte_pops: each range in ``starts`` is
    one rank's owned cells (solve_nlte_pops_element over nstart..ndo,
    nltepop.cc:798 + grid.cc:1931-1998); the concatenation of the
    per-range results is the allgather.  Row-independent, so bitwise
    equal to the full-batch call."""
    from . import nltepop as nltepop_mod

    ncells = levelpops.shape[0]
    out = np.empty((ncells, levelpops.shape[1]), np.float64)

    # jb_lu = (selected line ids [nsel], values [ncells, nsel]):
    # only the values are per-cell
    def solve_range(sl):
        jb = None
        if jb_lu is not None:
            jb = (jb_lu[0], _slice_rows(jb_lu[1], sl, ncells))
        return sl, nltepop_mod.solve_nlte_pops(
            ad, ph, _slice_rows(pirates, sl, ncells),
            np.ascontiguousarray(levelpops[sl]),
            _slice_rows(elem_numberdens, sl, ncells),
            _slice_rows(np.asarray(Te), sl, ncells),
            _slice_rows(np.asarray(TR), sl, ncells),
            _slice_rows(np.asarray(W), sl, ncells),
            _slice_rows(np.asarray(nne), sl, ncells), t_mid,
            radfield=_slice_rows(radfield, sl, ncells),
            nt_ion_rate_ion=_slice_rows(nt_ion_rate_ion, sl, ncells),
            nt_auger_prob=_slice_rows(nt_auger_prob, sl, ncells),
            jb_lu=jb)

    for sl, res in run_ranges(solve_range, ranges_from_starts(starts),
                              workers, timings):
        out[sl] = res
    return out


def solve_sf_sharded(sf_solver, starts: Sequence[int],
                     nne: np.ndarray, levelpops: np.ndarray,
                     ion_numberdens: np.ndarray,
                     timings: Optional[list] = None,
                     workers: int = 1,
                     timestep: Optional[int] = None,
                     max_ts_between_solutions: int = 0,
                     max_fracdiff_nneperion: float = 0.05):
    """Rank-distributed Spencer-Fano solve (solve_spencerfano over the
    rank's nstart..ndo cells, sn3d.cc:951-964) with the full-batch
    solution-reuse gate applied first (nonthermal.cc:2559-2581): cells
    passing the gate keep the previous solution; the fresh solves are
    split over the ranges (optionally on a thread pool) and merged.
    The merged full-batch solution is committed to the solver's reuse
    state, so alternating sharded and full-batch calls is safe.
    Returns one SFSolution over all cells."""
    ncells = len(nne)
    nne = np.asarray(nne)
    ion_numberdens = np.asarray(ion_numberdens)
    nneperion = sf_solver.nneperion(nne, ion_numberdens)
    reuse = sf_solver.reuse_mask(nneperion, timestep,
                                 max_ts_between_solutions,
                                 max_fracdiff_nneperion)

    # reused cells skip the fresh solve entirely: nne <= 0 short-
    # circuits to the trivial solution inside solve(), and their rows
    # are overwritten from the previous solution below
    nne_fresh = np.where(reuse, 0.0, nne)

    def solve_range(sl):
        return sf_solver.solve(
            nne_fresh[sl], np.ascontiguousarray(levelpops[sl]),
            _slice_rows(ion_numberdens, sl, ncells))

    parts = run_ranges(solve_range, ranges_from_starts(starts),
                       workers, timings)
    first = parts[0]
    merged = {}
    for f in dataclasses.fields(first):
        vals = [getattr(p, f.name) for p in parts]
        if (isinstance(vals[0], np.ndarray) and vals[0].ndim >= 1
                and sum(v.shape[0] for v in vals) == ncells):
            merged[f.name] = np.concatenate(vals, axis=0)
        else:
            merged[f.name] = vals[0]
    sol = type(first)(**merged)
    if reuse.any():
        last = sf_solver._last
        for name in ("frac_heating", "frac_ionization",
                     "frac_excitation", "exc_frac", "ion_rate_per_dep",
                     "prob_num_auger", "ionenfrac_num_auger"):
            getattr(sol, name)[reuse] = getattr(last, name)[reuse]
    sf_solver.commit(sol, nneperion, ~reuse, timestep)
    return sol


def solve_te_sharded(starts: Sequence[int], solve_fn: Callable,
                     ncells: int, per_cell: dict, replicated: dict,
                     timings: Optional[list] = None,
                     workers: int = 1) -> np.ndarray:
    """Rank-distributed thermal balance: ``solve_fn`` is called per
    owned range with ``per_cell`` kwargs row-sliced (arrays AND
    structs like the binned-radfield fit) and ``replicated`` kwargs
    passed through (solve_Te over nstart..ndo, thermalbalance.cc +
    sn3d.cc:951-964)."""
    def solve_range(sl):
        kw = {k: _slice_rows(v, sl, ncells)
              for k, v in per_cell.items()}
        return np.asarray(solve_fn(**kw, **replicated))

    chunks = run_ranges(solve_range, ranges_from_starts(starts),
                        workers, timings)
    return np.concatenate(chunks, axis=0)
