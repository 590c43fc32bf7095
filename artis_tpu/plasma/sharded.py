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


def _slice_rows(obj, sl: slice, ncells: int):
    """Return ``obj`` with every per-cell array row-sliced.

    Per-cell = a numpy array whose leading dimension equals
    ``ncells``.  Handles plain arrays, dataclass structs
    (PhotoionRates, the radfield fit structs), dicts, and
    tuples/lists; scalars and non-matching arrays pass through
    unchanged (they are replicated inputs, e.g. atomic tables)."""
    if obj is None:
        return None
    if isinstance(obj, np.ndarray):
        if obj.ndim >= 1 and obj.shape[0] == ncells:
            return obj[sl]
        return obj
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return dataclasses.replace(obj, **{
            f.name: _slice_rows(getattr(obj, f.name), sl, ncells)
            for f in dataclasses.fields(obj)
            if isinstance(getattr(obj, f.name), np.ndarray)})
    if isinstance(obj, dict):
        return {k: _slice_rows(v, sl, ncells) for k, v in obj.items()}
    if isinstance(obj, (tuple, list)):
        t = type(obj)
        return t(_slice_rows(v, sl, ncells) for v in obj)
    return obj


def ranges_from_starts(starts: Sequence[int]) -> list[slice]:
    return [slice(int(starts[d]), int(starts[d + 1]))
            for d in range(len(starts) - 1)
            if int(starts[d + 1]) > int(starts[d])]


def solve_nlte_pops_sharded(starts: Sequence[int], ad, ph, pirates,
                            levelpops: np.ndarray,
                            elem_numberdens: np.ndarray,
                            Te, TR, W, nne, t_mid: float,
                            radfield=None,
                            nt_ion_rate_ion=None,
                            nt_auger_prob=None, jb_lu=None,
                            timings: Optional[list] = None
                            ) -> np.ndarray:
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
    for sl in ranges_from_starts(starts):
        t0 = time.perf_counter()
        jb = None
        if jb_lu is not None:
            jb = (jb_lu[0], _slice_rows(jb_lu[1], sl, ncells))
        out[sl] = nltepop_mod.solve_nlte_pops(
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
        if timings is not None:
            timings.append(time.perf_counter() - t0)
    return out


def solve_sf_sharded(sf_solver, starts: Sequence[int],
                     nne: np.ndarray, levelpops: np.ndarray,
                     ion_numberdens: np.ndarray,
                     timings: Optional[list] = None):
    """Rank-distributed Spencer-Fano solve (solve_spencerfano over the
    rank's nstart..ndo cells, sn3d.cc:951-964).  The solver's
    per-cell solution-reuse state (_last/_last_nneperion/
    _ts_last_solved) is rank-private in the reference too; here the
    fresh-solve path is sharded (reuse gating happens in the caller's
    full-batch pass when enabled).  Returns the per-range solutions
    concatenated into one SFSolution."""
    ncells = len(nne)
    parts = []
    for sl in ranges_from_starts(starts):
        t0 = time.perf_counter()
        parts.append(sf_solver.solve(
            np.asarray(nne)[sl], np.ascontiguousarray(levelpops[sl]),
            _slice_rows(np.asarray(ion_numberdens), sl, ncells)))
        if timings is not None:
            timings.append(time.perf_counter() - t0)
    first = parts[0]
    merged = {}
    for f in dataclasses.fields(first):
        vals = [getattr(p, f.name) for p in parts]
        if (isinstance(vals[0], np.ndarray) and vals[0].ndim >= 1
                and sum(v.shape[0] for v in vals) == ncells):
            merged[f.name] = np.concatenate(vals, axis=0)
        else:
            merged[f.name] = vals[0]
    return type(first)(**merged)


def solve_te_sharded(starts: Sequence[int], solve_fn: Callable,
                     ncells: int, per_cell: dict, replicated: dict,
                     timings: Optional[list] = None) -> np.ndarray:
    """Rank-distributed thermal balance: ``solve_fn`` is called per
    owned range with ``per_cell`` kwargs row-sliced (arrays AND
    structs like the binned-radfield fit) and ``replicated`` kwargs
    passed through (solve_Te over nstart..ndo, thermalbalance.cc +
    sn3d.cc:951-964)."""
    chunks = []
    for sl in ranges_from_starts(starts):
        t0 = time.perf_counter()
        kw = {k: _slice_rows(v, sl, ncells)
              for k, v in per_cell.items()}
        chunks.append(np.asarray(solve_fn(**kw, **replicated)))
        if timings is not None:
            timings.append(time.perf_counter() - t0)
    return np.concatenate(chunks, axis=0)
