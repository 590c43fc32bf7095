"""Radioactive decay: chains, Bateman solutions, and energy release.

TPU-native rebuild of the reference's decay subsystem
(reference: decay.cc). Key design changes versus the reference:

* All per-cell quantities are computed as vectorised numpy operations
  over the whole model grid at once (shape [ncells]) instead of scalar
  functions called per cell. These run on the host during setup and
  between transport steps — the hot transport path only consumes packed
  arrays derived here.
* Decay paths are plain dataclasses built once; there is no global
  mutable state.

Physics: indivisible-energy-packet scheme of Lucy (2005). Decay paths
enumerate every route from an unstable nuclide in the model to each
terminal decay (find_decaypaths, decay.cc:435-465); the Bateman equation
gives the population of the end of a chain at any time
(calculate_decaychain, decay.cc:734-789).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from . import nucdata
from .nucdata import (DECAYTYPE_ALPHA, DECAYTYPE_BETAMINUS,
                      DECAYTYPE_BETAPLUS, DECAYTYPE_COUNT, NuclideTable,
                      daughter_of, nucmass)


@dataclasses.dataclass(frozen=True)
class DecayPath:
    """One decay chain: nuclide[0] --type[0]--> nuclide[1] ... --type[-1]-->.

    The path "owns" only the decays of its final nuclide that were fed
    by the initial abundance of the top nuclide (decay.cc:299-306).
    """
    z: tuple[int, ...]
    a: tuple[int, ...]
    decaytypes: tuple[int, ...]
    branchproduct: float  # product of branch probabilities along the path
    final_decay_energy: float  # gamma+particle energy of last decay [erg]

    @property
    def length(self) -> int:
        return len(self.z)

    @property
    def final_z(self) -> int:
        return self.z[-1]

    @property
    def final_a(self) -> int:
        return self.a[-1]

    @property
    def final_decaytype(self) -> int:
        return self.decaytypes[-1]


def find_decay_paths(nt: NuclideTable) -> list[DecayPath]:
    """Enumerate all decay paths (find_decaypaths, decay.cc:435-465)."""
    paths: list[tuple[list[int], list[int], list[int]]] = []

    def extend(zs: list[int], as_: list[int], types: list[int]):
        paths.append((list(zs), list(as_), list(types)))
        dz, da = daughter_of(zs[-1], as_[-1], types[-1])
        if nt.exists(dz, da) and nt.meanlife(dz, da) > 0:
            for dt in range(DECAYTYPE_COUNT):
                if nt.branchprob(dz, da, dt) > 0:
                    if any(z == dz and a == da for z, a in zip(zs, as_)):
                        raise ValueError("loop in decay chain")
                    extend(zs + [dz], as_ + [da], types + [dt])

    for nuc in nt.nuclides:
        if nuc.z < 1 or nuc.meanlife <= 0:
            continue
        for dt in range(DECAYTYPE_COUNT):
            if nuc.branchprobs[dt] > 0:
                extend([nuc.z], [nuc.a], [dt])

    out = []
    for zs, as_, types in paths:
        branch = 1.0
        for z, a, t in zip(zs, as_, types):
            branch *= nt.branchprob(z, a, t)
        energy = nt.decay_energy(zs[-1], as_[-1], types[-1])
        out.append(DecayPath(z=tuple(zs), a=tuple(as_),
                             decaytypes=tuple(types),
                             branchproduct=branch,
                             final_decay_energy=energy))
    # deterministic ordering: sort by (A, Z) sequence read from the chain
    # bottom upwards (mirrors the reference's operator<, decay.cc:402-433)
    out.sort(key=lambda p: tuple((p.a[-1 - i], p.z[-1 - i])
                                 for i in range(p.length)))
    return out


def bateman_chain_abund(initabund: np.ndarray, meanlifes: Sequence[float],
                        timediff, expansionfactor: bool = False) -> np.ndarray:
    """Number abundance at the end of a decay chain after ``timediff``.

    Bateman-equation solution (calculate_decaychain, decay.cc:734-789).
    ``initabund`` may be an array [ncells]; ``timediff`` a scalar or
    array broadcastable against it. The last nuclide may be stable
    (meanlife <= 0). With ``expansionfactor=True`` each term is weighted
    by the homologous-expansion photon-energy-loss factor (Lucy 2005
    eq. 18), used for the initial-temperature estimate.
    """
    meanlifes = np.asarray(meanlifes, dtype=np.float64)
    n = len(meanlifes)
    lambdas = np.where(meanlifes > 0, 1.0 / np.where(meanlifes > 0,
                                                     meanlifes, 1.0), 0.0)
    # guard against (near-)degenerate lifetimes which would make the
    # partial-fraction denominators blow up
    for i in range(1, n):
        while np.any(np.abs(lambdas[i] - lambdas[:i]) <= 1e-10 * lambdas[i]):
            lambdas[i] *= 1.0 + 1e-7

    timediff = np.asarray(timediff, dtype=np.float64)
    lambdaproduct = np.prod(lambdas[:n - 1]) if n > 1 else 1.0

    total = np.zeros(np.broadcast(initabund, timediff).shape)
    for j in range(n):
        denom = 1.0
        for p in range(n):
            if p != j:
                denom *= lambdas[p] - lambdas[j]
        if not expansionfactor:
            total = total + np.exp(-lambdas[j] * timediff) / denom
        elif lambdas[j] > 0:
            tau = 1.0 / lambdas[j]
            with np.errstate(divide="ignore", invalid="ignore"):
                term = ((1.0 + tau / timediff) * np.exp(-timediff / tau)
                        - tau / timediff)
            term = np.where(timediff > 0, term, 0.0)
            total = total + term / denom
    return initabund * lambdaproduct * total


class DecayModel:
    """Per-model-grid decay bookkeeping.

    Binds a NuclideTable + decay paths to a model's initial radioactive
    abundances (``initabund`` [ncells, n_nuclides] mass fractions at
    ``t_model``), and provides the vectorised analogues of the
    reference's per-cell queries.
    """

    def __init__(self, nt: NuclideTable, initabund: np.ndarray,
                 t_model: float):
        assert initabund.shape[1] == len(nt)
        self.nt = nt
        self.paths = find_decay_paths(nt)
        self.initabund = np.asarray(initabund, dtype=np.float64)
        self.t_model = float(t_model)

    # -- helpers ------------------------------------------------------
    def _path_meanlifes(self, path: DecayPath) -> list[float]:
        return [self.nt.meanlife(z, a) for z, a in zip(path.z, path.a)]

    def _top_init_numberdens(self, path: DecayPath) -> np.ndarray:
        """Initial number abundance (per gram of ejecta) of the chain-top
        nuclide, [ncells]."""
        iz = self.nt.index(path.z[0], path.a[0])
        return self.initabund[:, iz] / nucmass(path.z[0], path.a[0])

    # -- energy release -----------------------------------------------
    def endecay_to_tinf_at_time(self, path: DecayPath,
                                time) -> np.ndarray:
        """Energy [erg/g] released from ``time`` to infinity by a path
        (get_endecay_to_tinf_per_ejectamass_at_time, decay.cc:866-913)."""
        meanlifes = self._path_meanlifes(path) + [-1.0]
        top = self._top_init_numberdens(path)
        t_after = np.asarray(time) - self.t_model
        abund_endplusone = bateman_chain_abund(top, meanlifes, t_after)
        ndecays_remaining = path.branchproduct * (top - abund_endplusone)
        return ndecays_remaining * path.final_decay_energy

    def endecay_between_times(self, path: DecayPath, tlow: float,
                              thigh: float) -> np.ndarray:
        """[erg/g] released by a path between tlow and thigh, per cell."""
        return (self.endecay_to_tinf_at_time(path, tlow)
                - self.endecay_to_tinf_at_time(path, thigh))

    def simtime_endecay_per_mass(self, tmin: float, tmax: float,
                                 from_tmodel: bool = True) -> np.ndarray:
        """[ncells, npaths] energy per mass released during the simulated
        interval (calculate_simtime_endecay_per_ejectamass,
        decay.cc:1013-1027). With ``from_tmodel`` (INITIAL_PACKETS on),
        decays between t_model and tmin are included (they become
        pre-tmin r-packets with adiabatic losses)."""
        t0 = self.t_model if from_tmodel else tmin
        cols = [self.endecay_between_times(p, t0, tmax) for p in self.paths]
        return np.stack(cols, axis=1) if cols else np.zeros(
            (self.initabund.shape[0], 0))

    def endecay_t0_to_time_withexpansion(self, tstart: float) -> np.ndarray:
        """[erg/g] released t_model..tstart weighted by the expansion
        energy-loss factor (decay.cc:957-998); used for initial T."""
        total = np.zeros(self.initabund.shape[0])
        tdiff = tstart - self.t_model
        for path in self.paths:
            meanlifes = self._path_meanlifes(path) + [-1.0]
            top = self._top_init_numberdens(path)
            if not np.any(top > 0):
                continue
            contrib = (path.branchproduct
                       * bateman_chain_abund(top, meanlifes, tdiff,
                                             expansionfactor=True)
                       * path.final_decay_energy)
            total += contrib
        return total

    def chain_decay_power_per_mass(self, path: DecayPath,
                                   time) -> np.ndarray:
        """[erg/s/g] decay power of a path at ``time``
        (get_chain_decay_power_per_ejectamass, decay.cc:1039-1076):
        the end-of-chain decay rate equals lambda_end * N_end(t) where
        N_end counts only nuclei fed from the chain-top initial
        abundance."""
        top = self._top_init_numberdens(path)
        meanlifes = self._path_meanlifes(path)
        t_after = np.asarray(time) - self.t_model
        endabund = bateman_chain_abund(top, meanlifes, t_after)
        lambda_end = 1.0 / meanlifes[-1]
        return (path.branchproduct * lambda_end * endabund
                * path.final_decay_energy)

    def global_etot(self, rho_init_tmodel_vol: np.ndarray) -> float:
        """Total energy [erg] released from t_model to t=inf
        (get_global_etot_t0_tinf, decay.cc:1202-1212).
        ``rho_init_tmodel_vol`` is per-cell mass [g]."""
        per_mass = np.zeros(self.initabund.shape[0])
        for path in self.paths:
            per_mass += self.endecay_to_tinf_at_time(path, self.t_model)
        return float(np.sum(per_mass * rho_init_tmodel_vol))

    # -- abundances ---------------------------------------------------
    def nuc_massfrac(self, z: int, a: int, time) -> np.ndarray:
        """[ncells] mass fraction of nuclide (z, a) at ``time``,
        including feeding from all ancestors (get_nuc_massfrac,
        decay.cc:791-864). Works for stable daughters outside the
        network too."""
        if z < 1:
            return np.zeros(self.initabund.shape[0])
        t_after = np.asarray(time) - self.t_model
        in_network = self.nt.exists(z, a)
        total = np.zeros(self.initabund.shape[0])

        for path in self.paths:
            z_end, a_end = path.final_z, path.final_a
            is_alpha_he4 = (z == 2 and a == 4
                            and path.final_decaytype == DECAYTYPE_ALPHA)
            if not is_alpha_he4:
                if in_network and not (z_end == z and a_end == a):
                    continue
                if not in_network:
                    dz, da = daughter_of(z_end, a_end, path.final_decaytype)
                    if (dz, da) != (z, a):
                        continue
            top = self._top_init_numberdens(path)
            if not np.any(top > 0):
                continue
            meanlifes = self._path_meanlifes(path)
            if not in_network or is_alpha_he4:
                meanlifes = meanlifes + [-1.0]
            contrib = (path.branchproduct
                       * bateman_chain_abund(top, meanlifes, t_after)
                       * nucmass(z, a))
            total += contrib

        if in_network and self.nt.meanlife(z, a) <= 0:
            total += self.initabund[:, self.nt.index(z, a)]
        return total

    def update_elemental_abundances(self, elem_massfracs_init: np.ndarray,
                                    zlist: Sequence[int],
                                    time) -> np.ndarray:
        """Evolve elemental mass fractions [ncells, nelements] to ``time``
        (update_abundances, decay.cc:1214-1321).

        The stable (non-network) part of each element is held fixed;
        network nuclides and end-chain daughters are re-evaluated from
        the Bateman solutions.
        """
        ncells, nel = elem_massfracs_init.shape
        out = np.array(elem_massfracs_init, dtype=np.float64, copy=True)

        # isotopes to account per element: network nuclides + terminal
        # daughters of every path
        isotopes: dict[int, set[tuple[int, int]]] = {}
        for nuc in self.nt.nuclides:
            if nuc.z >= 1:
                isotopes.setdefault(nuc.z, set()).add((nuc.z, nuc.a))
        for path in self.paths:
            dz, da = daughter_of(path.final_z, path.final_a,
                                 path.final_decaytype)
            if dz >= 1:
                isotopes.setdefault(dz, set()).add((dz, da))

        for ie, z in enumerate(zlist):
            if z not in isotopes:
                continue
            init_radio = np.zeros(ncells)
            now_radio = np.zeros(ncells)
            for (zz, aa) in sorted(isotopes[z]):
                if self.nt.exists(zz, aa):
                    init_radio += self.initabund[:, self.nt.index(zz, aa)]
                now_radio += self.nuc_massfrac(zz, aa, time)
            stable = np.maximum(elem_massfracs_init[:, ie] - init_radio, 0.0)
            out[:, ie] = stable + now_radio
        return out

    # -- pellet sampling ----------------------------------------------
    def sample_decay_times(self, path_index: np.ndarray, tmax: float,
                           rng: np.random.Generator,
                           tdecaymin: Optional[float] = None) -> np.ndarray:
        """Sample decay times for pellets assigned to decay paths
        (sample_decaytime, decay.cc:716-732): the decay time is the sum
        of exponential waits down the chain, rejection-sampled into
        (tdecaymin, tmax)."""
        if tdecaymin is None:
            tdecaymin = self.t_model
        n = len(path_index)
        tdecay = np.full(n, -1.0)
        todo = np.arange(n)
        path_meanlifes = [np.array(self._path_meanlifes(p))
                          for p in self.paths]
        while todo.size:
            t = np.full(todo.size, self.t_model)
            for pi in np.unique(path_index[todo]):
                sel = path_index[todo] == pi
                mls = path_meanlifes[pi]
                waits = rng.exponential(
                    scale=mls, size=(int(sel.sum()), len(mls))).sum(axis=1)
                t[sel] += waits
            tdecay[todo] = t
            ok = (t > tdecaymin) & (t < tmax)
            todo = todo[~ok]
        return tdecay

    def particle_injection_rate(self, time, decaytype: int) -> np.ndarray:
        """[ncells] energy injection rate density per mass [erg/s/g] in
        charged particles of a given decay type
        (get_particle_injection_rate, decay.cc:1148-1174)."""
        total = np.zeros(self.initabund.shape[0])
        for path in self.paths:
            if path.final_decaytype != decaytype:
                continue
            nuc = self.nt.get(path.final_z, path.final_a)
            e_part = nuc.particle_energy(decaytype)
            if e_part <= 0:
                continue
            power = self.chain_decay_power_per_mass(path, time)
            # chain_decay_power includes gamma+particle energy; rescale
            total += power * e_part / path.final_decay_energy
        return total
