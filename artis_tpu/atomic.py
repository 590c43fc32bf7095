"""Atomic data: elements, ions, levels, and the bound-bound line list.

Rebuild of the reference's atomic-data layer (reference:
input.cc:747-1189 ``read_atomicdata_files`` and atomic.h accessors) as
flat packed numpy arrays instead of nested element/ion/level structs —
the layout the vectorised plasma solvers and the transport kernel
consume directly.

Readers accept the reference's file formats:
* ``compositiondata.txt``: nelements, T_preset, homogeneous flag, then
  per element: Z nions lowermost_ionstage uppermost_ionstage
  nlevelsmax abundance mass_amu (input.cc:758-801)
* ``adata.txt``: per-ion blocks ``Z ionstage nlevels ionpot_ev``
  followed by ``levelindex energy_ev statweight ntransitions [...]``
  rows; level energies are offset by the cumulative ionisation
  potentials of lower ions (input.cc:820-880, read_ion_levels
  input.cc:335-404)
* ``transitiondata.txt``: per-ion blocks ``Z ionstage ntransitions``
  followed by ``lower upper A [coll_str forbidden]`` rows
  (read_ion_transitions, input.cc:404-479)

A synthetic hydrogen-like dataset generator is provided for tests,
since the reference's large atomic dataset is an external download.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, TextIO

import numpy as np

from .constants import CLIGHT, EV, H, KB, ME, MH, PI, QE

OSC_CONST = ME * CLIGHT**3 / (8.0 * (QE * PI) ** 2)


@dataclasses.dataclass
class AtomicData:
    """Flattened atomic dataset.

    Index spaces:
      element index  e  in [0, nelements)
      ion index      i  in [0, nions_total)   (all ions of all elements)
      level index    l  in [0, nlevels_total) (all levels of all ions)
      line index     k  in [0, nlines)        (sorted by DESCENDING nu,
                                               matching input.cc:482-486)
    """
    # per element
    elem_z: np.ndarray  # [ne] atomic number
    elem_nions: np.ndarray  # [ne]
    elem_ion_start: np.ndarray  # [ne+1] offsets into ion arrays
    elem_abundance: np.ndarray  # [ne] default mass fractions
    elem_mass: np.ndarray  # [ne] mean nuclear mass [g]

    # per ion
    ion_element: np.ndarray  # [ni] element index
    ion_stage: np.ndarray  # [ni] spectroscopic ion stage (1 = neutral)
    ion_nlevels: np.ndarray  # [ni]
    ion_ionpot: np.ndarray  # [ni] ionisation potential [erg]
    ion_level_start: np.ndarray  # [ni+1] offsets into level arrays

    # per level
    level_energy: np.ndarray  # [nl] energy incl. ionisation offsets [erg]
    level_g: np.ndarray  # [nl] statistical weight
    level_metastable: np.ndarray  # [nl] bool

    # line list, sorted by descending frequency
    line_nu: np.ndarray  # [nk] [Hz]
    line_A: np.ndarray  # [nk] Einstein A (summed over duplicates)
    line_f: np.ndarray  # [nk] oscillator strength f_lu
    line_coll_str: np.ndarray  # [nk]
    line_forbidden: np.ndarray  # [nk] bool
    line_ion: np.ndarray  # [nk] ion index
    line_lower: np.ndarray  # [nk] global level index of lower level
    line_upper: np.ndarray  # [nk] global level index of upper level

    @property
    def nelements(self) -> int:
        return len(self.elem_z)

    @property
    def nions_total(self) -> int:
        return len(self.ion_element)

    @property
    def nlevels_total(self) -> int:
        return len(self.level_energy)

    @property
    def nlines(self) -> int:
        return len(self.line_nu)

    def ion_index(self, z: int, ionstage: int) -> int:
        for i in range(self.nions_total):
            if (self.elem_z[self.ion_element[i]] == z
                    and self.ion_stage[i] == ionstage):
                return i
        raise KeyError((z, ionstage))

    def level_epsilon_within_ion(self, ion: int) -> np.ndarray:
        """Level energies relative to the ion's ground level [erg]."""
        s, e = self.ion_level_start[ion], self.ion_level_start[ion + 1]
        return self.level_energy[s:e] - self.level_energy[s]


class _Builder:
    def __init__(self):
        self.elem_z = []
        self.elem_nions = []
        self.elem_ion_start = [0]
        self.elem_abundance = []
        self.elem_mass = []
        self.ion_element = []
        self.ion_stage = []
        self.ion_nlevels = []
        self.ion_ionpot = []
        self.ion_level_start = [0]
        self.level_energy = []
        self.level_g = []
        self.level_metastable = []
        self.lines = []  # (nu, A, f, coll_str, forbidden, ion, lower, upper)

    def add_element(self, z, abundance=0.0, mass_amu=None):
        self.elem_z.append(z)
        self.elem_nions.append(0)
        self.elem_abundance.append(abundance)
        self.elem_mass.append((mass_amu or 2 * z) * MH)

    def add_ion(self, ionstage, ionpot_erg, energies_erg, gs,
                transitions):
        """transitions: list of (lower, upper, A, coll_str, forbidden)
        with level indices local to this ion."""
        e = len(self.elem_z) - 1
        i = len(self.ion_element)
        self.elem_nions[e] += 1
        self.ion_element.append(e)
        self.ion_stage.append(ionstage)
        nlev = len(energies_erg)
        self.ion_nlevels.append(nlev)
        self.ion_ionpot.append(ionpot_erg)
        lstart = self.ion_level_start[-1]
        self.ion_level_start.append(lstart + nlev)
        self.level_energy.extend(energies_erg)
        self.level_g.extend(gs)
        metastable = [True] * nlev

        seen = {}
        for (lo, up, A, coll_str, forb) in transitions:
            if lo >= nlev or up >= nlev:
                continue
            nu = (energies_erg[up] - energies_erg[lo]) / H
            if nu <= 0:
                continue
            metastable[up] = False
            g_ratio = gs[up] / gs[lo]
            f = g_ratio * OSC_CONST / nu**2 * A
            key = (lo, up)
            if key in seen:
                # merge duplicate transitions (input.cc:648-683)
                k = seen[key]
                nu0, A0, f0, cs0, fb0, ii, glo, gup = self.lines[k]
                self.lines[k] = (nu0, A0 + A, f0 + f, max(cs0, coll_str),
                                 fb0, ii, glo, gup)
            else:
                seen[key] = len(self.lines)
                self.lines.append((nu, A, f, coll_str, forb, i,
                                   lstart + lo, lstart + up))
        self.level_metastable.extend(metastable)

    def finish(self) -> AtomicData:
        self.elem_ion_start = np.cumsum([0] + self.elem_nions)
        lines = sorted(self.lines, key=lambda t: -t[0])
        arr = lambda xs, dt: np.array(xs, dtype=dt)
        return AtomicData(
            elem_z=arr(self.elem_z, np.int32),
            elem_nions=arr(self.elem_nions, np.int32),
            elem_ion_start=arr(self.elem_ion_start, np.int32),
            elem_abundance=arr(self.elem_abundance, np.float64),
            elem_mass=arr(self.elem_mass, np.float64),
            ion_element=arr(self.ion_element, np.int32),
            ion_stage=arr(self.ion_stage, np.int32),
            ion_nlevels=arr(self.ion_nlevels, np.int32),
            ion_ionpot=arr(self.ion_ionpot, np.float64),
            ion_level_start=arr(self.ion_level_start, np.int32),
            level_energy=arr(self.level_energy, np.float64),
            level_g=arr(self.level_g, np.float64),
            level_metastable=arr(self.level_metastable, bool),
            line_nu=arr([t[0] for t in lines], np.float64),
            line_A=arr([t[1] for t in lines], np.float64),
            line_f=arr([t[2] for t in lines], np.float64),
            line_coll_str=arr([t[3] for t in lines], np.float64),
            line_forbidden=arr([t[4] for t in lines], bool),
            line_ion=arr([t[5] for t in lines], np.int32),
            line_lower=arr([t[6] for t in lines], np.int32),
            line_upper=arr([t[7] for t in lines], np.int32),
        )


# ---------------------------------------------------------------------------
# reference-format readers
# ---------------------------------------------------------------------------

def _tokens(f: TextIO):
    for line in f:
        s = line.split("#")[0].strip()
        if s:
            yield s


def read_atomic_data(path: str, max_nlevels: Optional[int] = None,
                     groundstate_index_in: int = 1) -> AtomicData:
    """Parse compositiondata.txt + adata.txt + transitiondata.txt from a
    directory (read_atomicdata_files, input.cc:747-977)."""
    import os

    b = _Builder()

    with open(os.path.join(path, "compositiondata.txt")) as f:
        toks = list(_tokens(f))
    flat = " ".join(toks).split()
    nelements = int(flat[0])
    # flat[1] = T_preset, flat[2] = homogeneous_abundances
    pos = 3
    comp = []
    for _ in range(nelements):
        z, nions, lo_stage, up_stage, nlevmax = (int(v)
                                                 for v in flat[pos:pos + 5])
        abund, mass_amu = float(flat[pos + 5]), float(flat[pos + 6])
        pos += 7
        comp.append((z, nions, lo_stage, up_stage, nlevmax, abund,
                     mass_amu))

    # parse adata.txt into {(Z, ionstage): (ionpot_ev, levels)}
    adata_blocks = {}
    adata_order = []
    with open(os.path.join(path, "adata.txt")) as f:
        flat_a = f.read().split("\n")
    li = 0

    def next_nonempty():
        nonlocal li
        while li < len(flat_a) and not flat_a[li].strip():
            li += 1
        row = flat_a[li].split()
        li += 1
        return row

    while li < len(flat_a):
        while li < len(flat_a) and not flat_a[li].strip():
            li += 1
        if li >= len(flat_a):
            break
        hdr = next_nonempty()
        z, ionstage, nlev = int(hdr[0]), int(hdr[1]), int(hdr[2])
        ionpot_ev = float(hdr[3])
        levels = []
        for _ in range(nlev):
            row = next_nonempty()
            levels.append((float(row[1]), float(row[2])))  # energy_ev, g
        adata_blocks[(z, ionstage)] = (ionpot_ev, levels)
        adata_order.append((z, ionstage))

    # parse transitiondata.txt into {(Z, ionstage): rows}
    trans_blocks = {}
    with open(os.path.join(path, "transitiondata.txt")) as f:
        rows = [ln.split() for ln in f if ln.strip()
                and not ln.startswith("#")]
    ri = 0
    while ri < len(rows):
        z, ionstage, ntrans = (int(v) for v in rows[ri][:3])
        ri += 1
        block = []
        for _ in range(ntrans):
            r = rows[ri]
            ri += 1
            if len(r) >= 5:
                lo, up = int(r[0]), int(r[1])
                A, cs, forb = float(r[2]), float(r[3]), int(r[4])
            else:  # old format: index lower upper A
                lo, up = int(r[1]), int(r[2])
                A, cs, forb = float(r[3]), -1.0, 0
            block.append((lo - groundstate_index_in,
                          up - groundstate_index_in, A, cs, bool(forb)))
        trans_blocks[(z, ionstage)] = block

    for (z, nions, lo_stage, up_stage, nlevmax, abund, mass_amu) in comp:
        b.add_element(z, abund, mass_amu)
        energyoffset = 0.0
        # accumulate ionpots of any skipped lower ions (input.cc:834-850)
        for (za, sa) in adata_order:
            if za == z and sa < lo_stage:
                energyoffset += adata_blocks[(za, sa)][0]
        for ion in range(nions):
            ionstage = lo_stage + ion
            ionpot_ev, levels = adata_blocks[(z, ionstage)]
            nuse = len(levels)
            if nlevmax > 0:
                nuse = min(nuse, nlevmax)
            if max_nlevels:
                nuse = min(nuse, max_nlevels)
            energies = [(energyoffset + e) * EV for e, _ in levels[:nuse]]
            gs = [g for _, g in levels[:nuse]]
            b.add_ion(ionstage, ionpot_ev * EV, energies, gs,
                      trans_blocks.get((z, ionstage), []))
            energyoffset += ionpot_ev
    return b.finish()


# ---------------------------------------------------------------------------
# synthetic dataset for tests/benchmarks
# ---------------------------------------------------------------------------

def make_synthetic_atomic_data(seed: int = 0,
                               elements=((14, 2, 10), (26, 3, 25),
                                         (27, 3, 25), (28, 3, 25)),
                               ) -> AtomicData:
    """Hydrogen-like multi-ion dataset with plausible level structure
    and strong+weak lines, for tests without the external dataset.

    elements: tuples of (Z, nions, nlevels_per_ion).
    """
    rng = np.random.default_rng(seed)
    b = _Builder()
    for (z, nions, nlev) in elements:
        b.add_element(z, abundance=0.0, mass_amu=2 * z)
        energyoffset = 0.0
        for ion in range(nions):
            ionstage = ion + 1
            # hydrogenic-ish: ionpot grows with stage
            ionpot_ev = 7.0 + 6.0 * ionstage + 0.1 * z
            # Rydberg-like ladder up to 85% of the ionisation potential
            n_quantum = np.arange(1, nlev + 1)
            level_ev = ionpot_ev * 0.85 * (1.0 - 1.0 / n_quantum**2)
            # add small random splittings for realism
            level_ev = level_ev + rng.uniform(0, 0.05, nlev).cumsum()
            level_ev = np.sort(level_ev)
            level_ev[0] = 0.0
            gs = 2.0 * (rng.integers(0, 5, nlev) + 1)
            energies = (energyoffset + level_ev) * EV
            trans = []
            for up in range(1, nlev):
                for lo in range(up):
                    if rng.random() < 0.6:
                        A = 10 ** rng.uniform(3.0, 7.5)
                        forb = rng.random() < 0.2
                        trans.append((lo, up, A, -1.0, forb))
            b.add_ion(ionstage, ionpot_ev * EV, list(energies), list(gs),
                      trans)
            energyoffset += ionpot_ev
    return b.finish()
