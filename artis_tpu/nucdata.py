"""Nuclear data: radionuclide decay properties and gamma-line spectra.

TPU-native rebuild of the reference's nuclide registry
(reference: decay.cc:501-714 ``init_nuclides`` and
gammapkt.cc:55-226 gamma-spectrum setup), redesigned as plain
numpy tables instead of a mutable global vector of structs.

Data provenance: the hard-coded nuclides match the reference's built-in
set (meanlifes/positron energies from decay.cc:518-578); the bundled
gamma-line tables are the standard ENDF-derived line energies and
probabilities for the common SN Ia chains (same physical data as the
reference's ``data/*_lines.txt``). Arbitrary extra nuclides can be
loaded from reference-format ``betaminusdecays.txt`` / ``alphadecays.txt``
data directories.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np

from .constants import DAY, MEV, MH

# decay type codes (same ordering as the reference, decay.h:15-22,
# so packet dumps stay comparable)
DECAYTYPE_ALPHA = 0
DECAYTYPE_ELECTRONCAPTURE = 1
DECAYTYPE_BETAPLUS = 2
DECAYTYPE_BETAMINUS = 3
DECAYTYPE_NONE = 4
DECAYTYPE_COUNT = 5

ELSYMBOLS = [
    "n", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne", "Na", "Mg",
    "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca", "Sc", "Ti", "V", "Cr",
    "Mn", "Fe", "Co", "Ni", "Cu", "Zn", "Ga", "Ge", "As", "Se", "Br",
    "Kr", "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd",
    "Ag", "Cd", "In", "Sn", "Sb", "Te", "I", "Xe", "Cs", "Ba", "La",
    "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er",
    "Tm", "Yb", "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au",
    "Hg", "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm", "Md",
    "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds", "Rg", "Cn",
]


@dataclasses.dataclass
class Nuclide:
    z: int
    a: int
    meanlife: float  # [s]; <= 0 means stable
    branchprobs: np.ndarray  # [DECAYTYPE_COUNT]
    endecay_gamma: float = 0.0  # mean gamma-ray energy per decay [erg]
    endecay_positron: float = 0.0  # mean positron KE per decay [erg]
    endecay_electron: float = 0.0  # mean beta- electron KE per decay [erg]
    endecay_alpha: float = 0.0  # mean alpha KE per decay [erg]
    endecay_q: Optional[np.ndarray] = None  # Q value per decay type [erg]

    def __post_init__(self):
        if self.endecay_q is None:
            self.endecay_q = np.zeros(DECAYTYPE_COUNT)

    def particle_energy(self, decaytype: int) -> float:
        """Mean charged-particle KE per decay for the given decay type [erg].

        The branching factor is folded into the stored energies (matching
        decay.cc:208-236).
        """
        if decaytype == DECAYTYPE_ALPHA:
            return self.endecay_alpha
        if decaytype == DECAYTYPE_BETAPLUS:
            return self.endecay_positron
        if decaytype == DECAYTYPE_BETAMINUS:
            return self.endecay_electron
        return 0.0

    @property
    def name(self) -> str:
        return f"{ELSYMBOLS[self.z]}{self.a}"


def daughter_of(z: int, a: int, decaytype: int) -> tuple[int, int]:
    """(Z, A) of the decay product for a decay type (decay.cc:132-179)."""
    if decaytype == DECAYTYPE_ALPHA:
        return z - 2, a - 4
    if decaytype in (DECAYTYPE_BETAPLUS, DECAYTYPE_ELECTRONCAPTURE):
        return z - 1, a
    if decaytype == DECAYTYPE_BETAMINUS:
        return z + 1, a
    return -1, -1


def nucmass(z: int, a: int) -> float:
    """Nuclide mass [g] (A * m_H approximation, decay.cc:274-279)."""
    return a * MH


# Gamma-ray line tables: {(Z, A): [(energy_mev, probability), ...]}
# Physical line data for the classic SN Ia decay chains (ENDF-derived,
# same data as the reference's bundled data/*_lines.txt).
GAMMA_LINES_MEV: dict[tuple[int, int], list[tuple[float, float]]] = {
    (28, 56): [  # Ni56
        (0.158, 1.00), (0.270, 0.36), (0.480, 0.36),
        (0.750, 0.50), (0.812, 0.87), (1.562, 0.14),
    ],
    (27, 56): [  # Co56
        (0.511, 0.38), (0.734, 0.0021), (0.788, 0.0030), (0.847, 0.9998),
        (0.978, 0.0144), (1.038, 0.1408), (1.140, 0.0015), (1.175, 0.0224),
        (1.238, 0.6758), (1.360, 0.0428), (1.443, 0.0020), (1.772, 0.1600),
        (1.811, 0.0048), (1.964, 0.0072), (2.015, 0.0309), (2.035, 0.0795),
        (2.213, 0.0063), (2.598, 0.1672), (3.010, 0.0100), (3.202, 0.0303),
        (3.254, 0.0743), (3.273, 0.0176), (3.452, 0.0086),
    ],
    (28, 57): [  # Ni57
        (0.12716, 0.167), (0.5110, 0.87), (1.37763, 0.817),
        (1.75755, 0.0575), (1.91952, 0.123),
    ],
    (27, 57): [  # Co57
        (0.0144129, 0.0916), (0.1220606, 0.8560), (0.1364735, 0.1068),
    ],
    (24, 48): [  # Cr48
        (0.11231, 0.96), (0.30824, 1.00),
    ],
    (23, 48): [  # V48
        (0.511, 0.998), (0.80290, 0.00136), (0.928327, 0.00783),
        (0.944130, 0.07870), (0.983525, 0.9998), (1.312106, 0.982),
        (1.43752, 0.00120), (2.240396, 0.02333), (2.37520, 0.000087),
        (2.42094, 0.000067),
    ],
}


def _builtin_nuclides() -> list[Nuclide]:
    """The reference's built-in nuclide set (decay.cc:518-578)."""

    def mk(z, a, meanlife, *, bp=None, e_pos=0.0):
        probs = np.zeros(DECAYTYPE_COUNT)
        if bp is not None:
            probs[bp] = 1.0
        return Nuclide(z=z, a=a, meanlife=meanlife, branchprobs=probs,
                       endecay_positron=e_pos)

    EC, BPLUS = DECAYTYPE_ELECTRONCAPTURE, DECAYTYPE_BETAPLUS
    nucs = [
        mk(28, 57, 51.36 * 60, bp=BPLUS, e_pos=0.354 * MEV * 0.436),  # Ni57
        mk(28, 56, 8.80 * DAY, bp=EC),  # Ni56
        mk(27, 56, 113.7 * DAY, bp=BPLUS, e_pos=0.63 * MEV * 0.19),  # Co56
        mk(24, 48, 1.29602 * DAY, bp=EC),  # Cr48
        mk(23, 48, 23.0442 * DAY, bp=BPLUS, e_pos=0.290 * MEV * 0.499),  # V48
        mk(27, 57, 392.03 * DAY, bp=EC),  # Co57
        mk(26, 52, 0.497429 * DAY, bp=EC),  # Fe52
        mk(25, 52, 0.0211395 * DAY, bp=EC),  # Mn52
    ]
    return nucs


def _read_betaminus_file(path: str, keep_a: set[int]) -> list[Nuclide]:
    """Parse a reference-format betaminusdecays.txt.

    Columns: A, Z, Q[MeV], E_gamma[MeV], E_elec[MeV], E_neutrino[MeV],
    meanlife[s] (reference: decay.cc:580-618).
    """
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            a, z = int(vals[0]), int(vals[1])
            if a not in keep_a:
                continue
            q_mev, e_gamma, e_elec, _e_nu, tau = map(float, vals[2:7])
            probs = np.zeros(DECAYTYPE_COUNT)
            probs[DECAYTYPE_BETAMINUS] = 1.0
            q = np.zeros(DECAYTYPE_COUNT)
            q[DECAYTYPE_BETAMINUS] = q_mev * MEV
            out.append(Nuclide(
                z=z, a=a, meanlife=tau, branchprobs=probs,
                endecay_gamma=e_gamma * MEV, endecay_electron=e_elec * MEV,
                endecay_q=q))
    return out


def _read_alpha_file(path: str, keep_a: set[int]) -> list[Nuclide]:
    """Parse a reference-format alphadecays.txt.

    Columns: A, Z, branch_alpha, branch_beta, halflife[s],
    Q_total_alphadec[MeV], Q_total_betadec[MeV], E_alpha[MeV],
    E_gamma[MeV], E_beta[MeV] (reference: decay.cc:620-714).
    """
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = line.split()
            a, z = int(vals[0]), int(vals[1])
            if a not in keep_a:
                continue
            br_alpha, br_beta = float(vals[2]), float(vals[3])
            halflife = float(vals[4])
            q_alpha_mev, q_beta_mev = float(vals[5]), float(vals[6])
            e_alpha, e_gamma, e_beta = (float(vals[7]), float(vals[8]),
                                        float(vals[9]))
            probs = np.zeros(DECAYTYPE_COUNT)
            probs[DECAYTYPE_ALPHA] = br_alpha
            probs[DECAYTYPE_BETAMINUS] = br_beta
            q = np.zeros(DECAYTYPE_COUNT)
            q[DECAYTYPE_ALPHA] = q_alpha_mev * MEV
            q[DECAYTYPE_BETAMINUS] = q_beta_mev * MEV
            out.append(Nuclide(
                z=z, a=a, meanlife=halflife / np.log(2.0), branchprobs=probs,
                endecay_gamma=e_gamma * MEV, endecay_electron=e_beta * MEV,
                endecay_alpha=e_alpha * MEV, endecay_q=q))
    return out


class NuclideTable:
    """Registry of radionuclides and their gamma spectra.

    Replaces the reference's global ``std::vector<nuclide>`` + parallel
    ``gamma_spectra`` array (decay.cc / gammapkt.cc) with one immutable
    table exposing packed numpy arrays for device upload.
    """

    def __init__(self, nuclides: Sequence[Nuclide],
                 data_path: Optional[str] = None):
        self.nuclides: list[Nuclide] = list(nuclides)
        self._index: dict[tuple[int, int], int] = {
            (n.z, n.a): i for i, n in enumerate(self.nuclides)}
        self._gamma_spectra: dict[int, np.ndarray] = {}
        self._load_gamma_spectra(data_path)

    # -- construction -------------------------------------------------
    @classmethod
    def create(cls, custom_zlist: Sequence[int] = (),
               custom_alist: Sequence[int] = (),
               data_path: Optional[str] = None) -> "NuclideTable":
        """Build the nuclide set: built-ins plus any custom (Z, A) nuclides
        resolved from reference-format decay data files (init_nuclides,
        decay.cc:501-714)."""
        nucs = _builtin_nuclides()
        have = {(n.z, n.a) for n in nucs}
        keep_a = {a for a in custom_alist}
        if keep_a and data_path:
            bm = os.path.join(data_path, "betaminusdecays.txt")
            al = os.path.join(data_path, "alphadecays.txt")
            extra: list[Nuclide] = []
            if os.path.exists(bm):
                extra += _read_betaminus_file(bm, keep_a)
            if os.path.exists(al):
                extra += _read_alpha_file(al, keep_a)
            for n in extra:
                if (n.z, n.a) not in have:
                    nucs.append(n)
                    have.add((n.z, n.a))
        # requested nuclides that are not known anywhere: treat as stable
        for z, a in zip(custom_zlist, custom_alist):
            if z > 0 and (z, a) not in have:
                nucs.append(Nuclide(z=z, a=a, meanlife=-1.0,
                                    branchprobs=np.zeros(DECAYTYPE_COUNT)))
                have.add((z, a))
        return cls(nucs, data_path=data_path)

    def _load_gamma_spectra(self, data_path: Optional[str]):
        """Attach gamma-line spectra (gammapkt.cc:97-175)."""
        for i, nuc in enumerate(self.nuclides):
            lines = None
            if data_path:
                fname = os.path.join(
                    data_path,
                    f"{ELSYMBOLS[nuc.z].lower()}{nuc.a}_lines.txt")
                if os.path.exists(fname):
                    lines = self._parse_lines_file(fname)
            if lines is None:
                builtin = GAMMA_LINES_MEV.get((nuc.z, nuc.a))
                if builtin is not None:
                    lines = np.array(builtin, dtype=np.float64)
            if lines is not None and len(lines) > 0:
                self._gamma_spectra[i] = lines
                nuc.endecay_gamma = float(
                    np.sum(lines[:, 0] * MEV * lines[:, 1]))
            elif nuc.endecay_gamma > 0.0:
                # trivial single-line spectrum at the mean energy
                # (gammapkt.cc:86-95)
                self._gamma_spectra[i] = np.array(
                    [[nuc.endecay_gamma / MEV, 1.0]])
        # special cases with no line data but known mean gamma energy
        # (gammapkt.cc:169-174)
        for (z, a), e_mev in (((26, 52), 0.86), ((25, 52), 3.415)):
            i = self._index.get((z, a))
            if i is not None and i not in self._gamma_spectra:
                self.nuclides[i].endecay_gamma = e_mev * MEV
                self._gamma_spectra[i] = np.array([[e_mev, 1.0]])

    @staticmethod
    def _parse_lines_file(path: str) -> np.ndarray:
        with open(path) as f:
            tokens = f.read().split()
        n = int(tokens[0])
        vals = np.array(tokens[1:1 + 2 * n], dtype=np.float64)
        return vals.reshape(n, 2)

    # -- queries ------------------------------------------------------
    def __len__(self) -> int:
        return len(self.nuclides)

    def exists(self, z: int, a: int) -> bool:
        return (z, a) in self._index

    def index(self, z: int, a: int) -> int:
        return self._index[(z, a)]

    def get(self, z: int, a: int) -> Nuclide:
        return self.nuclides[self._index[(z, a)]]

    def meanlife(self, z: int, a: int) -> float:
        """Mean lifetime [s]; -1 for unknown/stable (decay.cc:264-272)."""
        i = self._index.get((z, a))
        if i is None:
            return -1.0
        return self.nuclides[i].meanlife

    def branchprob(self, z: int, a: int, decaytype: int) -> float:
        i = self._index.get((z, a))
        if i is None:
            return 0.0
        return float(self.nuclides[i].branchprobs[decaytype])

    def gamma_spectrum(self, nucindex: int) -> Optional[np.ndarray]:
        """[nlines, 2] array of (energy_mev, probability) or None."""
        return self._gamma_spectra.get(nucindex)

    def decay_energy(self, z: int, a: int, decaytype: int) -> float:
        """Energy per decay in gammas + charged particles [erg]
        (decay.cc:250-258)."""
        nuc = self.get(z, a)
        return nuc.endecay_gamma + nuc.particle_energy(decaytype)

    # -- packed arrays for device use ---------------------------------
    def packed_gamma_spectra(self) -> dict[str, np.ndarray]:
        """Flatten per-nuclide gamma spectra into CSR-style arrays.

        Returns dict with:
          line_energy  [nlines_total] erg
          line_cumprob [nlines_total] cumulative P(line)*E(line)/E_gamma
                       within each nuclide's span (for energy-weighted
                       line sampling, gammapkt.cc:227-254)
          nuc_start    [n_nuclides+1] span offsets
        """
        starts = [0]
        energies: list[float] = []
        cumprobs: list[float] = []
        for i, nuc in enumerate(self.nuclides):
            spec = self._gamma_spectra.get(i)
            if spec is not None and nuc.endecay_gamma > 0:
                e = spec[:, 0] * MEV
                p = spec[:, 1]
                w = np.cumsum(e * p) / nuc.endecay_gamma
                energies.extend(e.tolist())
                cumprobs.extend(w.tolist())
            starts.append(len(energies))
        return {
            "line_energy": np.array(energies, dtype=np.float64),
            "line_cumprob": np.array(cumprobs, dtype=np.float64),
            "nuc_start": np.array(starts, dtype=np.int32),
        }
