"""Internal unit system for on-device transport.

The reference carries CGS doubles everywhere. On TPU we run the hot
transport loop in float32, which cannot represent CGS photon-packet
state well (positions ~1e15 cm, energies ~1e42 erg). Instead the device
state uses a scale-free unit system anchored to the simulation start:

* length unit  = CLIGHT * tmin   (so the speed of light is 1)
* time unit    = tmin
* energy unit  = e0 (mean initial packet energy)
* frequency    = Hz (fits comfortably in float32)

In these units positions are O(0.01-1), times O(1-10), energies O(1),
and all transport formulae keep c == 1. Host-side setup and I/O remain
float64 CGS.
"""

from __future__ import annotations

import dataclasses

from .constants import CLIGHT


@dataclasses.dataclass(frozen=True)
class Units:
    tmin: float  # [s]
    e0: float  # [erg] energy unit

    @property
    def x_unit(self) -> float:
        """Length unit [cm]."""
        return CLIGHT * self.tmin

    @property
    def t_unit(self) -> float:
        """Time unit [s]."""
        return self.tmin

    # --- conversions (host side, float64) ---
    def length_to_sim(self, x_cm):
        return x_cm / self.x_unit

    def length_from_sim(self, x_sim):
        return x_sim * self.x_unit

    def time_to_sim(self, t_s):
        return t_s / self.tmin

    def time_from_sim(self, t_sim):
        return t_sim * self.tmin

    def velocity_to_sim(self, v_cms):
        return v_cms / CLIGHT

    def energy_to_sim(self, e_erg):
        return e_erg / self.e0

    def energy_from_sim(self, e_sim):
        return e_sim * self.e0

    def chi_to_sim(self, chi_percm):
        """Opacity [1/cm] -> optical depth per unit sim length."""
        return chi_percm * self.x_unit
