"""Timestep grid construction (time_init, reference: input.cc:2226-2381)."""

from __future__ import annotations

import dataclasses

import numpy as np

from .config import SimConfig, TIMESTEP_CONSTANT, TIMESTEP_LOGARITHMIC


@dataclasses.dataclass(frozen=True)
class TimestepGrid:
    start: np.ndarray  # [nts] start time [s]
    width: np.ndarray  # [nts] width [s]
    mid: np.ndarray  # [nts] midpoint [s]

    @property
    def n(self) -> int:
        return len(self.start)

    def end(self, nts: int) -> float:
        return float(self.start[nts] + self.width[nts])


def build_timesteps(cfg: SimConfig) -> TimestepGrid:
    n = cfg.ntimesteps
    tmin, tmax = cfg.tmin, cfg.tmax
    if cfg.timestep_method == TIMESTEP_LOGARITHMIC:
        dlogt = (np.log(tmax) - np.log(tmin)) / n
        k = np.arange(n)
        start = tmin * np.exp(k * dlogt)
        mid = tmin * np.exp((k + 0.5) * dlogt)
        width = tmin * np.exp((k + 1) * dlogt) - start
    elif cfg.timestep_method == TIMESTEP_CONSTANT:
        dt = (tmax - tmin) / n
        start = tmin + np.arange(n) * dt
        width = np.full(n, dt)
        mid = start + 0.5 * width
    else:
        raise ValueError(f"unknown timestep method {cfg.timestep_method}")
    return TimestepGrid(start=start, width=width, mid=mid)
