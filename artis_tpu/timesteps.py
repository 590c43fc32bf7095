"""Timestep grid construction (time_init, reference: input.cc:2226-2381)."""

from __future__ import annotations

import dataclasses

import numpy as np

from .config import (SimConfig, TIMESTEP_CONSTANT, TIMESTEP_LOGARITHMIC,
                     TIMESTEP_LOG_THEN_CONSTANT)


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
    elif cfg.timestep_method == TIMESTEP_LOG_THEN_CONSTANT:
        # logarithmic widths until they would exceed
        # max_timestep_days, constant afterwards
        # (TIMESTEP_SIZE_METHOD LOGARITHMIC_THEN_CONSTANT,
        # artisoptions_classic.h:230-241 / time_init input.cc:2263-2310)
        dtmax = cfg.max_timestep_days * 86400.0
        edges = [tmin]
        dlogt = (np.log(tmax) - np.log(tmin)) / n
        while len(edges) <= n:
            t = edges[-1]
            dt = min(t * np.expm1(dlogt), dtmax)
            edges.append(t + dt)
        edges = np.asarray(edges)
        # rescale so the grid ends exactly at tmax
        edges = tmin + (edges - tmin) * (tmax - tmin) / (edges[-1] - tmin)
        start = edges[:-1]
        width = np.diff(edges)
        mid = start + 0.5 * width
    else:
        raise ValueError(f"unknown timestep method {cfg.timestep_method}")
    return TimestepGrid(start=start, width=width, mid=mid)
