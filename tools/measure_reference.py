#!/usr/bin/env python
"""Measure the reference ARTIS's transport throughput from a completed
run's per-rank log (output_0-0.txt).

The reference prints, per timestep:
  - its event counters (stats.cc:171-226): escounter, cellcrossing,
    ma_stat_*, k_stat_*, updatecellcounter, ...
  - the update_packets wall time:
    "timestep N: time after update packets ... (rank 0 took Xs, ...)"
    (sn3d.cc do_timestep timing lines)

Throughput metric (matches bench.py's definition on the artis_tpu
side): transport *events* per second of transport wall time, where
events = escatters + cell crossings + line/continuum interactions +
macro-atom activations.  The counters named here are per-timestep
(reset in update_packets via stats::pkt_action_counters_reset).

Usage: python tools/measure_reference.py RUNDIR [--json]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

COUNTERS = (
    "escounter",
    "cellcrossing",
    "updatecellcounter",
    "ma_stat_activation_bb",
    "ma_stat_activation_bf",
    "ma_stat_activation_fb",
    "ma_stat_activation_collexc",
    "ma_stat_activation_collion",
    "k_stat_to_r_ff",
    "k_stat_to_r_fb",
    "k_stat_to_r_bb",
    "k_stat_from_ff",
    "k_stat_from_bf",
    "nt_stat_from_gamma",
    "resonancescatterings",
)

_COUNTER_RE = re.compile(
    r"(" + "|".join(COUNTERS) + r")\s*=\s*([0-9]+)")
_TIME_RE = re.compile(
    r"timestep (\d+): time after update packets \d+ "
    r"\(rank 0 took (\d+)s")
_INTERACT_RE = re.compile(
    r"mean number of interactions per packet = ([\d.]+)")


def measure(rundir: str) -> dict:
    log = os.path.join(rundir, "output_0-0.txt")
    per_ts: dict[int, dict] = {}
    cur: dict[str, int] = {}
    interactions_per_pkt = []
    with open(log) as f:
        for line in f:
            m = _COUNTER_RE.search(line)
            if m:
                cur[m.group(1)] = int(m.group(2))
                continue
            m = _INTERACT_RE.search(line)
            if m:
                interactions_per_pkt.append(float(m.group(1)))
                continue
            m = _TIME_RE.search(line)
            if m:
                ts = int(m.group(1))
                cur["transport_s"] = int(m.group(2))
                per_ts[ts] = cur
                cur = {}

    total_events = 0
    total_time = 0
    for ts, c in per_ts.items():
        ev = sum(c.get(k, 0) for k in COUNTERS)
        total_events += ev
        total_time += c.get("transport_s", 0)
    # the reference logs integer seconds; many timesteps take "0s".
    # Lower-bound the total at half a second per timestep so the
    # throughput estimate is conservative in the reference's favour
    # (true time <= logged + 1s per ts).
    total_time_lo = max(total_time, 1)
    total_time_hi = total_time + len(per_ts)  # +1s rounding per ts
    return {
        "rundir": rundir,
        "n_timesteps": len(per_ts),
        "total_events": total_events,
        "transport_s_logged": total_time,
        "events_per_s_optimistic": total_events / total_time_lo,
        "events_per_s_conservative": total_events / max(total_time_hi, 1),
        "mean_interactions_per_packet": (
            sum(interactions_per_pkt) / len(interactions_per_pkt)
            if interactions_per_pkt else 0.0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("rundir")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    res = measure(args.rundir)
    if args.json:
        print(json.dumps(res))
    else:
        for k, v in res.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
