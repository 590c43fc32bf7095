#!/bin/bash
#PBS -N artis_tpu
#PBS -l walltime=24:00:00
#PBS -l ncpus=8
#PBS -j oe
# PBS/qsub variant of the walltime-limited job-step runner — the
# analogue of the reference's Gadi/Raijin submit scripts
# (scripts/artis-gadi.sh, artis-raijin*.sh): run until the driver
# decides the remaining walltime cannot fit another timestep,
# checkpoint, print RESTART_NEEDED, and resubmit via qsub.
#
# Usage:
#   qsub -v CONFIG=classicmode,INPUTDIR=...,OUTDIR=... \
#       scripts/artis-tpu-pbs.sh
# The run auto-resumes from the latest checkpoint_tsN.npz in OUTDIR.
set -uo pipefail

CONFIG="${CONFIG:?qsub -v CONFIG=...,INPUTDIR=...,OUTDIR=...}"
INPUTDIR="${INPUTDIR:?missing INPUTDIR}"
OUTDIR="${OUTDIR:?missing OUTDIR}"
cd "${PBS_O_WORKDIR:-$(pwd)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# remaining walltime with a 10-minute checkpoint/teardown margin
# (the reference's -w flag semantics, sn3d.cc:779-807)
WALL_SECONDS="${PBS_WALLTIME:-86400}"
export WALLTIME_HOURS=$(awk -v s="$WALL_SECONDS" \
  'BEGIN{printf "%.3f", (s-600)/3600}')
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$OUTDIR/.jax_cache}"

LOG="$OUTDIR/jobstep_${PBS_JOBID:-manual}.log"
mkdir -p "$OUTDIR"
python "$REPO/examples/${CONFIG}.py" "$INPUTDIR" "$OUTDIR" 2>&1 \
  | tee "$LOG"
rc=${PIPESTATUS[0]}

if [ "$rc" -eq 93 ] || grep -q "RESTART_NEEDED" "$LOG"; then
  echo "resubmitting job step"
  qsub -v "CONFIG=$CONFIG,INPUTDIR=$INPUTDIR,OUTDIR=$OUTDIR" "$0"
  exit 0
fi
exit "$rc"
