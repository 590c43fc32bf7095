#!/bin/bash
#SBATCH --job-name=artis_tpu
#SBATCH --time=24:00:00
#SBATCH --ntasks=1
#SBATCH --cpus-per-task=8
# TPU clusters usually select accelerators via a partition/QOS or a
# TPU-VM image rather than --gres; adjust for your site.
#
# Walltime-limited job-step runner with self-resubmission — the
# analogue of the reference's cluster scripts (scripts/artis-*.sh):
# run until the driver decides the remaining walltime cannot fit
# another timestep, checkpoint, print RESTART_NEEDED, and resubmit.
#
# Usage:
#   sbatch scripts/artis-tpu-slurm.sh CONFIG INPUTDIR OUTDIR
#     CONFIG: classicmode | nebularonezone | kilonova
# The run auto-resumes from the latest checkpoint_tsN.npz in OUTDIR.
set -uo pipefail

CONFIG="${1:?usage: artis-tpu-slurm.sh CONFIG INPUTDIR OUTDIR}"
INPUTDIR="${2:?missing INPUTDIR}"
OUTDIR="${3:?missing OUTDIR}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

# leave ~10 minutes of margin under the SLURM limit for checkpoint
# writes and teardown (the reference subtracts the same way through
# its -w flag, sn3d.cc:779-807)
WALL_SECONDS=$(( $(squeue -h -j "${SLURM_JOB_ID:-0}" -o %L 2>/dev/null \
  | awk -F'[-:]' 'NF==4{print $1*86400+$2*3600+$3*60+$4}
                  NF==3{print $1*3600+$2*60+$3}
                  NF==2{print $1*60+$2}' ) ))
[ -z "$WALL_SECONDS" ] || [ "$WALL_SECONDS" -le 600 ] \
  && WALL_SECONDS=86400
export WALLTIME_HOURS=$(awk -v s="$WALL_SECONDS" \
  'BEGIN{printf "%.3f", (s-600)/3600}')
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$OUTDIR/.jax_cache}"

LOG="$OUTDIR/jobstep_${SLURM_JOB_ID:-manual}.log"
mkdir -p "$OUTDIR"
python "$REPO/examples/${CONFIG}.py" "$INPUTDIR" "$OUTDIR" 2>&1 \
  | tee "$LOG"
rc=${PIPESTATUS[0]}

if [ "$rc" -eq 93 ] || grep -q "RESTART_NEEDED" "$LOG"; then
  echo "resubmitting job step"
  sbatch "$0" "$CONFIG" "$INPUTDIR" "$OUTDIR"
  exit 0
fi
exit "$rc"
