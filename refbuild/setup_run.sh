#!/bin/bash
# Assemble a reference-ARTIS run directory for a validation run — the
# analogue of the reference's own tests/setup_classicmode.sh, but with
# the synthetic atomic dataset from tools/make_refdata.py standing in
# for the external atomicdata_feconi.tar.xz download (unreachable
# here; the reference CI downloads it from theory.gsi.de).
#
# Usage: setup_run.sh RUNDIR [fixture]
#   fixture: classicmode (default) | kilonova | nebularonezone
#            (a directory name under /root/reference/tests/)
#
# Then run, e.g.:
#   cd RUNDIR && ../../build/classic_sph/sn3d | tee sn3d_stdout.log
#   ../../build/classic_sph/exspec
#
# The committed refbuild/run/classic_sph/ outputs were produced this
# way with the GRID_TYPE=spherical classic build
# (build_reference.sh with GRID_TYPE=spherical, MPKTS 15000).
set -euo pipefail

REF=/root/reference
HERE="$(cd "$(dirname "$0")" && pwd)"
REPO="$(dirname "$HERE")"
RUNDIR="${1:?usage: setup_run.sh RUNDIR [fixture]}"
FIXTURE="${2:-classicmode}"

mkdir -p "$RUNDIR"
cp "$REF/tests/${FIXTURE}_inputfiles/"*.txt "$RUNDIR/" 2>/dev/null || \
  cp "$REF/tests/${FIXTURE}_inputfiles/"* "$RUNDIR/"
cp "$REF/data/"*.txt "$RUNDIR/"
cp "$RUNDIR/input-newrun.txt" "$RUNDIR/input.txt"

# syn_dir.txt: observer direction for the syn-mode outputs
[ -f "$RUNDIR/syn_dir.txt" ] || echo "0 0 1" > "$RUNDIR/syn_dir.txt"

# synthetic atomic dataset in the reference input formats
python "$REPO/tools/make_refdata.py" "$RUNDIR"
echo "run directory ready: $RUNDIR"
