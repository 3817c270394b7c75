#!/bin/bash
# Data-generation fan-out — the counterpart of the reference's
# run_data_gen.sh (/root/reference/run_data_gen.sh: 6 runs x 54 isolation
# windows as SLURM jobs with 800 GB each). The rebuilt pipeline keeps the
# signal sparse until windowing, so a plain process pool on one host
# replaces the cluster fan-out; point WINDOWS/RUNS at your data.
#
# Usage: scripts/run_data_gen.sh OUT_DIR FILE1.sqMass [FILE2.sqMass ...]

set -euo pipefail

OUT_DIR=${1:?usage: run_data_gen.sh OUT_DIR FILES...}
shift
mkdir -p "$OUT_DIR"

NUM_WINDOWS=${NUM_WINDOWS:-54}
JOBS=${JOBS:-$(nproc)}
WINDOW_SIZE=${WINDOW_SIZE:-340}
SLIDING_STEP=${SLIDING_STEP:-20}
MS1_BINS=${MS1_BINS:-50}
MS2_BINS=${MS2_BINS:-30000}

for f in "$@"; do
  base=$(basename "$f" .sqMass)
  for w in $(seq 0 $((NUM_WINDOWS - 1))); do
    echo "python3 -m dquartic_tpu.cli generate-train-data" \
      "--isolation_window_index $w --window-size $WINDOW_SIZE" \
      "--sliding-step $SLIDING_STEP --ms1-fixed-mz-size $MS1_BINS" \
      "--ms2-fixed-mz-size $MS2_BINS" \
      "'$f' '$OUT_DIR/${base}_win${w}.parquet'"
  done
done | xargs -P "$JOBS" -I CMD bash -c CMD
