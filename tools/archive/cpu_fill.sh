#!/bin/bash
# CPU-lane standard-path top-ups for one method: loops the per-cell
# missing-seed plan from tools/seed_gaps.py (re-read between cells, so
# cells the TPU queue fills meanwhile are skipped). Runs on the host
# backend only — never touches the single-client TPU tunnel.
set -u
cd "$(dirname "$0")/.."
M=${1:?method}
DEADLINE=${CPU_DEADLINE:-$(( $(date +%s) + 36000 ))}
# CPU_FILL_REVERSE=1: take cells from the END of the plan — lets the CPU
# lane work toward the TPU queue from the opposite side of the dataset
# list so the two lanes meet in the middle instead of colliding
PICK=${CPU_FILL_REVERSE:+tail}; PICK=${PICK:-head}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  line=$(python tools/seed_gaps.py --method "$M" --plan | $PICK -1)
  [ -z "$line" ] && { echo "[cpu_fill] $M complete"; break; }
  set -- $line
  ds=$1; start=$2; count=$3
  echo "[cpu_fill] $(date +%T) $M $ds seeds $start+$count"
  timeout 7200 nice -n 10 python run.py --platform cpu --methods "$M" \
    --datasets "$ds" --seed-start "$start" --seeds "$count" \
    --epochs 100 --no-debug > /dev/null 2>&1
done
