#!/bin/bash
# CPU-lane standard-path top-ups restricted to a dataset whitelist.
# Same contract as cpu_fill.sh (host backend only, plan re-read between
# cells so TPU-queue progress is skipped) but only fills cells whose
# dataset matches the whitelist — used to keep the CPU lane off the
# cells the TPU queue's priority list / thinnest-first order will reach
# first, so the two lanes never duplicate seed work. Rows land in the
# same logs-as-database; numerics are backend-identical (PARITY.md
# EQ_4_D root-cause: trajectories bit-identical CPU f64 vs TPU f32
# at the divergence-relevant scale).
set -u
cd "$(dirname "$0")/.."
M=${1:?method}
shift
[ $# -ge 1 ] || { echo "usage: cpu_fill_subset.sh METHOD DS [DS...]"; exit 1; }
ALLOW=" $* "
DEADLINE=${CPU_DEADLINE:-$(( $(date +%s) + 36000 ))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  line=$(python tools/seed_gaps.py --method "$M" --plan | while read -r ds rest; do
    case "$ALLOW" in *" $ds "*) echo "$ds $rest"; break;; esac
  done)
  [ -z "$line" ] && { echo "[cpu_fill_subset] $M subset complete"; break; }
  set -- $line
  ds=$1; start=$2; count=$3
  [ "$count" -gt 2 ] && count=2   # re-read plan often: cede finished cells fast
  echo "[cpu_fill_subset] $(date +%T) $M $ds seeds $start+$count"
  timeout 7200 nice -n 10 python run.py --platform cpu --methods "$M" \
    --datasets "$ds" --seed-start "$start" --seeds "$count" \
    --epochs 100 --no-debug > /dev/null 2>&1
done
