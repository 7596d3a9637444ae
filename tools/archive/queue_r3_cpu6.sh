#!/bin/bash
# Round-3 session-2 CPU queue: top up the thinnest standard-path protocol
# cells (crn/rmsn/gnet at n=2) with seeds 2-4 on the host backend while
# the TPU tunnel is held by the vectorized queue (run.py --platform cpu
# never instantiates the TPU client). Newest-wins dedup means a later
# TPU 10-seed column supersedes these rows per seed.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
remaining() {
  local d
  d=$(cat logs/markers/deadline 2>/dev/null || echo "$DEADLINE")
  echo $(( d - $(date +%s) ))
}
stage() {
  local name="$1" m="$2"; shift 2
  local marker="logs/markers/r3s2cpu_${name}"
  [ -f "$marker" ] && return 0
  local rem; rem=$(remaining)
  [ "$rem" -lt 900 ] && { echo "[cpu6] $(date +%T) deadline; skip $name" \
    >> logs/queue_r3.log; return 0; }
  echo "[cpu6] $(date +%T) cpu standard $m seeds 2-4 (budget ${rem}s): $*" \
    >> logs/queue_r3.log
  if timeout "$rem" python run.py --platform cpu --methods "$m" \
      --datasets "$@" --seed-start 2 --seeds 3 --epochs 100 --no-debug \
      >> logs/queue_r3.log 2>&1; then
    touch "$marker"
  else
    echo "[cpu6] $(date +%T) FAILED/timeout $name (completed rows are in" \
      "the log regardless)" >> logs/queue_r3.log
  fi
}

echo "[cpu6] $(date +%T) start (remaining $(remaining)s)" >> logs/queue_r3.log
stage crn_fill  crn  cancer_sim EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D
stage rmsn_fill rmsn EQ_4_A EQ_4_B EQ_4_C EQ_5_A EQ_5_B EQ_5_C EQ_5_D
stage gnet_fill gnet cancer_sim EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D
echo "[cpu6] $(date +%T) DONE (remaining $(remaining)s)" >> logs/queue_r3.log
