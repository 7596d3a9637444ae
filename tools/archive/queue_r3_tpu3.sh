#!/bin/bash
# Round-3 session-2 TPU queue: fill the remaining protocol gaps in
# priority order — zero cells first (edct EQ_4_B/EQ_4_C/EQ_5_B/EQ_5_D),
# then the thinnest neural columns (rmsn/crn/gnet/ct at n=1-2), then the
# ODE-method EQ_5/cancer fills. One process per method so the XLA compile
# cache amortises across that method's datasets.
#
# Deadline-guarded: stages stop dispatching when < 10 min remain so the
# single-client tunnel is free for the driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
# live-extendable: echo a later epoch into logs/markers/deadline to extend
# the window while the queue runs (read fresh on every check)
remaining() {
  local d
  d=$(cat logs/markers/deadline 2>/dev/null || echo "$DEADLINE")
  echo $(( d - $(date +%s) ))
}
budget() {
  local cap="$1" rem; rem=$(remaining)
  [ "$rem" -lt 600 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}
wait_tpu() {
  local tries=0
  until timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    tries=$((tries+1))
    echo "[queue3] $(date +%T) tunnel busy (try $tries); waiting" >> logs/queue_r3.log
    [ "$(remaining)" -lt 600 ] && { echo "[queue3] deadline while waiting" \
      >> logs/queue_r3.log; exit 0; }
    sleep 30
  done
}
stage() {
  local name="$1" m="$2"; shift 2
  local marker="logs/markers/r3s2_${name}"
  [ -f "$marker" ] && return 0
  local t; t=$(budget 14400)
  [ "$t" -eq 0 ] && { echo "[queue3] $(date +%T) deadline; skip $name" \
    >> logs/queue_r3.log; return 0; }
  wait_tpu
  echo "[queue3] $(date +%T) vectorized $m (budget ${t}s): $*" >> logs/queue_r3.log
  if timeout "$t" python run.py --vectorized --methods ${m//,/ } \
      --datasets "$@" --seeds 10 --epochs 100 --no-debug \
      >> logs/queue_r3.log 2>&1; then
    touch "$marker"
  else
    echo "[queue3] $(date +%T) FAILED/timeout $name (completed columns are" \
      "in the log regardless)" >> logs/queue_r3.log
  fi
}

echo "[queue3] $(date +%T) start (remaining $(remaining)s)" >> logs/queue_r3.log

# 1. zero cells
stage edct_zero edct EQ_4_B EQ_4_C EQ_5_B EQ_5_D
# 2. thinnest neural columns, full dataset sweeps (n=1-2 today)
stage rmsn_all rmsn EQ_4_A EQ_4_B EQ_4_C EQ_5_A EQ_5_B EQ_5_C EQ_5_D cancer_sim
stage ct_all   ct   cancer_sim EQ_5_D EQ_4_A EQ_4_B EQ_4_C EQ_5_A EQ_5_B EQ_5_C
stage crn_all  crn  cancer_sim EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D
stage gnet_all gnet cancer_sim EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D
# 3. remaining edct cells to n=10
stage edct_rest edct cancer_sim EQ_4_A EQ_4_D EQ_5_A EQ_5_C
# 4. ODE methods: EQ_5/cancer/EQ_4_D fills (fast columns)
stage ode_fill insite,sindy cancer_sim EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D
stage wsindy_fill wsindy cancer_sim EQ_5_A EQ_5_B EQ_5_C EQ_5_D
echo "[queue3] $(date +%T) DONE (remaining $(remaining)s)" >> logs/queue_r3.log
