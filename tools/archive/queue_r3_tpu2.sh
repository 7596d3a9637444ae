#!/bin/bash
# Round-3 TPU queue, part 2: extend the evidence window past
# queue_r2_protocol.sh's conservative 08:20 deadline (set when the round's
# endgame time was unknown). This session runs to ~14:00 UTC, so the
# tunnel can keep landing 10-seed vectorized columns until 12:30 and
# still leave >1 h of margin before the driver's end-of-round bench
# (single-client tunnel — it must be free by then).
#
# Waits for the part-1 queue process to exit, then runs every stage whose
# marker is missing, same marker names so the two queues compose.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DS_ALL="cancer_sim EQ_5_A EQ_5_B EQ_5_C EQ_5_D EQ_4_A EQ_4_B EQ_4_C EQ_4_D"
DEADLINE=${QUEUE_DEADLINE:-1787142600}   # 12:30 UTC Aug 19
Q1PID=${Q1PID:-1041}
remaining() { echo $(( DEADLINE - $(date +%s) )); }
budget() {
  local cap="$1" rem; rem=$(remaining)
  [ "$rem" -lt 600 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}
wait_tpu() {
  local tries=0
  until timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    tries=$((tries+1))
    echo "[queue2] $(date +%T) tunnel busy (try $tries); waiting" >> logs/queue_r2.log
    [ "$(remaining)" -lt 600 ] && { echo "[queue2] deadline while waiting" \
      >> logs/queue_r2.log; exit 0; }
    sleep 30
  done
}
run_method() {
  local m="$1"; shift
  local marker="logs/markers/r2m_${m}"
  [ -f "$marker" ] && return 0
  local t; t=$(budget 16200)
  [ "$t" -eq 0 ] && { echo "[queue2] $(date +%T) deadline; skip $m" \
    >> logs/queue_r2.log; return 0; }
  wait_tpu
  echo "[queue2] $(date +%T) vectorized $m (budget ${t}s): $*" >> logs/queue_r2.log
  if timeout "$t" python run.py --vectorized --methods "$m" \
      --datasets "$@" --seeds 10 --epochs 100 --no-debug \
      >> logs/queue_r2.log 2>&1; then
    touch "$marker"
  else
    echo "[queue2] $(date +%T) FAILED/timeout $m (completed columns are in" \
      "the log regardless)" >> logs/queue_r2.log
  fi
}

# hand-off: let part 1 finish its in-flight stage first
while kill -0 "$Q1PID" 2>/dev/null; do
  [ "$(remaining)" -lt 600 ] && exit 0
  sleep 60
done
echo "[queue2] $(date +%T) part-1 queue exited; resuming (remaining $(remaining)s)" \
  >> logs/queue_r2.log

run_method edct $DS_ALL
run_method rmsn $DS_ALL
run_method ct $DS_ALL
run_method crn $DS_ALL
run_method gnet $DS_ALL
echo "[queue2] $(date +%T) DONE (remaining $(remaining)s)" >> logs/queue_r2.log
