#!/bin/bash
# Round-4 TPU queue: land 10-seed protocol columns for every remaining
# main-table cell, highest-value-first. Gap-driven — each stage asks
# tools/seed_gaps.py which datasets still need seeds, so a crash/retry
# never repeats landed columns and there are no stale all-or-nothing
# markers (round-3 lesson: a stage marker landed despite a TPU worker
# crash that produced zero rows).
#
# Budget discipline (ADVICE r3): the stage budget is computed AFTER
# wait_tpu returns, and is capped at remaining-600 s so the single-client
# tunnel is guaranteed free 10 min before the deadline for the driver's
# end-of-round bench. The deadline is live-extendable: echo a later epoch
# into logs/markers/deadline_r4.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4_tpu.log

remaining() {
  local d
  d=$(cat logs/markers/deadline_r4 2>/dev/null || echo "$DEADLINE")
  echo $(( d - $(date +%s) ))
}
budget() {  # min(cap, remaining-600), floored at 0
  local cap="$1" rem; rem=$(remaining)
  rem=$(( rem - 600 ))
  [ "$rem" -le 0 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}
wait_tpu() {
  local tries=0
  until timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    tries=$((tries+1))
    echo "[queue4] $(date +%T) tunnel busy (try $tries); waiting" >> "$QLOG"
    [ "$(remaining)" -lt 700 ] && { echo "[queue4] deadline while waiting" \
      >> "$QLOG"; exit 0; }
    sleep 30
  done
}
# stage <method> <cap-seconds> [extra run.py args...]
stage() {
  local m="$1" cap="$2"; shift 2
  local gaps
  gaps=$(python tools/seed_gaps.py --method "$m" --list) || return 0
  [ -z "$gaps" ] && { echo "[queue4] $(date +%T) $m: no gaps" >> "$QLOG";
                      return 0; }
  [ "$(budget "$cap")" -eq 0 ] && { echo "[queue4] $(date +%T) deadline;" \
    "skip $m" >> "$QLOG"; return 1; }
  wait_tpu
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4] $(date +%T) deadline after wait;" \
    "skip $m" >> "$QLOG"; return 1; }
  echo "[queue4] $(date +%T) vectorized $m (budget ${t}s): $gaps" >> "$QLOG"
  timeout "$t" python run.py --vectorized --isolate --methods "$m" \
      --datasets $gaps --seeds 10 --epochs 100 --no-debug "$@" \
      >> "$QLOG" 2>&1
  echo "[queue4] $(date +%T) $m stage exit=$? (landed columns are in" \
    "logs/run-*.txt regardless)" >> "$QLOG"
  return 0
}

echo "[queue4] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"

# pass 1 — cheap ODE columns first (minutes for whole columns), then the
# neural grind ordered thinnest-cells-first; per-method caps stop one slow
# method starving the rest of pass 1
stage insite 3600
stage sindy  3600
stage edct   5400      # has the only zero cells
stage gnet   5400
stage crn    5400
stage rmsn   5400
# ct last: decide standard-vs-vectorized by CPU-lane diagnostic; the
# vectorized path is used unless tools/ct_standard_path marker exists
if [ -f logs/markers/ct_standard_path ]; then
  echo "[queue4] $(date +%T) ct via standard path (marker set)" >> "$QLOG"
  gaps=$(python tools/seed_gaps.py --method ct --list)
  if [ -n "$gaps" ] && [ "$(budget 7200)" -gt 0 ]; then
    wait_tpu; t=$(budget 7200)
    [ "$t" -gt 0 ] && timeout "$t" python run.py --methods ct \
        --datasets $gaps --seeds 10 --epochs 100 --no-debug --isolate \
        >> "$QLOG" 2>&1
  fi
else
  stage ct 7200
fi

# passes 2+ — keep filling whatever is left until the deadline window
for pass in 2 3 4 5 6; do
  [ "$(budget 1200)" -eq 0 ] && break
  echo "[queue4] $(date +%T) pass $pass" >> "$QLOG"
  any=0
  for m in insite sindy edct gnet crn rmsn ct; do
    gaps=$(python tools/seed_gaps.py --method "$m" --list)
    [ -z "$gaps" ] && continue
    any=1
    stage "$m" 7200 || break 2
  done
  [ "$any" -eq 0 ] && { echo "[queue4] $(date +%T) ALL CELLS AT n=10" \
    >> "$QLOG"; break; }
done
echo "[queue4] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
