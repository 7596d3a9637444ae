#!/bin/bash
# Round-4 endgame TPU queue — replaces queue_r4_tpu.sh's pass-2+ loop
# with what this round actually taught us:
#   * vectorized edct columns fault the TPU worker ("TPU worker process
#     crashed or restarted", logs/queue_r4_tpu.log 10:59-12:29 on
#     EQ_5_B / EQ_5_D / EQ_4_B, still failing after the chunk-cap fix),
#     so edct's zero cells are filled via the STANDARD per-seed path on
#     TPU (~200-440 s/seed, r3 evidence) and edct never enters a
#     vectorized stage here (also quarantined via
#     logs/markers/vectorized_exclude for any other queue).
#   * insite EQ_4_D's 10:24 vectorized failure coincided with the
#     ct-probe tunnel collision (ct_probe_r4.log 10:23-10:27) — it is
#     retried vectorized first, as the cheapest highest-value cell.
# Budget discipline (ADVICE r3): stage budgets are computed AFTER
# wait_tpu returns and capped at remaining-600 s, so the single-client
# tunnel is guaranteed free 10 min before the driver's end-of-round
# bench.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4c.log

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
    echo "[queue4c] $(date +%T) tunnel busy (try $tries); waiting" >> "$QLOG"
    [ "$(remaining)" -lt 700 ] && { echo "[queue4c] deadline while waiting" \
      >> "$QLOG"; exit 0; }
    sleep 30
  done
}
# vec_stage <method> <cap-seconds>
vec_stage() {
  local m="$1" cap="$2"
  local gaps
  gaps=$(python tools/seed_gaps.py --method "$m" --list) || return 0
  [ -z "$gaps" ] && { echo "[queue4c] $(date +%T) $m: no gaps" >> "$QLOG";
                      return 0; }
  [ "$(budget "$cap")" -eq 0 ] && { echo "[queue4c] $(date +%T) deadline;" \
    "skip $m" >> "$QLOG"; return 1; }
  wait_tpu
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4c] $(date +%T) deadline after wait;" \
    "skip $m" >> "$QLOG"; return 1; }
  echo "[queue4c] $(date +%T) vectorized $m (budget ${t}s): $gaps" >> "$QLOG"
  timeout "$t" python run.py --vectorized --isolate --methods "$m" \
      --datasets $gaps --seeds 10 --epochs 100 --no-debug \
      >> "$QLOG" 2>&1
  echo "[queue4c] $(date +%T) $m stage exit=$?" >> "$QLOG"
  return 0
}
# std_fill <method> <max-seeds-per-cell> <cap-seconds-per-cell> <total-cap>
#   standard per-seed runs over the method's missing-seed plan (plan is
#   thinnest-cells-first), at most max-seeds per cell per visit so the
#   evidence spreads across cells before any one cell is topped up; the
#   whole stage stops at total-cap seconds
std_fill() {
  local m="$1" maxk="$2" cap="$3" total="$4"
  local stage_end=$(( $(date +%s) + total ))
  python tools/seed_gaps.py --method "$m" --plan | while read -r ds start k; do
    [ -z "${ds:-}" ] && continue
    [ "$(date +%s)" -ge "$stage_end" ] && { echo "[queue4c] $(date +%T)" \
      "$m std fill: stage budget spent" >> "$QLOG"; return 0; }
    [ "$k" -gt "$maxk" ] && k="$maxk"
    [ "$(budget "$cap")" -eq 0 ] && { echo "[queue4c] $(date +%T)" \
      "deadline; stop $m std fill" >> "$QLOG"; return 1; }
    wait_tpu
    local t; t=$(budget "$cap")
    [ "$t" -eq 0 ] && return 1
    local left=$(( stage_end - $(date +%s) ))
    [ "$left" -lt "$t" ] && t="$left"
    [ "$t" -le 0 ] && return 0
    echo "[queue4c] $(date +%T) standard $m $ds seeds $start+$k" \
      "(budget ${t}s)" >> "$QLOG"
    timeout "$t" python run.py --isolate --methods "$m" --datasets "$ds" \
        --seed-start "$start" --seeds "$k" --epochs 100 --no-debug \
        >> "$QLOG" 2>&1
    echo "[queue4c] $(date +%T) $m $ds exit=$?" >> "$QLOG"
  done
}

echo "[queue4c] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"

# process-level gate: the jax.devices() probe in wait_tpu is NOT a
# reliable mutex — it can succeed while another sweep holds the tunnel
# (that race killed two columns at 10:23-10:27, and nearly recurred at
# 15:19). If WAIT_PID names a still-running prior TPU-lane process, hold
# here until it exits; after that this queue is the only TPU client.
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    echo "[queue4c] $(date +%T) waiting for prior TPU lane pid $WAIT_PID" \
      >> "$QLOG"
    sleep 20
  done
  echo "[queue4c] $(date +%T) prior TPU lane exited" >> "$QLOG"
fi

# 1. flagship cell retry: vectorized insite EQ_4_D (~4 min)
vec_stage insite 1200
# 2. edct zero cells via the standard path: 3 seeds per cell, ~1 h total
#    (plan is thinnest-first, so the four n=0 cells come before top-ups)
std_fill edct 3 1500 4200
# 3-5. the neural grind, thinnest columns first inside each stage
vec_stage ct   5400
vec_stage gnet 7200
vec_stage rmsn 2700
# passes: keep filling until the deadline window (edct stays standard)
for pass in 2 3 4; do
  [ "$(budget 1200)" -eq 0 ] && break
  echo "[queue4c] $(date +%T) pass $pass" >> "$QLOG"
  any=0
  for m in insite sindy crn gnet rmsn ct; do
    gaps=$(python tools/seed_gaps.py --method "$m" --list)
    [ -z "$gaps" ] && continue
    any=1
    vec_stage "$m" 5400 || break 2
  done
  std_fill edct 2 1500 3600 || break
  [ -n "$(python tools/seed_gaps.py --method edct --plan)" ] && any=1
  [ "$any" -eq 0 ] && { echo "[queue4c] $(date +%T) ALL CELLS AT n=10" \
    >> "$QLOG"; break; }
done
echo "[queue4c] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
