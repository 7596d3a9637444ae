#!/bin/bash
# Round-4 endgame TPU queue, generation 3. Generation 2 (queue_r4c.sh)
# taught two lessons on top of the morning's:
#   * killing the controller does NOT kill a std_fill pipeline subshell —
#     it orphans and keeps dispatching (pid 872 ran the edct fill alone);
#     hence the TERM/INT trap below kills the whole child tree.
#   * the jax.devices() probe is not a mutex; the only safe handover is
#     the WAIT_PID process gate.
# Stage order here assumes the orphaned gen-2 std_fill already covered
# the first-pass edct zero cells; edct top-ups happen in the pass loop.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4d.log

trap 'kill $(jobs -p) 2>/dev/null; pkill -TERM -P $$ 2>/dev/null; exit 0' TERM INT

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
    echo "[queue4d] $(date +%T) tunnel busy (try $tries); waiting" >> "$QLOG"
    [ "$(remaining)" -lt 700 ] && { echo "[queue4d] deadline while waiting" \
      >> "$QLOG"; exit 0; }
    sleep 30
  done
}
vec_stage() {
  local m="$1" cap="$2"
  local gaps
  gaps=$(python tools/seed_gaps.py --method "$m" --list) || return 0
  [ -z "$gaps" ] && { echo "[queue4d] $(date +%T) $m: no gaps" >> "$QLOG";
                      return 0; }
  [ "$(budget "$cap")" -eq 0 ] && { echo "[queue4d] $(date +%T) deadline;" \
    "skip $m" >> "$QLOG"; return 1; }
  wait_tpu
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4d] $(date +%T) deadline after wait;" \
    "skip $m" >> "$QLOG"; return 1; }
  echo "[queue4d] $(date +%T) vectorized $m (budget ${t}s): $gaps" >> "$QLOG"
  timeout "$t" python run.py --vectorized --isolate --methods "$m" \
      --datasets $gaps --seeds 10 --epochs 100 --no-debug \
      >> "$QLOG" 2>&1
  echo "[queue4d] $(date +%T) $m stage exit=$?" >> "$QLOG"
  return 0
}
# std_fill <method> <max-seeds-per-cell> <cap-per-cell> <total-cap>
# NOTE: plan lines are read into an array first — no pipeline subshell,
# so the loop dies with the controller and budget state is shared.
std_fill() {
  local m="$1" maxk="$2" cap="$3" total="$4"
  local stage_end=$(( $(date +%s) + total ))
  local lines=() ds start k t left
  mapfile -t lines < <(python tools/seed_gaps.py --method "$m" --plan)
  for line in "${lines[@]}"; do
    [ -z "$line" ] && continue
    set -- $line; ds=$1; start=$2; k=$3
    [ "$(date +%s)" -ge "$stage_end" ] && { echo "[queue4d] $(date +%T)" \
      "$m std fill: stage budget spent" >> "$QLOG"; return 0; }
    [ "$k" -gt "$maxk" ] && k="$maxk"
    [ "$(budget "$cap")" -eq 0 ] && { echo "[queue4d] $(date +%T)" \
      "deadline; stop $m std fill" >> "$QLOG"; return 1; }
    wait_tpu
    t=$(budget "$cap")
    [ "$t" -eq 0 ] && return 1
    left=$(( stage_end - $(date +%s) ))
    [ "$left" -lt "$t" ] && t="$left"
    [ "$t" -le 0 ] && return 0
    echo "[queue4d] $(date +%T) standard $m $ds seeds $start+$k" \
      "(budget ${t}s)" >> "$QLOG"
    timeout "$t" python run.py --isolate --methods "$m" --datasets "$ds" \
        --seed-start "$start" --seeds "$k" --epochs 100 --no-debug \
        >> "$QLOG" 2>&1
    echo "[queue4d] $(date +%T) $m $ds exit=$?" >> "$QLOG"
  done
}

echo "[queue4d] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    echo "[queue4d] $(date +%T) waiting for prior TPU lane pid $WAIT_PID" \
      >> "$QLOG"
    sleep 20
  done
  echo "[queue4d] $(date +%T) prior TPU lane exited" >> "$QLOG"
fi

# flagship cell retry first, then the neural grind thinnest-columns-first
vec_stage insite 1200
vec_stage ct   5400
vec_stage gnet 7200
vec_stage rmsn 2700
for pass in 2 3 4; do
  [ "$(budget 1200)" -eq 0 ] && break
  echo "[queue4d] $(date +%T) pass $pass" >> "$QLOG"
  any=0
  for m in insite sindy crn gnet rmsn ct; do
    gaps=$(python tools/seed_gaps.py --method "$m" --list)
    [ -z "$gaps" ] && continue
    any=1
    vec_stage "$m" 5400 || break 2
  done
  std_fill edct 3 1500 3600 || break
  [ -n "$(python tools/seed_gaps.py --method edct --plan | head -1)" ] && any=1
  [ "$any" -eq 0 ] && { echo "[queue4d] $(date +%T) ALL CELLS AT n=10" \
    >> "$QLOG"; break; }
done
echo "[queue4d] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
