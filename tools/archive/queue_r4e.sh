#!/bin/bash
# Round-4 endgame TPU queue, generation 4 — the unified thinnest-cell
# loop. Instead of method-serial stages (which starve whatever method is
# last when the deadline hits), every iteration asks
# `tools/seed_gaps.py --next-cell` for the globally thinnest incomplete
# main-table cell across ALL methods and dispatches just that cell:
#   * mode=vec: one 10-seed vectorized column (run.py --vectorized).
#     If the column lands NO new seeds (TPU worker fault — what edct's
#     vectorized columns do), the method is auto-quarantined into
#     logs/markers/vectorized_exclude and its cells continue standard.
#   * mode=std: up to 3 standard per-seed runs (spreads evidence across
#     thin cells before topping any one up).
# Tunnel discipline: WAIT_PIDS process gate before the first dispatch
# (the jax.devices() probe is NOT a mutex), serial dispatch after, every
# budget capped at remaining-600 so the tunnel frees 10 min before the
# driver's end-of-round bench. TERM/INT kills the whole child tree (the
# gen-2 lesson: a pipeline subshell survives its controller).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4e.log

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
count_cell() {  # current protocol seed count of (method, dataset)
  python - "$1" "$2" <<'EOF'
import sys, importlib.util
spec = importlib.util.spec_from_file_location('sg', 'tools/seed_gaps.py')
sg = importlib.util.module_from_spec(spec); spec.loader.exec_module(sg)
df = sg.protocol_df()
m, ds = sys.argv[1], sys.argv[2]
if df.empty:
    print(0)
else:
    sub = df[(df.method_name == m) & (df.dataset_name == ds)]
    print(int(sub.seed.nunique()))
EOF
}

echo "[queue4e] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"

for pid in ${WAIT_PIDS:-}; do
  while kill -0 "$pid" 2>/dev/null; do
    echo "[queue4e] $(date +%T) waiting for prior TPU lane pid $pid" \
      >> "$QLOG"
    sleep 20
  done
  echo "[queue4e] $(date +%T) prior TPU lane pid $pid exited" >> "$QLOG"
done

while :; do
  [ "$(budget 600)" -eq 0 ] && { echo "[queue4e] $(date +%T) deadline" \
    "window reached" >> "$QLOG"; break; }
  line=$(python tools/seed_gaps.py --next-cell)
  [ -z "$line" ] && { echo "[queue4e] $(date +%T) ALL CELLS AT n=10" \
    >> "$QLOG"; break; }
  set -- $line; m=$1; ds=$2; n=$3; mode=$4; start=$5; k=$6
  if [ "$mode" = vec ]; then
    t=$(budget 2700)
    [ "$t" -eq 0 ] && break
    echo "[queue4e] $(date +%T) vec $m $ds (n=$n, budget ${t}s)" >> "$QLOG"
    timeout "$t" python run.py --vectorized --isolate --methods "$m" \
        --datasets "$ds" --seeds 10 --epochs 100 --no-debug \
        >> "$QLOG" 2>&1
    rc=$?
    after=$(count_cell "$m" "$ds")
    echo "[queue4e] $(date +%T) vec $m $ds exit=$rc n: $n -> $after" \
      >> "$QLOG"
    if [ "$after" -le "$n" ] && [ "$rc" -ne 124 ]; then
      echo "$m" >> logs/markers/vectorized_exclude
      echo "[queue4e] $(date +%T) QUARANTINE $m: vectorized column" \
        "landed nothing (exit $rc); switching to standard path" >> "$QLOG"
    fi
  else
    # chunk cap 8 (was 3): with only one method left in the table the
    # per-dispatch tunnel stall (50-300 s) dominates breadth-first's
    # value; one dispatch per cell amortizes it. Rows are logged per
    # seed, so a timeout mid-chunk keeps every completed seed.
    [ "$k" -gt 8 ] && k=8
    t=$(budget 2100)
    [ "$t" -eq 0 ] && break
    echo "[queue4e] $(date +%T) std $m $ds seeds $start+$k (n=$n," \
      "budget ${t}s)" >> "$QLOG"
    # no --isolate here: the remote tunnel charges a 50-300 s stall to
    # every fresh process's first heavy transfer, so per-seed subprocess
    # isolation triples the chunk's overhead; --no-debug is the fault
    # wall (a crashed seed becomes an errored row, the chunk continues)
    timeout "$t" python run.py --methods "$m" --datasets "$ds" \
        --seed-start "$start" --seeds "$k" --epochs 100 --no-debug \
        >> "$QLOG" 2>&1
    rc=$?
    after=$(count_cell "$m" "$ds")
    echo "[queue4e] $(date +%T) std $m $ds exit=$rc n: $n -> $after" \
      >> "$QLOG"
    if [ "$after" -le "$n" ]; then
      # standard path landed nothing either — park the cell so the loop
      # can't spin on it (cells are re-armed by deleting the marker)
      echo "[queue4e] $(date +%T) cell $m/$ds parked (no progress on" \
        "either path)" >> "$QLOG"
      mkdir -p logs/markers/parked && touch "logs/markers/parked/$m.$ds"
    fi
  fi
done
echo "[queue4e] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
