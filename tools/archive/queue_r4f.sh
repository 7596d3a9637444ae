#!/bin/bash
# Round-4 endgame TPU queue, generation 5 — the TARGETED close-out.
# With ~2h of tunnel left, the thinnest-first loop (gen 4) would spread
# k<=3 std chunks across every n<=2 cell and finish none of them. This
# script instead dispatches the exact cells that can still REACH n=10,
# cheapest-per-cell first, batching shape-identical datasets into one
# process so XLA compile reuse + the per-process tunnel stall (50-300 s)
# are amortized:
#   1. insite EQ_4_D seed 9 (flagship table completion, ~4 min)
#   2. vec ct  EQ_5_B EQ_5_C EQ_4_A EQ_4_B EQ_4_C  (~10 min/col, proven)
#   3. vec rmsn EQ_4_C                              (~20 min/col, proven)
#   4. vec gnet EQ_5_C EQ_5_D                       (~22 min/col, proven)
#   5. leftovers if time remains: vec gnet EQ_4_A EQ_4_B, rmsn cancer_sim
# edct stays quarantined (its 10-seed stacked eval faults the TPU worker;
# the reference ships no edct rows, so own-standing n>=2 cells already
# exceed its evidence).
# Tunnel discipline: PID-gate on the gen-4 queue, serial dispatch, every
# budget capped at remaining-600 so the tunnel frees 10 min before the
# driver's end-of-round bench.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4f.log

trap 'kill $(jobs -p) 2>/dev/null; pkill -TERM -P $$ 2>/dev/null; exit 0' TERM INT

remaining() { echo $(( DEADLINE - $(date +%s) )); }
budget() {  # min(cap, remaining-600), floored at 0
  local cap="$1" rem; rem=$(( $(remaining) - 600 ))
  [ "$rem" -le 0 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}

echo "[queue4f] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"
for pid in ${WAIT_PIDS:-}; do
  while kill -0 "$pid" 2>/dev/null; do sleep 15; done
  echo "[queue4f] $(date +%T) prior TPU lane pid $pid exited" >> "$QLOG"
done

stage() {  # stage <cap> <desc...> -- <run.py args...>
  local cap="$1"; shift
  local desc="" a
  while [ "$1" != "--" ]; do desc="$desc $1"; shift; done; shift
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4f] $(date +%T) SKIP$desc (deadline)" \
    >> "$QLOG"; return 1; }
  echo "[queue4f] $(date +%T) RUN$desc (budget ${t}s)" >> "$QLOG"
  timeout "$t" python run.py "$@" --epochs 100 --no-debug >> "$QLOG" 2>&1
  echo "[queue4f] $(date +%T) DONE$desc exit=$?" >> "$QLOG"
}

stage 1500 std insite EQ_4_D s6-9 -- \
  --methods insite --datasets EQ_4_D --seed-start 6 --seeds 4
stage 3600 vec ct EQ_5_B EQ_5_C EQ_4_A EQ_4_B EQ_4_C -- \
  --vectorized --isolate --methods ct \
  --datasets EQ_5_B EQ_5_C EQ_4_A EQ_4_B EQ_4_C --seeds 10
stage 1800 vec rmsn EQ_4_C -- \
  --vectorized --isolate --methods rmsn --datasets EQ_4_C --seeds 10
stage 3300 vec gnet EQ_5_C EQ_5_D -- \
  --vectorized --isolate --methods gnet --datasets EQ_5_C EQ_5_D --seeds 10
stage 3300 vec gnet EQ_4_A EQ_4_B -- \
  --vectorized --isolate --methods gnet --datasets EQ_4_A EQ_4_B --seeds 10
stage 1500 vec rmsn cancer_sim -- \
  --vectorized --isolate --methods rmsn --datasets cancer_sim --seeds 10
echo "[queue4f] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
