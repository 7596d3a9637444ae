#!/bin/bash
# Round-4 endgame TPU queue, generation 6 — cheapest-complete-cell-first.
# Replaces gen 5's tail: with <1h of tunnel left, two ~25-min gnet
# stages would finish 2 cells while the same window fits 3-4 cheaper
# ones. Order (each stage completes one or two whole main-table cells):
#   1. vec insite EQ_4_D  (~5 min; flagship row's last open cell —
#      protocol seeds 7/8 never landed, the gen-5 std stage was starved
#      by a duplicate queue instance holding the tunnel)
#   2. std ct+crn EQ_4_D seeds 5-6 on TPU (~12 min): today's CPU-lane
#      rows for these seeds landed in a diverged training basin
#      (ct 3.1/3.1, crn 10.3/10.6 6-step) and, being newest, shadow the
#      cells — the parked-marker "platform-sensitive basin" case. A TPU
#      re-measure lets newest-wins dedup adjudicate with the platform
#      the table is claimed on.
#   3. vec ct  EQ_4_C     (~15 min; completes the entire ct row, retires
#      the 39-min/seed CPU fallback lane)
#   4. vec rmsn cancer_sim (~15 min; completes the rmsn row)
#   5. vec gnet EQ_5_C EQ_5_D (shape-identical pair, one process)
#   6. vec gnet EQ_4_C       (at n=7, one column completes it)
#   7. vec gnet EQ_4_A EQ_4_B
# Tunnel discipline (ADVICE r3): single instance (PID file + lock),
# serial dispatch, budgets computed AFTER the prior stage frees the
# tunnel, every budget capped at remaining-600 so the driver's
# end-of-round bench gets the tunnel 10 min before the deadline.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4g.log

# single-instance lock: a second launch exits instead of double-
# dispatching to the single-client tunnel (the gen-5 failure mode)
LOCK=/tmp/queue_r4g.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "[queue4g] $(date +%T) another instance holds $LOCK; exiting" \
    >> "$QLOG"
  exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null; kill $(jobs -p) 2>/dev/null; \
  pkill -TERM -P $$ 2>/dev/null; exit 0' TERM INT EXIT

remaining() { echo $(( DEADLINE - $(date +%s) )); }
budget() {  # min(cap, remaining-600), floored at 0
  local cap="$1" rem; rem=$(( $(remaining) - 600 ))
  [ "$rem" -le 0 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}

echo "[queue4g] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"
for pid in ${WAIT_PIDS:-}; do
  while kill -0 "$pid" 2>/dev/null; do sleep 15; done
  echo "[queue4g] $(date +%T) prior TPU lane pid $pid exited" >> "$QLOG"
done

stage() {  # stage <cap> <desc...> -- <run.py args...>
  local cap="$1"; shift
  local desc="" a
  while [ "$1" != "--" ]; do desc="$desc $1"; shift; done; shift
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4g] $(date +%T) SKIP$desc (deadline)" \
    >> "$QLOG"; return 1; }
  echo "[queue4g] $(date +%T) RUN$desc (budget ${t}s)" >> "$QLOG"
  timeout "$t" python run.py "$@" --epochs 100 --no-debug >> "$QLOG" 2>&1
  echo "[queue4g] $(date +%T) DONE$desc exit=$?" >> "$QLOG"
}

stage 900 vec insite EQ_4_D -- \
  --vectorized --methods insite --datasets EQ_4_D --seeds 10
stage 900 std ct EQ_4_D s5-6 -- \
  --methods ct --datasets EQ_4_D --seed-start 5 --seeds 2
stage 600 std crn EQ_4_D s5-6 -- \
  --methods crn --datasets EQ_4_D --seed-start 5 --seeds 2
stage 1500 vec ct EQ_4_C -- \
  --vectorized --isolate --methods ct --datasets EQ_4_C --seeds 10
stage 1500 vec rmsn cancer_sim -- \
  --vectorized --isolate --methods rmsn --datasets cancer_sim --seeds 10
stage 3000 vec gnet EQ_5_C EQ_5_D -- \
  --vectorized --isolate --methods gnet --datasets EQ_5_C EQ_5_D --seeds 10
stage 1800 vec gnet EQ_4_C -- \
  --vectorized --isolate --methods gnet --datasets EQ_4_C --seeds 10
stage 3000 vec gnet EQ_4_A EQ_4_B -- \
  --vectorized --isolate --methods gnet --datasets EQ_4_A EQ_4_B --seeds 10
echo "[queue4g] $(date +%T) DONE (remaining $(remaining)s)" >> "$QLOG"
