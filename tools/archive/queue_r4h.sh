#!/bin/bash
# Round-4 endgame TPU queue, generation 7 — post-restart relaunch.
# The container restarted (logs/markers and all lanes died); the table
# state at relaunch (tools/seed_gaps.py): gnet needs vec columns on
# EQ_4_C (n=7), EQ_4_A / EQ_5_C / EQ_5_D (n=2); edct needs standard
# seeds everywhere (vectorized edct is quarantined: the decoder-stage
# stacked fit faults the v5e worker, isolated by elimination —
# commit 2243234).
# Order: complete-cheapest-cell-first for gnet (vec columns, warm
# .jax_cache), then hand off to the gen-4 unified thinnest-cell loop
# (queue_r4e.sh) which fills edct std chunks until the rolling deadline
# (logs/markers/deadline_r4, kept fresh by deadline_extender.sh while
# the driver heartbeat lives) runs out.
# Tunnel discipline (ADVICE r3): single instance lock, serial dispatch,
# budget computed at dispatch time, capped at remaining-600 so the
# driver's end-of-round bench gets the tunnel 10 min early; own log.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE epoch}
QLOG=logs/queue_r4h.log

LOCK=/tmp/queue_r4h.lock
if ! mkdir "$LOCK" 2>/dev/null; then
  echo "[queue4h] $(date +%T) another instance holds $LOCK; exiting" \
    >> "$QLOG"
  exit 1
fi
trap 'rmdir "$LOCK" 2>/dev/null; kill $(jobs -p) 2>/dev/null; \
  pkill -TERM -P $$ 2>/dev/null; exit 0' TERM INT EXIT

remaining() {
  local d
  d=$(cat logs/markers/deadline_r4 2>/dev/null || echo "$DEADLINE")
  echo $(( d - $(date +%s) ))
}
budget() {  # min(cap, remaining-600), floored at 0
  local cap="$1" rem; rem=$(( $(remaining) - 600 ))
  [ "$rem" -le 0 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}

echo "[queue4h] $(date +%T) start (remaining $(remaining)s)" >> "$QLOG"

stage() {  # stage <cap> <desc...> -- <run.py args...>
  local cap="$1"; shift
  local desc="" a
  while [ "$1" != "--" ]; do desc="$desc $1"; shift; done; shift
  local t; t=$(budget "$cap")
  [ "$t" -eq 0 ] && { echo "[queue4h] $(date +%T) SKIP$desc (deadline)" \
    >> "$QLOG"; return 1; }
  echo "[queue4h] $(date +%T) RUN$desc (budget ${t}s)" >> "$QLOG"
  timeout "$t" python run.py "$@" --epochs 100 --no-debug >> "$QLOG" 2>&1
  echo "[queue4h] $(date +%T) DONE$desc exit=$?" >> "$QLOG"
}

# gnet: one vec column completes each cell; EQ_4_C first (n=7, the
# cheapest completion), then the n=2 cells; the EQ_5_C/EQ_5_D pair
# shares shapes so one process amortizes the compile.
stage 1800 vec gnet EQ_4_C -- \
  --vectorized --isolate --methods gnet --datasets EQ_4_C --seeds 10
stage 1800 vec gnet EQ_4_A -- \
  --vectorized --isolate --methods gnet --datasets EQ_4_A --seeds 10
stage 2700 vec gnet EQ_5_C EQ_5_D -- \
  --vectorized --isolate --methods gnet --datasets EQ_5_C EQ_5_D --seeds 10

# hand the rest of the window to the unified thinnest-cell loop (edct
# std fills; gnet cells, if any remain, re-dispatch vec there too)
echo "[queue4h] $(date +%T) handing off to queue_r4e loop" >> "$QLOG"
rmdir "$LOCK" 2>/dev/null
trap - EXIT
QUEUE_DEADLINE="$DEADLINE" exec bash tools/queue_r4e.sh
