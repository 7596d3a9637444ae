#!/bin/bash
# Dead-man's-switch deadline extender for the endgame TPU queue.
# The round's true end time is unknowable from inside the session, but
# the driver appends a heartbeat to PROGRESS.jsonl every ~15 min while
# the round is alive. While that heartbeat stays fresh, keep rolling
# logs/markers/deadline_r4 forward in SHORT steps (now + 2700 s) so
#   * queue_r4e.sh keeps dispatching with budgets that fit a cold
#     vectorized neural column (~15-25 min incl. compile + stall), and
#   * every stage budget stays <= 2100 s (queue budgets are
#     remaining-600), which means the driver's end-of-round bench —
#     which probes the tunnel for up to BENCH_WAIT_S=2700 s (bench.py
#     default, sized to this cap) — can never be starved into its CPU
#     fallback by a long-running stage.
# When the heartbeat goes stale (round over, driver judging), stop
# extending: the queue winds down within ~25 min and frees the tunnel.
set -u
cd "$(dirname "$0")/.."
HARD_CAP=${HARD_CAP:-$(( $(date +%s) + 21600 ))}   # absolute stop: +6 h
STALE_S=${STALE_S:-1500}
while :; do
  now=$(date +%s)
  [ "$now" -ge "$HARD_CAP" ] && { echo "[extender] $(date +%T) hard cap" \
    >> logs/queue_r4e.log; exit 0; }
  hb=$(stat -c %Y PROGRESS.jsonl 2>/dev/null || echo 0)
  if [ $(( now - hb )) -lt "$STALE_S" ]; then
    cur=$(cat logs/markers/deadline_r4 2>/dev/null || echo 0)
    new=$(( now + 2700 ))
    if [ "$new" -gt "$cur" ]; then
      echo "$new" > logs/markers/deadline_r4
    fi
  else
    echo "[extender] $(date +%T) heartbeat stale ($(( now - hb ))s);" \
      "not extending" >> logs/queue_r4e.log
  fi
  sleep 300
done
