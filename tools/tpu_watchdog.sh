#!/bin/bash
# Probe the axon tunnel every 10 min (short, gentle probes); when it
# answers, relaunch the protocol queue and exit. DEADLINE-bounded: the
# tunnel serves ONE client, so probing must stop well before the
# driver's end-of-round bench needs it.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${WATCHDOG_DEADLINE:-1787127000}   # 08:10 UTC Aug 19
while true; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[watchdog] $(date +%T) deadline; stopping probes (leave the" \
      "tunnel free for the driver bench)" >> logs/queue_r2.log
    exit 0
  fi
  if timeout 360 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watchdog] $(date +%T) tunnel back; starting queue" >> logs/queue_r2.log
    nohup bash tools/queue_r2_protocol.sh > /dev/null 2>&1 &
    echo $! > /tmp/queue_r2.pid
    exit 0
  fi
  echo "[watchdog] $(date +%T) tunnel still down" >> logs/queue_r2.log
  sleep 600
done
