#!/bin/bash
# Probe the axon tunnel every 10 min (short, gentle probes); when it
# answers, relaunch the protocol queue and exit.
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 360 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[watchdog] $(date +%T) tunnel back; starting queue" >> logs/queue_r2.log
    nohup bash tools/queue_r2_protocol.sh > /dev/null 2>&1 &
    echo $! > /tmp/queue_r2.pid
    exit 0
  fi
  echo "[watchdog] $(date +%T) tunnel still down" >> logs/queue_r2.log
  sleep 600
done
