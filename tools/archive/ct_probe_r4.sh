#!/bin/bash
# One-shot round-4 probe: 10-seed vectorized CT columns on EQ_4_D +
# cancer_sim, to re-measure the round-2 "unstable basin" finding against
# the CURRENT code (standard-parity cohorts + torch-parity init landed
# since). Waits for the single-client tunnel like the main queue does.
set -u
cd "$(dirname "$0")/.."
QLOG=logs/ct_probe_r4.log
until timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  echo "[ct_probe] $(date +%T) tunnel busy; waiting" >> "$QLOG"
  sleep 45
done
echo "[ct_probe] $(date +%T) start" >> "$QLOG"
timeout 4800 python run.py --vectorized --isolate --methods ct \
  --datasets EQ_4_D cancer_sim --seeds 10 --epochs 100 --no-debug \
  >> "$QLOG" 2>&1
echo "[ct_probe] $(date +%T) done exit=$?" >> "$QLOG"
