#!/bin/bash
# Round-3 CPU queue, part 2: complete the msm and wsindy main-table
# columns at protocol strength (10 seeds) on the host backend — both are
# cheap after the dense-MSM rewrite (~15-30 s/run incl. collection).
# Waits for queue 1's edct stage so the single host core isn't split.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
for i in $(seq 1 480); do
  [ -f logs/markers/r3cpu_edct ] && break
  sleep 60
done
if [ ! -f logs/markers/r2m_msm ] && [ ! -f logs/markers/r3cpu_msm10 ]; then
  echo "[cpu-queue2] $(date +%T) msm x10 seeds x9 datasets (cpu)"
  timeout 28800 python run.py --platform cpu --methods msm \
    --datasets cancer_sim EQ_5_A EQ_5_B EQ_5_C EQ_5_D EQ_4_A EQ_4_B \
    EQ_4_C EQ_4_D --seeds 10 --epochs 100 --no-debug \
    && touch logs/markers/r3cpu_msm10
fi
if [ ! -f logs/markers/r2m_wsindy ] && \
   [ ! -f logs/markers/r3cpu_wsindy10 ]; then
  echo "[cpu-queue2] $(date +%T) wsindy x10 seeds EQ_4 (cpu)"
  timeout 14400 python run.py --platform cpu --methods wsindy \
    --datasets EQ_4_A EQ_4_B EQ_4_C EQ_4_D --seeds 10 --epochs 100 \
    --no-debug && touch logs/markers/r3cpu_wsindy10
fi
echo "[cpu-queue2] $(date +%T) DONE"
