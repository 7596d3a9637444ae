#!/bin/bash
# Round-3 CPU evidence queue: re-runs that resolve VERDICT r2's
# contradictory PARITY cells with CURRENT code, on the host backend
# (safe while the axon tunnel is down / held by the TPU queue).
#
# 1. EQ_5_D insite+sindy standard-path, 5 seeds: the old 2-seed rows
#    (logs/run-20260817-080249.txt, 08:43) predate the y_clip +
#    cf-row-validity fix (commit 8a313ef, 09:54) — seed 0's 6-step blew
#    up to 2.92 on a diverging arm-3 rollout the fix now bounds.
# 2. EQ_4_D rmsn, 10 seeds at the SHIPPED defaults (sw_mode=likelihood,
#    enc_epoch_mult=3): the red n=10 protocol row was measured in the
#    retired score_ratio parity mode.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
if [ ! -f logs/markers/r3cpu_eq5d_ode ]; then
  echo "[cpu-queue] $(date +%T) EQ_5_D insite+sindy x5 seeds (cpu)"
  timeout 14400 python run.py --platform cpu --methods insite sindy \
    --datasets EQ_5_D --seeds 5 --no-debug \
    && touch logs/markers/r3cpu_eq5d_ode
fi
# rmsn on the single host core is hours; only run it as the fallback if
# the TPU protocol queue (vectorized 10-seed rmsn column) hasn't landed
if [ ! -f logs/markers/r2m_rmsn ] && [ ! -f logs/markers/r3cpu_eq4d_rmsn ]
then
  echo "[cpu-queue] $(date +%T) EQ_4_D rmsn x5 seeds (cpu, shipped defaults)"
  timeout 43200 python run.py --platform cpu --methods rmsn \
    --datasets EQ_4_D --seeds 5 --epochs 100 --no-debug \
    && touch logs/markers/r3cpu_eq4d_rmsn
fi
# edct has ZERO protocol rows; 2 CPU seeds on the two headline datasets
# as a stopgap if the TPU queue's 10-seed edct column hasn't landed
if [ ! -f logs/markers/r2m_edct ] && [ ! -f logs/markers/r3cpu_edct ]; then
  echo "[cpu-queue] $(date +%T) EQ_4_D+cancer edct x2 seeds (cpu)"
  timeout 43200 python run.py --platform cpu --methods edct \
    --datasets EQ_4_D cancer_sim --seeds 2 --epochs 100 --no-debug \
    && touch logs/markers/r3cpu_edct
fi
# 10-seed INSIGHT grids (insite/sindy, EQ_4) as the last CPU fallback if
# the TPU queue never lands them this round
if [ ! -f logs/markers/r2m_insight_noise ] && \
   [ ! -f logs/markers/r3cpu_insight_noise ]; then
  echo "[cpu-queue] $(date +%T) INSIGHT_NOISE x10 seeds (cpu)"
  timeout 43200 python run.py --platform cpu --vectorized \
    --experiment INSIGHT_NOISE --methods insite sindy --seeds 10 \
    --no-debug && touch logs/markers/r3cpu_insight_noise
fi
if [ ! -f logs/markers/r2m_insight_less ] && \
   [ ! -f logs/markers/r3cpu_insight_less ]; then
  echo "[cpu-queue] $(date +%T) INSIGHT_LESS_SAMPLES x10 seeds (cpu)"
  timeout 43200 python run.py --platform cpu --vectorized \
    --experiment INSIGHT_LESS_SAMPLES --methods insite sindy --seeds 10 \
    --no-debug && touch logs/markers/r3cpu_insight_less
fi
echo "[cpu-queue] $(date +%T) DONE"
