#!/bin/bash
# Round-3 CPU queue, part 3 (contingency coverage): if the axon tunnel
# stays down, fill every ZERO protocol cell of the neural main table at
# 1-2 seeds on the host backend so no (dataset, method) cell is empty.
# First stage re-measures edct at the reference-aligned benchmark
# hparams (commit aligning EDCTConfig with benchmark_hparams/edct.yaml).
# Cheapest methods first (rmsn ~5 min/run on the single host core,
# gnet/crn ~5-15, ct ~30). Every stage is superseded by the TPU queue's
# 10-seed vectorized columns (r2m_* markers) and is deadline-aware.
# Waits only for CPU queue 2 (msm/wsindy) — overlapping queue 1's long
# INSIGHT stages 2-way is acceptable, 3-way is not.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:-1787084400}   # 20:20 UTC, pre-bench margin
remaining() { echo $(( DEADLINE - $(date +%s) )); }
for i in $(seq 1 480); do
  q2=$(cat /tmp/queue_r3_cpu2.pid 2>/dev/null)
  { [ -z "$q2" ] || ! kill -0 "$q2" 2>/dev/null; } && break
  sleep 60
done
run_cells() {  # method seeds seed_start cap_s marker_suffix datasets...
  local m="$1" s="$2" ss="$3" cap="$4" suf="$5"; shift 5
  local marker="logs/markers/r3cpu3_${m}${suf}"
  [ -f "logs/markers/r2m_${m}" ] && return 0   # TPU column landed
  [ -f "$marker" ] && return 0
  local rem; rem=$(remaining)
  [ "$rem" -lt 900 ] && { echo "[cpu-queue3] $(date +%T) deadline; skip $m$suf"; return 0; }
  [ "$rem" -lt "$cap" ] && cap="$rem"
  echo "[cpu-queue3] $(date +%T) $m x${s} seeds from ${ss} (cpu, cap ${cap}s): $*"
  timeout "$cap" python run.py --platform cpu --methods "$m" \
    --datasets "$@" --seeds "$s" --seed-start "$ss" --epochs 100 \
    --no-debug && touch "$marker"
}
# edct re-measured at the reference benchmark hparams (the 11:32 rows ran
# the pre-alignment defaults)
run_cells edct 2 0 10800 _aligned EQ_4_D cancer_sim
# zero cells per the round-3 combined protocol table (PARITY.md)
run_cells rmsn 2 0 7200  ''       EQ_4_B EQ_4_C EQ_5_B EQ_5_D
run_cells gnet 2 0 10800 ''       EQ_4_B EQ_4_C EQ_4_D EQ_5_B EQ_5_D cancer_sim
run_cells crn  2 0 10800 ''       EQ_4_C EQ_5_B EQ_5_D
run_cells ct   1 0 7200  ''       EQ_4_C EQ_5_B EQ_5_D
# n=1 cells -> n>=2 if time remains (seed 1 only; seed 0 is banked)
run_cells crn  1 1 7200  _s1      EQ_4_B EQ_4_D cancer_sim
run_cells ct   1 1 7200  _s1      EQ_4_B cancer_sim
echo "[cpu-queue3] $(date +%T) DONE (remaining $(remaining)s)"
