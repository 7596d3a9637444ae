#!/bin/bash
# Round-3 CPU queue, part 3 (contingency coverage): if the axon tunnel
# stays down, fill every ZERO protocol cell of the neural main table at
# 1-2 seeds on the host backend so no (dataset, method) cell is empty.
# Cheapest methods first (rmsn ~5 min/run on the single host core,
# gnet/crn ~5-15, ct ~30). Every stage is superseded by the TPU queue's
# 10-seed vectorized columns (r2m_* markers) and is deadline-aware.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:-1787084400}   # 20:20 UTC, pre-bench margin
remaining() { echo $(( DEADLINE - $(date +%s) )); }
# wait for queues 1+2 (the single core shouldn't be split three ways)
for i in $(seq 1 480); do
  q1=$(cat /tmp/queue_r3_cpu.pid 2>/dev/null)
  q2=$(cat /tmp/queue_r3_cpu2.pid 2>/dev/null)
  alive=0
  [ -n "$q1" ] && kill -0 "$q1" 2>/dev/null && alive=1
  [ -n "$q2" ] && kill -0 "$q2" 2>/dev/null && alive=1
  [ "$alive" -eq 0 ] && break
  sleep 60
done
run_cells() {  # method seeds seed_start cap_s datasets...
  local m="$1" s="$2" ss="$3" cap="$4"; shift 4
  local marker="logs/markers/r3cpu3_${m}"
  [ -f "logs/markers/r2m_${m}" ] && return 0   # TPU column landed
  [ -f "$marker" ] && return 0
  local rem; rem=$(remaining)
  [ "$rem" -lt 900 ] && { echo "[cpu-queue3] $(date +%T) deadline; skip $m"; return 0; }
  [ "$rem" -lt "$cap" ] && cap="$rem"
  echo "[cpu-queue3] $(date +%T) $m x${s} seeds (cpu, cap ${cap}s): $*"
  timeout "$cap" python run.py --platform cpu --methods "$m" \
    --datasets "$@" --seeds "$s" --seed-start "$ss" --epochs 100 \
    --no-debug && touch "$marker"
}
# zero cells per the round-3 combined protocol table (PARITY.md)
run_cells rmsn 2 0 7200  EQ_4_B EQ_4_C EQ_5_B EQ_5_D
run_cells gnet 2 0 10800 EQ_4_B EQ_4_C EQ_4_D EQ_5_B EQ_5_D cancer_sim
run_cells crn  2 0 10800 EQ_4_C EQ_5_B EQ_5_D
run_cells ct   1 0 7200  EQ_4_C EQ_5_B EQ_5_D
# n=1 cells -> n>=2 if time remains (seed 1 only; seed 0 is banked)
run_cells crn  1 1 7200  EQ_4_B EQ_4_D cancer_sim
run_cells ct   1 1 7200  EQ_4_B cancer_sim
echo "[cpu-queue3] $(date +%T) DONE (remaining $(remaining)s)"
