#!/bin/bash
# Protocol queue (launched by tools/tpu_watchdog.sh when the tunnel
# answers): one run.py process per method covers all its datasets
# (amortizes tunnel init + per-family compile cache). 10 seeds x 100
# epochs, vectorized columns; per-column fault walls inside
# vectorized_sweep (--no-debug).
#
# Round-3 ordering: a bench capture first (pins the perf evidence and
# warms the TPU compile cache the moment the tunnel is back), then the
# evidence gaps — edct has ZERO protocol rows and rmsn had the one red
# n=10 cell. Every stage is DEADLINE-aware: the axon tunnel serves one
# client, so the queue must release it before the driver's end-of-round
# bench runs.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DS_ALL="cancer_sim EQ_5_A EQ_5_B EQ_5_C EQ_5_D EQ_4_A EQ_4_B EQ_4_C EQ_4_D"
DEADLINE=${QUEUE_DEADLINE:-1787127600}   # 08:20 UTC Aug 19, pre-bench margin
remaining() { echo $(( DEADLINE - $(date +%s) )); }
budget() {  # min(cap, remaining); prints 0 when out of time
  local cap="$1" rem; rem=$(remaining)
  [ "$rem" -lt 600 ] && { echo 0; return; }
  [ "$rem" -lt "$cap" ] && echo "$rem" || echo "$cap"
}
wait_tpu() {  # the axon tunnel serves one client; block until it answers
  local tries=0
  until timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    tries=$((tries+1))
    echo "[queue] $(date +%T) tunnel busy (try $tries); waiting" >> logs/queue_r2.log
    [ "$(remaining)" -lt 600 ] && { echo "[queue] deadline while waiting" \
      >> logs/queue_r2.log; exit 0; }
    sleep 30
  done
}
run_method() {  # method datasets... (vectorized)
  local m="$1"; shift
  local marker="logs/markers/r2m_${m}"
  [ -f "$marker" ] && return 0
  local t; t=$(budget 18000)
  [ "$t" -eq 0 ] && { echo "[queue] $(date +%T) deadline; skip $m" \
    >> logs/queue_r2.log; return 0; }
  wait_tpu
  echo "[queue] $(date +%T) vectorized $m (budget ${t}s): $*" >> logs/queue_r2.log
  if timeout "$t" python run.py --vectorized --methods "$m" \
      --datasets "$@" --seeds 10 --epochs 100 --no-debug \
      >> logs/queue_r2.log 2>&1; then
    touch "$marker"
  else
    echo "[queue] $(date +%T) FAILED/timeout $m (completed columns are in" \
      "the log regardless)" >> logs/queue_r2.log
  fi
}

# 0. bench capture: pins BENCH evidence + warms the TPU compile cache
if [ ! -f logs/markers/r3_bench ] && [ "$(budget 5400)" -gt 1200 ]; then
  wait_tpu
  echo "[queue] $(date +%T) bench capture" >> logs/queue_r2.log
  if BENCH_WAIT_S=600 timeout 5400 python bench.py \
      > logs/bench_r3_builder.json 2> logs/bench_r3_builder.log; then
    touch logs/markers/r3_bench
    echo "[queue] $(date +%T) bench: $(cat logs/bench_r3_builder.json)" \
      >> logs/queue_r2.log
  else
    echo "[queue] $(date +%T) bench capture FAILED" >> logs/queue_r2.log
  fi
fi

run_method edct $DS_ALL
run_method rmsn $DS_ALL
# insite/sindy 10-seed vectorized MAIN_TABLE columns (the flagship rows:
# EQ_4_A/EQ_4_C had ZERO protocol rows before round 3; the CPU queue
# part 4 lands these too, but the TPU columns are authoritative if both
# run — newest-wins dedup keeps whichever finished last)
if [ ! -f logs/markers/r2m_insite_sindy ] && [ "$(budget 14400)" -gt 0 ]; then
  wait_tpu
  echo "[queue] $(date +%T) vectorized insite+sindy main-table columns" \
    >> logs/queue_r2.log
  timeout "$(budget 14400)" python run.py --vectorized \
    --methods insite sindy --datasets $DS_ALL --seeds 10 --epochs 100 \
    --no-debug >> logs/queue_r2.log 2>&1 \
    && touch logs/markers/r2m_insite_sindy
fi
# ct covers ALL datasets: the 20:45 EQ_5_B/EQ_5_C columns died on the
# Aug-17 tunnel outage with zero completed rows (logs/run-20260817-202020
# ERROR), so nothing ct-related is actually banked
run_method ct $DS_ALL
run_method crn $DS_ALL
run_method gnet $DS_ALL
if [ ! -f logs/markers/r2m_msm ] && [ ! -f logs/markers/r3cpu_msm10 ] && \
   [ "$(budget 7200)" -gt 0 ]; then
  wait_tpu
  timeout "$(budget 7200)" python run.py --methods msm --datasets $DS_ALL \
    --seeds 10 --no-debug >> logs/queue_r2.log 2>&1 \
    && touch logs/markers/r2m_msm
fi
if [ ! -f logs/markers/r2m_wsindy ] && \
   [ ! -f logs/markers/r3cpu_wsindy10 ] && [ "$(budget 7200)" -gt 0 ]; then
  wait_tpu
  timeout "$(budget 7200)" python run.py --methods wsindy \
    --datasets EQ_4_A EQ_4_B EQ_4_C EQ_4_D --seeds 10 \
    --no-debug >> logs/queue_r2.log 2>&1 && touch logs/markers/r2m_wsindy
fi
# EQ_5_D insite/sindy standard-path re-run: landed via the CPU queue
# (logs/markers/r3cpu_eq5d_ode); kept here as a fallback
if [ ! -f logs/markers/r3cpu_eq5d_ode ] && \
   [ ! -f logs/markers/r3_eq5d_ode ] && [ "$(budget 7200)" -gt 0 ]; then
  wait_tpu
  timeout "$(budget 7200)" python run.py --methods insite sindy \
    --datasets EQ_5_D --seeds 5 --no-debug >> logs/queue_r2.log 2>&1 \
    && touch logs/markers/r3_eq5d_ode
fi
# 10-seed INSIGHT grids, one vectorized dispatch per grid point
if [ ! -f logs/markers/r2m_insight_noise ] && \
   [ ! -f logs/markers/r3cpu_insight_noise ] && \
   [ "$(budget 7200)" -gt 0 ]; then
  wait_tpu
  timeout "$(budget 7200)" python run.py --vectorized \
    --experiment INSIGHT_NOISE --methods insite sindy --seeds 10 \
    --no-debug >> logs/queue_r2.log 2>&1 \
    && touch logs/markers/r2m_insight_noise
fi
if [ ! -f logs/markers/r2m_insight_less ] && \
   [ ! -f logs/markers/r3cpu_insight_less ] && \
   [ "$(budget 7200)" -gt 0 ]; then
  wait_tpu
  timeout "$(budget 7200)" python run.py --vectorized \
    --experiment INSIGHT_LESS_SAMPLES --methods insite sindy --seeds 10 \
    --no-debug >> logs/queue_r2.log 2>&1 \
    && touch logs/markers/r2m_insight_less
fi
echo "[queue] $(date +%T) DONE (remaining $(remaining)s)" >> logs/queue_r2.log
