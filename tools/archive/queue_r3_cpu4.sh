#!/bin/bash
# Round-3 CPU queue, part 4 (this session): bring every main-table cell
# toward the n=10 protocol on the host backend while the axon tunnel is
# down. Priorities (VERDICT r2 #1): the two ZERO insite/sindy cells
# (EQ_4_A, EQ_4_C) first, then the ct n=1 cells, then full 10-seed
# vectorized ODE columns, then crn / rmsn standard top-ups (seeds 2..9
# complement the banked 0..1). gnet/ct/edct full columns stay with the
# TPU queue (tools/queue_r2_protocol.sh, relaunched by the watchdog) —
# at ~10 min/run on the single host core they cannot reach n=10 here.
# Every stage is marker-guarded (reruns skip banked work, TPU columns
# supersede) and deadline-aware (the driver's end-of-round bench needs
# the core if it falls back to CPU).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:-1787128800}   # 08:40 UTC Aug 19 (~1h pre-round-end)
remaining() { echo $(( DEADLINE - $(date +%s) )); }
log() { echo "[cpu-queue4] $(date +%T) $*" >> logs/queue_r3_cpu.log; }

run_std() {  # marker cap_s method n_seeds seed_start datasets...
  local marker="logs/markers/$1" cap="$2" m="$3" s="$4" ss="$5"; shift 5
  [ -f "$marker" ] && return 0
  [ -f "logs/markers/r2m_${m}" ] && return 0    # TPU 10-seed column landed
  local rem; rem=$(remaining)
  [ "$rem" -lt 900 ] && { log "deadline; skip $marker"; return 0; }
  [ "$rem" -lt "$cap" ] && cap="$rem"
  log "std $m x${s} from seed $ss (cap ${cap}s): $*"
  timeout "$cap" python run.py --platform cpu --methods "$m" \
    --datasets "$@" --seeds "$s" --seed-start "$ss" --epochs 100 \
    --no-debug >> logs/queue_r3_cpu.log 2>&1 && touch "$marker"
}
run_vec() {  # marker cap_s dataset methods...
  local marker="logs/markers/$1" cap="$2" ds="$3"; shift 3
  [ -f "$marker" ] && return 0
  [ -f "logs/markers/r2m_insite_sindy" ] && return 0   # TPU columns landed
  local rem; rem=$(remaining)
  [ "$rem" -lt 900 ] && { log "deadline; skip $marker"; return 0; }
  [ "$rem" -lt "$cap" ] && cap="$rem"
  log "vectorized $* x10 on $ds (cap ${cap}s)"
  timeout "$cap" python run.py --platform cpu --vectorized --methods "$@" \
    --datasets "$ds" --seeds 10 --epochs 100 \
    --no-debug >> logs/queue_r3_cpu.log 2>&1 && touch "$marker"
}

# 1. the two ZERO insite/sindy cells (no protocol rows anywhere)
run_vec r3c4_ode_EQ_4_A 7200 EQ_4_A insite sindy
run_vec r3c4_ode_EQ_4_C 7200 EQ_4_C insite sindy
# 2. ct n=1 cells -> n=3 (seed 0 banked; +seeds 1,2)
run_std r3c4_ct_n1 10800 ct 2 1 EQ_4_C EQ_5_B EQ_5_D cancer_sim
# 3. remaining ODE columns to n=10 (lowest current n first; EQ_4_B is
#    already n=10 via the INSIGHT_NOISE grid's noise=1.0 rows — last)
run_vec r3c4_ode_EQ_5_B   7200 EQ_5_B   insite sindy
run_vec r3c4_ode_EQ_5_C   7200 EQ_5_C   insite sindy
run_vec r3c4_ode_EQ_4_D   7200 EQ_4_D   insite sindy
run_vec r3c4_ode_EQ_5_A   7200 EQ_5_A   insite sindy
run_vec r3c4_ode_cancer   7200 cancer_sim insite sindy
run_vec r3c4_ode_EQ_5_D   7200 EQ_5_D   insite sindy
run_vec r3c4_ode_EQ_4_B   7200 EQ_4_B   insite sindy
# 4. crn standard top-up to n=10 (seeds 2..9; ~2 min/run)
for ds in EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D cancer_sim; do
  run_std "r3c4_crn_${ds}" 3600 crn 8 2 "$ds"
done
# 5. rmsn standard top-up (EQ_4_D banked at 10; cancer_sim at 5)
run_std r3c4_rmsn_cancer 3600 rmsn 5 5 cancer_sim
for ds in EQ_4_A EQ_4_B EQ_4_C EQ_5_A EQ_5_B EQ_5_C EQ_5_D; do
  run_std "r3c4_rmsn_${ds}" 5400 rmsn 8 2 "$ds"
done
# 6. overflow: gnet top-up (~10 min/run; most will be cut by deadline)
for ds in EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D cancer_sim; do
  run_std "r3c4_gnet_${ds}" 10800 gnet 8 2 "$ds"
done
log "DONE (remaining $(remaining)s)"
