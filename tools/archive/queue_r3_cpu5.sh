#!/bin/bash
# Round-3 CPU queue, part 5: REBALANCED tail for the overnight window.
# queue_r3_cpu4.sh's original rmsn/gnet stages need ~13.4h of single-core
# compute (61 rmsn runs x ~289 s + 72 gnet runs x ~423 s) but only ~5-7 h
# remain before the 08:40 deadline — run as written, gnet would never
# start and half the rmsn datasets would be cut mid-stage. Measured
# per-run medians (logs of 2026-08-18): rmsn 289 s, gnet 423 s, crn 101 s.
# This queue trades "n=10 on a few cells" for "n>=4-5 on EVERY cell":
#   rmsn seeds 2-4 on the 7 datasets at n=2 (+cancer 5-7) -> n=5,
#   gnet seeds 2-3 everywhere -> n=4,
#   overflow: one more gnet seed, then more rmsn seeds, round-robin.
# The corresponding queue4 stages are marker-skipped (markers pre-created
# by the session that launched this). TPU 10-seed columns supersede both
# (r2m_* markers, newest-wins dedup in the combiner).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/markers
DEADLINE=${QUEUE_DEADLINE:-1787128800}   # 08:40 UTC Aug 19
remaining() { echo $(( DEADLINE - $(date +%s) )); }
log() { echo "[cpu-queue5] $(date +%T) $*" >> logs/queue_r3_cpu.log; }

# wait for queue4 (single core: never run two sweeps at once)
Q4PID=${Q4PID:-13276}
while kill -0 "$Q4PID" 2>/dev/null; do
  [ "$(remaining)" -lt 600 ] && { log "deadline while waiting on queue4"; exit 0; }
  sleep 60
done
log "queue4 done; starting rebalanced tail (remaining $(remaining)s)"

run_std() {  # marker cap_s method n_seeds seed_start dataset
  local marker="logs/markers/$1" cap="$2" m="$3" s="$4" ss="$5" ds="$6"
  [ -f "$marker" ] && return 0
  [ -f "logs/markers/r2m_${m}" ] && return 0    # TPU 10-seed column landed
  local rem; rem=$(remaining)
  [ "$rem" -lt 700 ] && { log "deadline; skip $marker"; return 0; }
  [ "$rem" -lt "$cap" ] && cap="$rem"
  log "std $m x${s} from seed $ss (cap ${cap}s): $ds"
  timeout "$cap" python run.py --platform cpu --methods "$m" \
    --datasets "$ds" --seeds "$s" --seed-start "$ss" --epochs 100 \
    --no-debug >> logs/queue_r3_cpu.log 2>&1 && touch "$marker"
}

DS7="EQ_4_A EQ_4_B EQ_4_C EQ_5_A EQ_5_B EQ_5_C EQ_5_D"   # rmsn: EQ_4_D=10, cancer=5 banked
DS9="EQ_4_A EQ_4_B EQ_4_C EQ_4_D EQ_5_A EQ_5_B EQ_5_C EQ_5_D cancer_sim"

# 1. rmsn -> n=5 everywhere (cancer 5-7 -> n=8; ~290 s/run)
run_std r3c5_rmsn_cancer 1500 rmsn 3 5 cancer_sim
for ds in $DS7; do run_std "r3c5_rmsn_${ds}" 1500 rmsn 3 2 "$ds"; done
# 2. gnet -> n=4 everywhere (~423 s/run, 2 runs/stage)
for ds in $DS9; do run_std "r3c5_gnet_${ds}" 1500 gnet 2 2 "$ds"; done
# 3. edct ZERO-cell fills (n=0 -> 1; ~1700 s/run — standalone table
#    completeness, no reference cells exist to compare against)
for ds in EQ_4_B EQ_4_C EQ_5_B EQ_5_D; do
  run_std "r3c5_edct_${ds}" 2400 edct 1 0 "$ds"
done
# 4. overflow, cheapest-first round-robin: +1 gnet seed, then +2 rmsn
for ds in $DS9; do run_std "r3c5_gnet2_${ds}" 900 gnet 1 4 "$ds"; done
for ds in $DS7; do run_std "r3c5_rmsn2_${ds}" 1500 rmsn 2 5 "$ds"; done
log "DONE (remaining $(remaining)s)"
