#!/bin/bash
# Round-3 TPU measurement queue: runs the reference's sweep protocols
# (sweep_fixed.sh / run.sh analogs) as one sequential job list, highest
# leverage first, against a wall-clock deadline.
#
#   QUEUE_DEADLINE=<epoch seconds> bash scripts/queue_r3.sh
#
# One TPU process at a time (CLAUDE.md): this script is the only TPU
# user while it runs.  To take a TPU window:
#   touch runs/QUEUE_PAUSE; kill <current python PID>   # exact PID only
# The interrupted job is retried (all jobs are --resume idempotent and
# checkpoint per task) once QUEUE_PAUSE is removed.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE to epoch seconds}
mkdir -p runs

run_job() {
  local name=$1; shift
  while true; do
    while [ -f runs/QUEUE_PAUSE ]; do sleep 20; done
    local left=$(( DEADLINE - $(date +%s) ))
    if [ "$left" -lt 180 ]; then
      echo "QUEUE: skip $name ($left s left)"; return 1
    fi
    echo "QUEUE: start $name ($left s budget) $(date -u +%FT%TZ)"
    timeout "$left" python -u -m "$@" >> "runs/${name}.log" 2>&1
    local rc=$?
    if [ -f runs/QUEUE_PAUSE ]; then
      echo "QUEUE: $name interrupted for pause window (rc=$rc), will retry"
      continue
    fi
    echo "QUEUE: done $name rc=$rc $(date -u +%FT%TZ)"
    return $rc
  done
}

SWEEP="qmann_tpu.bench.sweep --epochs 100 --save-best-model --uniform-shapes --resume"

# P1: float-mode control, 1 seed across all 20 tasks (certifies the trainer)
run_job float_l1 $SWEEP --tasks 1-20 --iwl 5 --attention-mode 1 \
  --no-fixed-point --loops 1 --out-dir runs/sweep_float
# P2: complete the iwl=0 tables (mode 2 tasks 7-20, mode 3 tasks 13-20)
run_job m2_iwl0 $SWEEP --tasks 1-20 --iwl 0 --attention-mode 2 --loops 1 \
  --out-dir runs/sweep_m2_iwl0
run_job m3_iwl0 $SWEEP --tasks 1-20 --iwl 0 --attention-mode 3 --loops 1 \
  --out-dir runs/sweep_m3_iwl0
# P3: saturation-collapse mitigation study (EN_SC_ATT / lambda)
run_job scatt qmann_tpu.bench.scatt_study --seeds 2 --resume \
  --out-dir runs/scatt_study
# P4: float control seeds 2-3 (>=3 seeds per VERDICT)
run_job float_l3 $SWEEP --tasks 1-20 --iwl 5 --attention-mode 1 \
  --no-fixed-point --loops 3 --out-dir runs/sweep_float
# P5: iwl=1 both modes (sweep_fixed.sh's second operating point)
run_job m2_iwl1 $SWEEP --tasks 1-20 --iwl 1 --attention-mode 2 --loops 1 \
  --out-dir runs/sweep_m2_iwl1
run_job m3_iwl1 $SWEEP --tasks 1-20 --iwl 1 --attention-mode 3 --loops 1 \
  --out-dir runs/sweep_m3_iwl1
# P6: repeat statistics at iwl=5 (run.sh protocol direction: seeds 1,2
# append to the existing seed-0 sweep)
run_job iwl5_l3 $SWEEP --tasks 1-20 --iwl 5 --attention-mode 2 --loops 3 \
  --out-dir runs/sweep_iwl5
# P7: INT4 (BW_WL=4) both attention modes (BASELINE.json config 4)
run_job m2_int4 $SWEEP --tasks 1-20 --iwl 0 --bw-wl 4 --attention-mode 2 \
  --loops 1 --out-dir runs/sweep_m2_int4
run_job m3_int4 $SWEEP --tasks 1-20 --iwl 0 --bw-wl 4 --attention-mode 3 \
  --loops 1 --out-dir runs/sweep_m3_int4
# P8: binary mode (BINARY_MODE, define.h:88)
run_job m2_bin $SWEEP --tasks 1-20 --iwl 0 --binary-mode \
  --attention-mode 2 --loops 1 --out-dir runs/sweep_m2_bin
run_job m3_bin $SWEEP --tasks 1-20 --iwl 0 --binary-mode \
  --attention-mode 3 --loops 1 --out-dir runs/sweep_m3_bin
# P9: second loops for the iwl=0/1 tables (sweep_fixed.sh runs 2 loops)
run_job m2_iwl0_l2 $SWEEP --tasks 1-20 --iwl 0 --attention-mode 2 \
  --loops 2 --out-dir runs/sweep_m2_iwl0
run_job m3_iwl0_l2 $SWEEP --tasks 1-20 --iwl 0 --attention-mode 3 \
  --loops 2 --out-dir runs/sweep_m3_iwl0
run_job m2_iwl1_l2 $SWEEP --tasks 1-20 --iwl 1 --attention-mode 2 \
  --loops 2 --out-dir runs/sweep_m2_iwl1
run_job m3_iwl1_l2 $SWEEP --tasks 1-20 --iwl 1 --attention-mode 3 \
  --loops 2 --out-dir runs/sweep_m3_iwl1
# P10: run.sh parity tail — keep appending iwl=5 loops until the deadline
run_job iwl5_l10 $SWEEP --tasks 1-20 --iwl 5 --attention-mode 2 \
  --loops 10 --out-dir runs/sweep_iwl5

echo "QUEUE: finished $(date -u +%FT%TZ)"
