#!/bin/bash
# Round-5 EN_JOINT certification (VERDICT r4 item 3):
#   (a) float-mode joint control — the joint analog of runs/mega_float,
#       distinguishing "joint is genuinely hard" from "joint pipeline bug";
#   (b) the full Q5.2 joint at 100 epochs x 2 seeds with the reference
#       joint-block knobs (define.h:175-191);
#   (c) an --att-shift arm (Q5.2 joint is exactly the collapse regime the
#       shift fixes — BENCH.md att_shift section).
# Serial: at most ONE TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
J="--joint --shuffle --max-sen-len 64 --dim-forced --max-dict-len 192 \
   --epochs 100 --save-best-model"

echo "=== (a) float joint control (mode 1, no fixed point) ==="
timeout 7200 python -m qmann_tpu 1 1 20 5 $J \
  --attention-mode 1 --no-fixed-point \
  --checkpoint-dir runs/joint_float/ckpt --out-dir runs/joint_float \
  > runs/joint_float.log 2>&1
echo "rc=$?"

echo "=== (b) Q5.2 joint, 100 epochs, 2 seeds ==="
timeout 14400 python -m qmann_tpu 2 1 20 5 $J \
  --checkpoint-dir runs/joint_q52/ckpt --out-dir runs/joint_q52 \
  > runs/joint_q52.log 2>&1
echo "rc=$?"

echo "=== (c) Q5.2 joint + att-shift, 100 epochs, 2 seeds ==="
timeout 14400 python -m qmann_tpu 2 1 20 5 $J --att-shift \
  --checkpoint-dir runs/joint_q52_shift/ckpt --out-dir runs/joint_q52_shift \
  > runs/joint_q52_shift.log 2>&1
echo "rc=$?"

echo "=== round5 joint campaign done ==="
