#!/bin/bash
# Round-4 TPU campaign, part 4: accuracy-matrix completion.
# (a) mode-3 Hamming at iwl=5, 20 tasks x 3 seeds — the high-iwl mode-3
#     column currently rests on a single qa1 calibration;
# (b) EN_JOINT: train once on qa_joint, test per task — never measured.
set -u
cd /root/repo

echo "=== stage a: mode 3 at iwl=5, tasks 1-20 x 3 seeds ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-2 --iwl 5 --attention-mode 3 \
    --out-dir runs/mega_m3_iwl5 > runs/mega_m3_iwl5.log 2>&1

echo "=== stage b: EN_JOINT at iwl=5 (train qa_joint once, test per task) ==="
timeout 7200 python -m qmann_tpu 1 1 20 5 --joint --save-best-model \
    --out-dir runs/joint_iwl5 > runs/joint_iwl5.log 2>&1

echo "=== round4 campaign part 4 done ==="
