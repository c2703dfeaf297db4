#!/bin/bash
# Round-4 TPU campaign, part 2 (the stages the first session's death cut).
# Serialized: at most ONE TPU process at a time.
set -u
cd /root/repo

echo "=== stage 4 (resume): att_shift at full run.sh protocol (10 seeds) ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-9 --iwl 5 --att-shift \
    --out-dir runs/mega_shift10 > runs/mega_shift10.log 2>&1

echo "=== stage 5: att_shift at low bit-width (mode 2, iwl 0/1) ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-1 --iwl 0,1 --attention-mode 2 --att-shift \
    --out-dir runs/mega_m2_lowbit_shift > runs/mega_m2_lowbit_shift.log 2>&1

echo "=== round4 campaign part 2 done ==="
