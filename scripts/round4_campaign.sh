#!/bin/bash
# Round-4 TPU campaign (serialized: at most ONE TPU process at a time).
# Priority: (1) the backend A/B the round-3 clock cut — does the
# whole-hop-chain Pallas kernel beat the XLA fusion chain on the chip?
# (2) engine-regime prepared-vs-regular A/B; (3) att_shift at the full
# run.sh protocol (10 seeds x 20 tasks); (4) att_shift at low bit-width
# (does the root fix rescue the quantized dot where Hamming wins today?).
set -u
cd /root/repo

echo "=== stage 1: backend A/B (unfused vs chain vs read) ==="
timeout 3600 python -m qmann_tpu.bench.backend_ab \
    --variants unfused,chain,read \
    > runs/backend_ab_r4.log 2>&1

echo "=== stage 2: chain batch-tile sensitivity (1000 = one program) ==="
timeout 2400 python -m qmann_tpu.bench.backend_ab \
    --variants unfused,chain --chain-tile 1000 \
    > runs/backend_ab_r4_tile1000.log 2>&1

echo "=== stage 3: engine-regime A/B (prepared vs regular) ==="
timeout 3600 python -m qmann_tpu.bench.engine_bench --passes 5 \
    > runs/engine_bench_r4.log 2>&1

echo "=== stage 4: att_shift at full run.sh protocol (10 seeds) ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-9 --iwl 5 --att-shift \
    --out-dir runs/mega_shift10 > runs/mega_shift10.log 2>&1

echo "=== stage 5: att_shift at low bit-width (mode 2, iwl 0/1) ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-1 --iwl 0,1 --attention-mode 2 --att-shift \
    --out-dir runs/mega_m2_lowbit_shift > runs/mega_m2_lowbit_shift.log 2>&1

echo "=== round4 campaign done ==="
