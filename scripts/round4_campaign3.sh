#!/bin/bash
# Round-4 TPU campaign, part 3: perf measurements (serialized, one TPU
# process at a time).
set -u
cd /root/repo

echo "=== stage A: bench.py after the fused block-requant change ==="
timeout 2400 python bench.py > runs/bench_r4_blockquant.log 2>&1

echo "=== stage B: backend A/B at qa1 dims (unfused vs chain vs read) ==="
timeout 3600 python -m qmann_tpu.bench.backend_ab \
    --variants unfused,chain,read > runs/backend_ab_r4b.log 2>&1

echo "=== stage C: crossover table at scaled-up dims ==="
timeout 3600 python -m qmann_tpu.bench.backend_ab \
    --variants unfused,chain,read --synthetic 100,50,8,128 --batch 512 \
    > runs/backend_ab_r4_syn128.log 2>&1
timeout 3600 python -m qmann_tpu.bench.backend_ab \
    --variants unfused,chain,read --synthetic 500,50,8,256 --batch 256 \
    > runs/backend_ab_r4_syn256.log 2>&1

echo "=== stage D: engine-regime interleaved paired A/B ==="
timeout 3600 python -m qmann_tpu.bench.engine_bench --passes 7 \
    > runs/engine_bench_r4b.log 2>&1

echo "=== stage E: att_shift at INT4 (does the root fix move the bit-width floor?) ==="
timeout 7200 python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-20 --seeds 0-1 --iwl 1 --bw-wl 4 --attention-mode 2 \
    --epochs 50 --att-shift \
    --out-dir runs/mega_m2_int4_shift > runs/mega_m2_int4_shift.log 2>&1

echo "=== round4 campaign part 3 done ==="
