#!/bin/bash
# Round-5 TPU queue, part 2 (after the joint campaign):
#   1. mode-3 backend A/B quote pass (compiles cached by the warm pass)
#   2. mode-2 backend A/B re-quote in the same session (fair mode-2 vs
#      mode-3 comparison under one tunnel condition)
#   3. bench.py confirmation run #3
#   4. EN_GRAD_QUANT placement A/B on qa1 (backward vs update), 2 seeds
#   5. one retry of the mode-3 whole-chain Pallas compile (expendable;
#      bounded at 45 min)
# Serial: at most ONE TPU process at a time.
set -u
cd /root/repo

echo "=== 1. mode-3 quote pass ==="
timeout 1800 python -m qmann_tpu.bench.backend_ab --attention-mode 3 \
  --variants unfused,hamming,read \
  > runs/backend_ab_r5_m3.log 2>&1
echo "rc=$?"

echo "=== 2. mode-2 quote pass ==="
timeout 1800 python -m qmann_tpu.bench.backend_ab \
  --variants unfused,chain \
  > runs/backend_ab_r5_m2.log 2>&1
echo "rc=$?"

echo "=== 3. bench.py run c ==="
timeout 2700 python bench.py > runs/bench_r5_c.log 2>&1
echo "rc=$?"

echo "=== 4. grad-quant placement A/B (qa1, 2 seeds, 100 epochs) ==="
GQ="2 1 1 5 --grad-quant --save-best-model --epochs 100"
timeout 7200 python -m qmann_tpu $GQ \
  --out-dir runs/gq_backward > runs/gq_backward.log 2>&1
echo "rc=$?"
timeout 7200 python -m qmann_tpu $GQ --grad-quant-placement update \
  --out-dir runs/gq_update > runs/gq_update.log 2>&1
echo "rc=$?"

echo "=== 5. mode-3 chain compile retry ==="
timeout 2700 python -m qmann_tpu.bench.backend_ab --attention-mode 3 \
  --variants unfused,chain \
  > runs/backend_ab_r5_m3_chain.log 2>&1
echo "rc=$?"

echo "=== round5 tpu queue 2 done ==="
