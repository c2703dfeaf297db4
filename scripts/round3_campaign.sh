#!/bin/bash
# Round-3 measurement campaign: the reference's sweep protocols, executed
# as vmapped (tasks x seeds) families on the single TPU chip, in priority
# order (VERDICT.md round-3 items 1, 8):
#   1. float-mode control (mode 1, EN_FIXED_POINT undef), 3 seeds  [cert]
#   2. run.sh parity: iwl=5, 10 seeds (the 10-loop protocol)
#   3. sweep_fixed.sh parity: iwl {0,1} x modes {2,3}, 2 seeds
#   4. INT4 (BW_WL=4) and binary-mode sweeps, 2 seeds
# One TPU process at a time: stages run sequentially in this script.
set -u
cd /root/repo
M="python -m qmann_tpu.bench.megasweep --save-best-model --tasks 1-20"

echo "=== stage 1: float control ==="
$M --seeds 0-2 --iwl 5 --attention-mode 1 --no-fixed-point \
   --out-dir runs/mega_float > runs/mega_float.log 2>&1

echo "=== stage 2: run.sh parity (iwl=5, 10 seeds) ==="
$M --seeds 0-9 --iwl 5 --attention-mode 2 \
   --out-dir runs/mega_iwl5 > runs/mega_iwl5.log 2>&1 || {
  echo "R=200 failed; retrying in two task halves"
  python -m qmann_tpu.bench.megasweep --save-best-model --tasks 1-10 \
     --seeds 0-9 --iwl 5 --attention-mode 2 \
     --out-dir runs/mega_iwl5 >> runs/mega_iwl5.log 2>&1
  python -m qmann_tpu.bench.megasweep --save-best-model --tasks 11-20 \
     --seeds 0-9 --iwl 5 --attention-mode 2 \
     --out-dir runs/mega_iwl5_b >> runs/mega_iwl5.log 2>&1
}

echo "=== stage 3: sweep_fixed.sh parity (iwl 0,1 x modes 2,3) ==="
$M --seeds 0-1 --iwl 0,1 --attention-mode 2 \
   --out-dir runs/mega_m2_lowbit > runs/mega_m2_lowbit.log 2>&1
$M --seeds 0-1 --iwl 0,1 --attention-mode 3 \
   --out-dir runs/mega_m3_lowbit > runs/mega_m3_lowbit.log 2>&1

echo "=== stage 4: INT4 (BW_WL=4) ==="
$M --seeds 0-1 --iwl 0,1 --bw-wl 4 --attention-mode 2 \
   --out-dir runs/mega_m2_int4 > runs/mega_m2_int4.log 2>&1
$M --seeds 0-1 --iwl 0,1 --bw-wl 4 --attention-mode 3 \
   --out-dir runs/mega_m3_int4 > runs/mega_m3_int4.log 2>&1

echo "=== stage 5: binary mode ==="
$M --seeds 0-1 --iwl 0 --binary-mode --attention-mode 2 \
   --out-dir runs/mega_m2_binary > runs/mega_m2_binary.log 2>&1
$M --seeds 0-1 --iwl 0 --binary-mode --attention-mode 3 \
   --out-dir runs/mega_m3_binary > runs/mega_m3_binary.log 2>&1

echo "=== campaign done ==="
