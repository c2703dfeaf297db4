#!/bin/bash
# Round-3 campaign, part 2 (after the bench measurement freed the chip).
# Priority order: the paper's headline low-bit mode-3 sweeps first, then
# the remaining sweep_fixed parity, then INT4/binary capability sweeps
# (50 epochs: exploratory configs outside any reference script; the
# collapse + best-model dynamics settle well before epoch 50).
set -u
cd /root/repo
M="python -m qmann_tpu.bench.megasweep --save-best-model --tasks 1-20"

echo "=== m3 lowbit (sweep_fixed parity) ==="
$M --seeds 0-1 --iwl 0,1 --attention-mode 3 \
   --out-dir runs/mega_m3_lowbit > runs/mega_m3_lowbit.log 2>&1

echo "=== m2 iwl=1 (sweep_fixed parity, iwl=0 already done) ==="
$M --seeds 0-1 --iwl 1 --attention-mode 2 \
   --out-dir runs/mega_m2_iwl1 > runs/mega_m2_iwl1.log 2>&1

echo "=== INT4 (BW_WL=4, Q1.2) ==="
$M --seeds 0-1 --iwl 1 --bw-wl 4 --attention-mode 2 --epochs 50 \
   --out-dir runs/mega_m2_int4 > runs/mega_m2_int4.log 2>&1
$M --seeds 0-1 --iwl 1 --bw-wl 4 --attention-mode 3 --epochs 50 \
   --out-dir runs/mega_m3_int4 > runs/mega_m3_int4.log 2>&1

echo "=== binary mode ==="
$M --seeds 0-1 --iwl 0 --binary-mode --attention-mode 2 --epochs 50 \
   --out-dir runs/mega_m2_binary > runs/mega_m2_binary.log 2>&1
$M --seeds 0-1 --iwl 0 --binary-mode --attention-mode 3 --epochs 50 \
   --out-dir runs/mega_m3_binary > runs/mega_m3_binary.log 2>&1

echo "=== campaign2 done ==="
