#!/bin/bash
# Round-5 mode-3 retraining with the corrected weighted-sum backward:
# the reference quantizes the mode-3 w_sum backward contractions whenever
# the layer is fixed (cuda_dot_mat_vec_bwd_appx receives dot->f_fixed
# UNCONDITIONALLY, lib/layer.c:588-599) — pre-fix mode-3 trainings ran a
# float w_sum backward.  Re-measure both quoted mode-3 accuracy results:
#   (a) mode 3 at iwl=5, 20 tasks x 3 seeds  (was runs/mega_m3_iwl5)
#   (b) mode 3 at iwl 0/1, 20 tasks x 2 seeds (was runs/mega_m3_lowbit —
#       the paper's low-bit headline comparison)
set -u
cd /root/repo
M="python -m qmann_tpu.bench.megasweep --save-best-model --tasks 1-20"

echo "=== (a) mode 3 iwl=5, corrected backward ==="
timeout 10800 $M --seeds 0-2 --iwl 5 --attention-mode 3 \
  --out-dir runs/mega_m3_iwl5_v2 > runs/mega_m3_iwl5_v2.log 2>&1
echo "rc=$?"

echo "=== (b) mode 3 low-bit (iwl 0,1), corrected backward ==="
timeout 10800 $M --seeds 0-1 --iwl 0,1 --attention-mode 3 \
  --out-dir runs/mega_m3_lowbit_v2 > runs/mega_m3_lowbit_v2.log 2>&1
echo "rc=$?"

echo "=== round5 m3 retrain done ==="
