#!/bin/bash
# HAMMING_WEIGHT_PARA accuracy probe: qa1, mode 3, iwl=1 (the regime
# where Hamming attention is the winning mode), para 0 (shipped) vs -1
# (the reference's commented variant), 2 seeds, 100 epochs.
set -u
cd /root/repo
B="python -m qmann_tpu 2 1 1 1 --attention-mode 3 --save-best-model"

timeout 5400 $B --out-dir runs/hwp_para0 > runs/hwp_para0.log 2>&1
echo "rc=$?"
timeout 5400 $B --hamming-weight-para -1 \
  --out-dir runs/hwp_param1 > runs/hwp_param1.log 2>&1
echo "rc=$?"
echo done
