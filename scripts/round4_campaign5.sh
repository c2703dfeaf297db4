#!/bin/bash
# Round-4 TPU campaign, part 5: the fast-path cond A/B that PROFILE_r4
# scheduled (runs/msab_{off,on}) plus the serial-trainer device-time A/B.
#
# (a) trace_forward --train with/without the runtime integer-fast-path
#     conds: PROFILE_r4 measured 57% of the 60ms device epoch in the
#     conds' async operand copies — measure the epoch device time with
#     the conds compiled out.
# (b) megasweep family-trainer wall-clock A/B (--keep-fast-path vs the
#     round-4 default of disabling them under vmap).  Each variant runs
#     twice: pass 1 pays the compile (persistent cache), pass 2 is the
#     quoted execution time (meta.json time_train).
set -u
cd /root/repo

echo "=== stage a: serial train-epoch device time, fast-path ON ==="
timeout 1800 python -m qmann_tpu.bench.trace_forward --train \
    --out runs/trace_r4_train_fp_on > runs/trace_r4_train_fp_on.log 2>&1

echo "=== stage a2: serial train-epoch device time, fast-path OFF ==="
timeout 1800 python -m qmann_tpu.bench.trace_forward --train --no-fast-path \
    --out runs/trace_r4_train_fp_off > runs/trace_r4_train_fp_off.log 2>&1

MS="python -m qmann_tpu.bench.megasweep --save-best-model \
    --tasks 1-5 --seeds 0-3 --iwl 5 --epochs 50"

# NOTE: after the round-4 default flip the family trainer keeps the fast
# paths unless --no-fast-path is passed (--keep-fast-path is a no-op), so
# the off arm must say --no-fast-path explicitly.  The committed
# runs/msab_off was produced under the pre-flip semantics (off by
# default); this script now reproduces the same comparison post-flip.
echo "=== stage b: megasweep A/B pass 1 (compile) ==="
timeout 3600 $MS --no-fast-path \
    --out-dir runs/msab_off_warm > runs/msab_off_warm.log 2>&1
timeout 3600 $MS --keep-fast-path \
    --out-dir runs/msab_on_warm > runs/msab_on_warm.log 2>&1

echo "=== stage b2: megasweep A/B pass 2 (quoted) ==="
timeout 3600 $MS --no-fast-path --out-dir runs/msab_off > runs/msab_off.log 2>&1
timeout 3600 $MS --keep-fast-path \
    --out-dir runs/msab_on > runs/msab_on.log 2>&1

echo "=== round4 campaign part 5 done ==="
