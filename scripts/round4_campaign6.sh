#!/bin/bash
# Round-4 TPU campaign, part 6: EN_JOINT at the reference's joint
# operating point.  The first joint measurement (runs/joint_iwl5) used
# the single-task defaults; the reference's joint config block
# (define.h:177-191) sets EN_SAMPLE_SHUFFLED true (randomizing the
# train/valid split — without it the task-ordered qa_joint file makes
# the whole validation set qa19/qa20, wrecking best-model selection),
# MAX_SEN_LEN 64, DIM_FORCED with MAX_DICT_LEN 192.
set -u
cd /root/repo

echo "=== EN_JOINT, reference joint block knobs, 1 loop x 60 epochs (fits the session; best-model dynamics settle early, cf. the INT4/binary 50-epoch protocol) ==="
timeout 4500 python -m qmann_tpu 1 1 20 5 --epochs 60 --joint --shuffle \
    --max-sen-len 64 --dim-forced --max-dict-len 192 --save-best-model \
    --checkpoint-dir runs/joint_iwl5_shuf/ckpt --out-dir runs/joint_iwl5_shuf > runs/joint_iwl5_shuf.log 2>&1

echo "=== round4 campaign part 6 done ==="
