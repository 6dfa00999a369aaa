#!/bin/bash
# Round-3 phase A: promote the trained flagship checkpoint, run the
# trained-mode bench, generate LLG datasets on the TPU, start LLG training.
set -x
cd /root/repo

# P1: promote EMA checkpoint (final full-1000-epoch EMA)
mkdir -p pretrained_models/heat_logt_joint
rm -rf pretrained_models/heat_logt_joint/ema_model
cp -r runs_r3/heat_logt_joint_unet-v2/ema_model \
      pretrained_models/heat_logt_joint/ema_model

# P2: trained-mode bench (50-step; cache warmed by tools/precompile.py)
python bench.py > runs_r3/bench_trained_50.json 2> runs_r3/bench_trained_50.log

# P3: LLG datasets (train n=1000 + test n=20, both on the TPU)
python gen_data.py llg --n 1000 --batch 125 --t-steps 500 --seed 0 \
    --out llg.hdf5 > runs_r3/gen_llg.log 2>&1
python gen_data.py llg --n 20 --batch 20 --t-steps 500 --seed 7 \
    --out llg_test.hdf5 > runs_r3/gen_llg_test.log 2>&1

# P4: LLG training (reference recipe: conf/dataset/llg_eq_joint.yaml)
python train.py dataset=llg_eq_joint model=unetv2 \
    run.dir=/root/repo/runs_r3 > runs_r3/train_llg.log 2>&1
