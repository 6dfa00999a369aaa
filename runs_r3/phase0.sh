#!/bin/bash
# Round-3 phase 0: regenerate all datasets (VM restart wiped gitignored
# data/), then launch the flagship heat_logt_joint training run.
set -x
cd /root/repo
mkdir -p runs_r3

# 1. heat training set (TPU; exact DST solver, reference recipe:
#    N=5000, S=64, 64 steps, T=0.5, log spacing, alpha logrange (-2.5,0.5))
python gen_data.py heat --spacing log --seed 0 \
    > runs_r3/gen_heat.log 2>&1 || exit 1

# 2. lineart test set — exact bench.py recipe (seed 1, CPU) so bench
#    finds it pre-built
DPDE_PLATFORM=cpu python gen_data.py heat --n 100 --batch 50 \
    --spacing linear --seed 1 --out heat_lineart_test.hdf5 \
    > runs_r3/gen_lineart.log 2>&1 || exit 1

# 3. LLG train + test sets (TPU; batched RK4 std-problem-4)
python gen_data.py llg --n 1000 --batch 125 --t-steps 500 --seed 0 \
    --out llg.hdf5 > runs_r3/gen_llg.log 2>&1 || exit 1
python gen_data.py llg --n 20 --batch 20 --t-steps 500 --seed 7 \
    --out llg_test.hdf5 > runs_r3/gen_llg_test.log 2>&1 || exit 1

# 4. flagship training: reference recipe (batch 64, lr 1e-4, 1000 epochs,
#    EMA 0.999/20, val every 10, ckpt every 20). Gated behind
#    PHASE0_TRAIN (ADVICE r3, low): the flagship checkpoint is committed
#    in git — rerunning this script to regenerate data/ must not burn
#    hours retraining it.
if [ -n "$PHASE0_TRAIN" ]; then
  python train.py dataset=heat_eq_logt_joint model=unetv2 \
      run.dir=/root/repo/runs_r3 > runs_r3/train_heat.log 2>&1
else
  echo "phase0: skipping training (set PHASE0_TRAIN=1 to retrain)"
fi
