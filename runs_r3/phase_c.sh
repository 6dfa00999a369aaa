#!/bin/bash
# Round-3 phase C: LLG end-to-end — heat->LLG fine-tune (BASELINE
# configs[3]), from-scratch LLG training (configs[2]), 300-step guided
# eval with llg_loss2 AND full-physics llg_residual_loss guidance.
set -x
cd /root/repo

EPOCHS=${LLG_EPOCHS:-300}

# P1: heat->LLG fine-tune (cross-architecture partial warm start:
# 2ch heat -> 6ch LLG; reference fine_tune.py:75-77)
python fine_tune.py dataset=llg_eq_joint model=unetv2 \
    dataset.pretrained_path=pretrained_models/heat_logt_joint/ema_model \
    dataset.training.num_epochs=$EPOCHS \
    run.dir=/root/repo/runs_r3/llg_ft \
    > runs_r3/train_llg_ft.log 2>&1

# P2: from-scratch LLG training, same recipe/epochs for comparison
python train.py dataset=llg_eq_joint model=unetv2 \
    dataset.training.num_epochs=$EPOCHS \
    run.dir=/root/repo/runs_r3/llg_scratch \
    > runs_r3/train_llg.log 2>&1

# P3: promote both EMA checkpoints
for pair in "runs_r3/llg_scratch/llg_joint_unet-v2 llg" \
            "runs_r3/llg_ft/llg_joint_unet-v2 llg_finetune"; do
  set -- $pair
  SRC=$1; DST=pretrained_models/$2
  mkdir -p "$DST"; rm -rf "$DST/ema_model"
  if [ -d "$SRC/ema_model" ]; then
    cp -r "$SRC/ema_model" "$DST/ema_model"
  else
    cp -r "$SRC/checkpoints/ema_model_best" "$DST/ema_model"
  fi
done

# P4: 300-step guided eval, reference llg sampling conf (zeta_pde=10),
# |m|=1 soft-constraint guidance (reference test2.py llg_loss2 path)
python test.py sampling_conf=llg dataset=llg_eq_joint \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_boundary=false \
    sampling_conf.max_num_samples=8 run.items_per_batch=4 \
    run.dir=/root/repo/runs_r3/eval_llg \
    > runs_r3/eval_llg.log 2>&1

# P5: same eval with FULL-PHYSICS LLG residual guidance (exchange+demag
# fields on-device — the capability the reference needed MagTense for)
python test.py sampling_conf=llg dataset=llg_eq_joint \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_boundary=false \
    sampling_conf.max_num_samples=4 run.items_per_batch=4 \
    +run.llg_full_physics=true \
    run.dir=/root/repo/runs_r3/eval_llg_phys \
    > runs_r3/eval_llg_phys.log 2>&1
