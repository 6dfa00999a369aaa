#!/bin/bash
# Round-5 training phases (VERDICT r4 items 6 + 7). One TPU client at a
# time; every run exits on its own. Phases gated by SKIP_* env vars.
set -x
cd /root/repo

# P1: PIDM physics-loss fine-tune from the 1000-epoch flagship (ME
# residual), 300 epochs
if [ -z "$SKIP_P1" ]; then
  python fine_tune.py dataset=heat_eq_logt_joint model=unetv2 \
      dataset.pretrained_path=pretrained_models/heat_logt_joint/ema_model \
      dataset.training.physics_loss=true dataset.residual_estimation=ME \
      dataset.training.num_epochs=${PIDM_EPOCHS:-200} \
      run.dir=/root/repo/runs_r5/pidm_ft > runs_r5/train_pidm.log 2>&1
fi

# P2: control at equal budget — vanilla EDM fine-tune, same 300 epochs
if [ -z "$SKIP_P2" ]; then
  python fine_tune.py dataset=heat_eq_logt_joint model=unetv2 \
      dataset.pretrained_path=pretrained_models/heat_logt_joint/ema_model \
      dataset.training.num_epochs=${PIDM_EPOCHS:-200} \
      run.dir=/root/repo/runs_r5/vanilla_ft > runs_r5/train_vanilla_ft.log 2>&1
fi

# P3: forward-method heat training from scratch (the family the
# reference ships configs for but never wires into eval)
if [ -z "$SKIP_P3" ]; then
  python train.py dataset=heat_eq_logt_forward model=unetv2 \
      dataset.training.num_epochs=${FWD_EPOCHS:-400} \
      run.dir=/root/repo/runs_r5/fwd_train > runs_r5/train_forward.log 2>&1
fi

# P4: promote checkpoints
if [ -z "$SKIP_P4" ]; then
  for pair in "runs_r5/pidm_ft/heat_logt_joint_unet-v2 heat_logt_joint_pidm" \
              "runs_r5/vanilla_ft/heat_logt_joint_unet-v2 heat_logt_joint_ft600" \
              "runs_r5/fwd_train/heat_logt_forward_unet-v2 heat_logt_forward"; do
    set -- $pair
    SRC=$1; DST=pretrained_models/$2
    if [ -d "$SRC/ema_model" ] || [ -d "$SRC/checkpoints/ema_model_best" ]; then
      mkdir -p "$DST"; rm -rf "$DST/ema_model"
      if [ -d "$SRC/ema_model" ]; then cp -r "$SRC/ema_model" "$DST/ema_model"
      else cp -r "$SRC/checkpoints/ema_model_best" "$DST/ema_model"; fi
    else echo "P4: no checkpoint at $SRC"; fi
  done
fi
echo TRAIN_PHASES_DONE
