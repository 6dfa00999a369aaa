#!/bin/bash
# Round-4 LLG end-to-end (VERDICT r3 missing item 2): heat->LLG
# fine-tune, from-scratch LLG, 300-step guided evals with llg_loss2 AND
# full-physics llg_residual_loss, plus the {30,50,100,300} loss-curve
# figure (the reference's sampling_losses_num_steps_sensitivity.png
# matches the LLG llg_loss2 scale — BASELINE.md interpretation update).
# Phases gated; all TPU runs exit by themselves; run ONE process at a
# time (compile-client stall gotcha).
set -x
cd /root/repo

EPOCHS=${LLG_EPOCHS:-600}

# P1: heat->LLG fine-tune (cross-architecture partial warm start,
# reference fine_tune.py:75-77)
if [ -z "$SKIP_P1" ]; then
  python fine_tune.py dataset=llg_eq_joint model=unetv2 \
      dataset.pretrained_path=pretrained_models/heat_logt_joint/ema_model \
      dataset.training.num_epochs=$EPOCHS \
      run.dir=/root/repo/runs_r4/llg_ft > runs_r4/train_llg_ft.log 2>&1
fi

# P2: from-scratch LLG training, same recipe
if [ -z "$SKIP_P2" ]; then
  python train.py dataset=llg_eq_joint model=unetv2 \
      dataset.training.num_epochs=$EPOCHS \
      run.dir=/root/repo/runs_r4/llg_scratch > runs_r4/train_llg.log 2>&1
fi

# P3: promote both EMA checkpoints (guarded)
if [ -z "$SKIP_P3" ]; then
  for pair in "runs_r4/llg_scratch/llg_joint_unet-v2 llg" \
              "runs_r4/llg_ft/llg_joint_unet-v2 llg_finetune"; do
    set -- $pair
    SRC=$1; DST=pretrained_models/$2
    if [ -d "$SRC/ema_model" ] || [ -d "$SRC/checkpoints/ema_model_best" ]; then
      mkdir -p "$DST"; rm -rf "$DST/ema_model"
      if [ -d "$SRC/ema_model" ]; then
        cp -r "$SRC/ema_model" "$DST/ema_model"
      else
        cp -r "$SRC/checkpoints/ema_model_best" "$DST/ema_model"
      fi
    else
      echo "P3: no checkpoint at $SRC — keeping any committed one"
    fi
  done
fi

# P4: 300-step guided eval, reference llg sampling conf, llg_loss2
# guidance; items spread over the 20-trajectory x 500-step view
if [ -z "$SKIP_P4" ]; then
  python test.py sampling_conf=llg dataset=llg_eq_joint \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      sampling_conf.max_num_samples=${LLG_EVAL_ITEMS:-32} \
      run.items_per_batch=4 +run.item_stride=311 \
      run.dir=/root/repo/runs_r4/eval_llg > runs_r4/eval_llg.log 2>&1
fi

# P5: same eval for the FINE-TUNED model
if [ -z "$SKIP_P5" ]; then
  python test.py sampling_conf=llg dataset=llg_eq_joint \
      sampling_conf.pretrained_path=pretrained_models/llg_finetune/ema_model \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      sampling_conf.max_num_samples=${LLG_EVAL_ITEMS:-32} \
      run.items_per_batch=4 +run.item_stride=311 \
      run.dir=/root/repo/runs_r4/eval_llg_ft > runs_r4/eval_llg_ft.log 2>&1
fi

# P6: full-physics LLG residual guidance (exchange+demag on-device — the
# capability the reference needed MagTense for)
if [ -z "$SKIP_P6" ]; then
  python test.py sampling_conf=llg dataset=llg_eq_joint \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      sampling_conf.max_num_samples=8 run.items_per_batch=4 \
      +run.item_stride=1249 +run.llg_full_physics=true \
      run.dir=/root/repo/runs_r4/eval_llg_phys > runs_r4/eval_llg_phys.log 2>&1
fi

# P7: the {30,50,100,300} num_steps loss-curve figure on LLG
if [ -z "$SKIP_P7" ]; then
  python benchmarks/sweep_num_steps.py sampling_conf=llg \
      dataset=llg_eq_joint '+sweep.steps=[30,50,100,300]' \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      run.dir=/root/repo/benchmarks/results/llg \
      > runs_r4/sweep_num_steps_llg.log 2>&1
fi
