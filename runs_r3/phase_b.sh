#!/bin/bash
# Round-3 phase B: promote the trained flagship checkpoint, run the
# trained-mode bench (20/50/200), full heat eval, sweeps, profile.
set -x
cd /root/repo

# P1: promote EMA checkpoint (final ema_model if training completed, else
# the best-val EMA checkpoint persisted every checkpoint_interval epochs).
# Guarded: if no fresh training run exists (run dirs are gitignored and
# wiped on VM restart), keep the committed checkpoint untouched instead
# of deleting it and silently dropping bench into synthetic mode
# (ADVICE r3, medium).
SRC=runs_r3/heat_logt_joint_unet-v2
if [ -d "$SRC/ema_model" ] || [ -d "$SRC/checkpoints/ema_model_best" ]; then
  mkdir -p pretrained_models/heat_logt_joint
  rm -rf pretrained_models/heat_logt_joint/ema_model
  if [ -d "$SRC/ema_model" ]; then
    cp -r "$SRC/ema_model" pretrained_models/heat_logt_joint/ema_model
  else
    cp -r "$SRC/checkpoints/ema_model_best" \
          pretrained_models/heat_logt_joint/ema_model
  fi
else
  echo "P1: no fresh run at $SRC — keeping the committed checkpoint"
fi

# P2: trained-mode bench at 20/50/200 steps (the BASELINE metric)
BENCH_STEPS=20,50,200 python bench.py \
    > runs_r3/bench_trained.json 2> runs_r3/bench_trained.log

# P3: full heat eval — reference masks (interior/boundary a=0.2, u fully
# unobserved, same_boundary=false), 100 test items, DP test_loop
python test.py sampling_conf=heat_logt_joint dataset=heat_eq_logt_joint \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_boundary=false \
    sampling_conf.max_num_samples=100 run.items_per_batch=4 \
    run.dir=/root/repo/runs_r3/eval_heat \
    > runs_r3/eval_heat.log 2>&1

# P4: num_steps sweep (loss-curve parity vs the reference figure)
python benchmarks/sweep_num_steps.py sampling_conf=heat_logt_joint \
    dataset=heat_eq_logt_joint '+sweep.steps=[20,50,200]' \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_boundary=false \
    > runs_r3/sweep_num_steps.log 2>&1

# P5: zeta sensitivity sweep (too-low / just-right / too-high regimes)
python benchmarks/sweep_zeta.py sampling_conf=heat_logt_joint \
    dataset=heat_eq_logt_joint '+sweep.scales=[0.1,1.0,10.0]' \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_boundary=false \
    > runs_r3/sweep_zeta.log 2>&1

# P6: roofline / MFU profile of the warm 50-step program
python tools/profile_sampler.py > runs_r3/profile_sampler.log 2>&1
