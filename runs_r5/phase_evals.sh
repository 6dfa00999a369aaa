#!/bin/bash
# Post-training evals (round 5): forward-method witness, PIDM A/B,
# LLG full-physics tuning + eval. One TPU client at a time; phases
# gated by SKIP_* envs.
set -x
cd /root/repo
PROTO="observations.interior_a=0.2 observations.boundary_a=0.2 observations.interior_u=0.0 observations.boundary_u=0.0 observations.same_interior=false observations.same_boundary=false"

# P1: forward-method zeta tune (obs_u-masked guidance; zeta_a unused)
if [ -z "$SKIP_P1" ]; then
  timeout 2400 python tools/tune_sampler.py sampling_conf=heat_logt_forward \
    dataset=heat_eq_logt_forward $PROTO \
    +run.eval_dtype=bfloat16 +tune.n_calls=24 +tune.n_items=4 \
    +tune.objective=rel run.dir=runs_r5/tune_forward \
    > runs_r5/tune_forward.log 2>&1
fi

# P2: forward-method 100-item eval (first-ever end-to-end forward witness)
if [ -z "$SKIP_P2" ]; then
  ZU=$(python -c "import json; d=json.load(open('runs_r5/tune_forward/sampler_tuning.json'))['best']; print(d['zeta_u'])" 2>/dev/null || echo 1.0)
  ZP=$(python -c "import json; d=json.load(open('runs_r5/tune_forward/sampler_tuning.json'))['best']; print(d['zeta_pde'])" 2>/dev/null || echo 0.02)
  timeout 3600 python test.py sampling_conf=heat_logt_forward \
    dataset=heat_eq_logt_forward $PROTO \
    sampling_conf.zeta_u=$ZU sampling_conf.zeta_pde=$ZP \
    sampling_conf.max_num_samples=100 +run.item_stride=10 \
    +run.eval_dtype=bfloat16 \
    run.items_per_batch=4 run.dir=runs_r5/eval_forward \
    > runs_r5/eval_forward.log 2>&1
  python tools/summarize_eval.py runs_r5/eval_forward/validation_data.npz \
    "{\"protocol\": \"forward method: A=u(t0) full conditioning, U masked 0.2/0.2, 50 steps, 32 samples, bf16; zetas ($ZU, $ZP)\"}" \
    >> runs_r5/eval_forward.log
fi

# P3+P4: PIDM vs vanilla fine-tune guided evals (32 spread items each,
# serving config, SAME masks/protocol for a fair A/B)
if [ -z "$SKIP_P3" ]; then
  for CKPT in heat_logt_joint_pidm heat_logt_joint_ft600; do
    timeout 3600 python test.py sampling_conf=heat_logt_joint_serving \
      dataset=heat_eq_logt_joint $PROTO \
      sampling_conf.pretrained_path=pretrained_models/$CKPT/ema_model \
      sampling_conf.max_num_samples=32 +run.item_stride=31 \
      run.items_per_batch=4 run.dir=runs_r5/eval_$CKPT \
      > runs_r5/eval_$CKPT.log 2>&1
    python tools/summarize_eval.py runs_r5/eval_$CKPT/validation_data.npz \
      "{\"checkpoint\": \"$CKPT\"}" >> runs_r5/eval_$CKPT.log
  done
fi

# P5: LLG full-physics guidance zeta tune (VERDICT item 4) + 300-step eval
if [ -z "$SKIP_P5" ]; then
  timeout 3600 python tools/tune_sampler.py sampling_conf=llg \
    dataset=llg_eq_joint $PROTO observations.same_boundary=false \
    +run.llg_full_physics=true +tune.n_calls=24 +tune.n_items=4 \
    +tune.objective=rel run.dir=runs_r5/tune_llg_phys \
    > runs_r5/tune_llg_phys.log 2>&1
  ZA=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_a'])")
  ZU=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_u'])")
  ZP=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_pde'])")
  timeout 3600 python test.py sampling_conf=llg dataset=llg_eq_joint \
    $PROTO observations.same_boundary=false \
    sampling_conf.zeta_a=$ZA sampling_conf.zeta_u=$ZU sampling_conf.zeta_pde=$ZP \
    sampling_conf.max_num_samples=32 run.items_per_batch=4 \
    +run.item_stride=311 +run.llg_full_physics=true \
    run.dir=runs_r5/eval_llg_phys_tuned > runs_r5/eval_llg_phys_tuned.log 2>&1
  python tools/summarize_eval.py runs_r5/eval_llg_phys_tuned/validation_data.npz \
    "{\"guidance\": \"llg_residual_loss (full physics), tuned ($ZA, $ZU, $ZP)\"}" \
    >> runs_r5/eval_llg_phys_tuned.log
fi
echo EVAL_PHASES_DONE
