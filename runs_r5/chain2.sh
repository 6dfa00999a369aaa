#!/bin/bash
# Round-5 endgame chain (one TPU client at a time, every run exits on
# its own): PIDM A/B evals -> zeta_pde ablation -> forward-method
# tune+eval witness -> LLG full-physics tune+eval -> LLG reference-zeta
# parity run. Trimmed tuner budgets vs phase_evals.sh to fit the
# remaining round wall-clock.
set -x
cd /root/repo
PROTO="observations.interior_a=0.2 observations.boundary_a=0.2 observations.interior_u=0.0 observations.boundary_u=0.0 observations.same_interior=false observations.same_boundary=false"

# ---- A: PIDM physics-loss fine-tune vs vanilla fine-tune control ----
if [ -z "$SKIP_A" ]; then
  for CKPT in heat_logt_joint_pidm heat_logt_joint_ft600; do
    timeout 1800 python test.py sampling_conf=heat_logt_joint_serving \
      dataset=heat_eq_logt_joint $PROTO \
      sampling_conf.pretrained_path=pretrained_models/$CKPT/ema_model \
      sampling_conf.max_num_samples=32 +run.item_stride=31 \
      run.items_per_batch=4 run.dir=runs_r5/eval_$CKPT \
      > runs_r5/eval_$CKPT.log 2>&1
    python tools/summarize_eval.py runs_r5/eval_$CKPT/validation_data.npz \
      "{\"checkpoint\": \"$CKPT\"}" >> runs_r5/eval_$CKPT.log
  done
fi

# ---- B: zeta_pde ablation (VERDICT item 3a) ----
if [ -z "$SKIP_B" ]; then
  bash runs_r5/ablate_zeta_pde.sh
fi

# ---- C: forward-method tune + 100-item eval (VERDICT item 6) ----
if [ -z "$SKIP_C" ]; then
  timeout 1800 python tools/tune_sampler.py sampling_conf=heat_logt_forward \
    dataset=heat_eq_logt_forward $PROTO \
    +run.eval_dtype=bfloat16 +tune.n_calls=16 +tune.n_items=4 \
    +tune.objective=rel run.dir=runs_r5/tune_forward \
    > runs_r5/tune_forward.log 2>&1
  ZU=$(python -c "import json; d=json.load(open('runs_r5/tune_forward/sampler_tuning.json'))['best']; print(d['zeta_u'])" 2>/dev/null || echo 1.0)
  ZP=$(python -c "import json; d=json.load(open('runs_r5/tune_forward/sampler_tuning.json'))['best']; print(d['zeta_pde'])" 2>/dev/null || echo 0.02)
  timeout 2400 python test.py sampling_conf=heat_logt_forward \
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

# ---- D: LLG full-physics guidance tune + 300-step eval (VERDICT item 4) ----
if [ -z "$SKIP_D" ]; then
  timeout 2400 python tools/tune_sampler.py sampling_conf=llg \
    dataset=llg_eq_joint $PROTO observations.same_boundary=false \
    +run.llg_full_physics=true +tune.n_calls=12 +tune.n_items=4 \
    +tune.objective=rel run.dir=runs_r5/tune_llg_phys \
    > runs_r5/tune_llg_phys.log 2>&1
  ZA=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_a'])" 2>/dev/null || echo 10.0)
  ZU=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_u'])" 2>/dev/null || echo 10.0)
  ZP=$(python -c "import json; d=json.load(open('runs_r5/tune_llg_phys/sampler_tuning.json'))['best']; print(d['zeta_pde'])" 2>/dev/null || echo 0.5)
  timeout 2400 python test.py sampling_conf=llg dataset=llg_eq_joint \
    $PROTO observations.same_boundary=false \
    sampling_conf.zeta_a=$ZA sampling_conf.zeta_u=$ZU sampling_conf.zeta_pde=$ZP \
    sampling_conf.max_num_samples=32 run.items_per_batch=4 \
    +run.item_stride=311 +run.llg_full_physics=true \
    run.dir=runs_r5/eval_llg_phys_tuned > runs_r5/eval_llg_phys_tuned.log 2>&1
  python tools/summarize_eval.py runs_r5/eval_llg_phys_tuned/validation_data.npz \
    "{\"guidance\": \"llg_residual_loss (full physics), tuned ($ZA, $ZU, $ZP)\"}" \
    >> runs_r5/eval_llg_phys_tuned.log
fi

# ---- E: LLG parity run at the reference's untuned zetas (VERDICT 3b) ----
if [ -z "$SKIP_E" ]; then
  timeout 1800 python benchmarks/sweep_num_steps.py sampling_conf=llg \
    dataset=llg_eq_joint $PROTO observations.same_boundary=false \
    sampling_conf.zeta_a=10.0 sampling_conf.zeta_u=10.0 \
    sampling_conf.zeta_pde=0.5 "+sweep.steps=[300]" \
    run.dir=runs_r5/llg_ref_zetas \
    > runs_r5/llg_ref_zetas.log 2>&1
fi
echo CHAIN2_DONE
