#!/bin/bash
# Round-4 heat endgame. Each phase gated by an env var so phases can be
# run individually; nothing here deletes committed artifacts, and every
# TPU run exits by itself (tunnel-poisoning gotcha,
# .claude/skills/verify/SKILL.md). Default: all phases on.
set -x
cd /root/repo

# P1: promote the finished flagship EMA (guarded — ADVICE r3)
if [ -z "$SKIP_P1" ]; then
  SRC=runs_r3/heat_logt_joint_unet-v2
  if [ -d "$SRC/ema_model" ]; then
    mkdir -p pretrained_models/heat_logt_joint
    rm -rf pretrained_models/heat_logt_joint/ema_model
    cp -r "$SRC/ema_model" pretrained_models/heat_logt_joint/ema_model
  else
    echo "P1: no final ema_model (training incomplete?) — keeping committed"
  fi
fi

# P2: tune zetas for THIS checkpoint (30 calls, one execution each)
if [ -z "$SKIP_P2" ]; then
  python tools/tune_sampler.py sampling_conf=heat_logt_joint \
      dataset=heat_eq_logt_joint observations.interior_a=0.2 \
      observations.boundary_a=0.2 observations.interior_u=0.0 \
      observations.boundary_u=0.0 observations.same_boundary=false \
      '+tune.n_calls=30' '+tune.n_items=4' \
      run.dir=/root/repo/runs_r4 > runs_r4/tune_sampler.log 2>&1
fi

# P3: reference-protocol heat eval — 1000 items, sequential prefix,
# fp32, tuned zetas (pass ZA/ZU/ZP from runs_r4/sampler_tuning.json)
if [ -z "$SKIP_P3" ]; then
  python test.py sampling_conf=heat_logt_joint dataset=heat_eq_logt_joint \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      sampling_conf.max_num_samples=${EVAL_ITEMS:-1000} \
      run.items_per_batch=4 \
      ${ZA:+sampling_conf.zeta_a=$ZA} ${ZU:+sampling_conf.zeta_u=$ZU} \
      ${ZP:+sampling_conf.zeta_pde=$ZP} \
      run.dir=/root/repo/runs_r4/eval_heat > runs_r4/eval_heat.log 2>&1
fi

# P4: trained-mode bench, 20/50/200-step curves, tuned zetas
if [ -z "$SKIP_P4" ]; then
  BENCH_STEPS=20,50,200 ${BZ:+BENCH_ZETAS=$BZ} python bench.py \
      > runs_r4/bench_trained.json 2> runs_r4/bench_trained.log
fi

# P5: num_steps + zeta sweep figures (mid-domain item)
if [ -z "$SKIP_P5" ]; then
  python benchmarks/sweep_num_steps.py sampling_conf=heat_logt_joint \
      dataset=heat_eq_logt_joint '+sweep.steps=[20,50,200]' \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      ${ZA:+sampling_conf.zeta_a=$ZA} ${ZU:+sampling_conf.zeta_u=$ZU} \
      ${ZP:+sampling_conf.zeta_pde=$ZP} \
      run.dir=/root/repo/benchmarks/results > runs_r4/sweep_num_steps.log 2>&1
  python benchmarks/sweep_zeta.py sampling_conf=heat_logt_joint \
      dataset=heat_eq_logt_joint '+sweep.scales=[0.1,1.0,10.0]' \
      observations.interior_a=0.2 observations.boundary_a=0.2 \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_boundary=false \
      ${ZA:+sampling_conf.zeta_a=$ZA} ${ZU:+sampling_conf.zeta_u=$ZU} \
      ${ZP:+sampling_conf.zeta_pde=$ZP} \
      run.dir=/root/repo/benchmarks/results > runs_r4/sweep_zeta.log 2>&1
fi

# P6: roofline profile
if [ -z "$SKIP_P6" ]; then
  python tools/profile_sampler.py > runs_r4/profile_sampler.log 2>&1
fi
