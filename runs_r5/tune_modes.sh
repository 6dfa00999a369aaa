#!/bin/bash
# Retune zetas per guidance mode (serving dtype bf16), then re-bench.
cd /root/repo
PROTO="observations.interior_a=0.2 observations.boundary_a=0.2 observations.interior_u=0.0 observations.boundary_u=0.0 observations.same_interior=false observations.same_boundary=false"
for MODE in x0 second_eval; do
  echo "=== tune $MODE ($(date +%H:%M:%S)) ===" >> runs_r5/tune_modes.log
  timeout 2400 python tools/tune_sampler.py sampling_conf=heat_logt_joint_tuned \
    dataset=heat_eq_logt_joint $PROTO \
    +run.eval_dtype=bfloat16 +run.guidance_mode=$MODE \
    +tune.n_calls=30 +tune.n_items=4 run.dir=runs_r5/tune_$MODE \
    2>> runs_r5/tune_modes.log
  Z=$(python -c "import json; d=json.load(open('runs_r5/tune_$MODE/sampler_tuning.json'))['best']; print(f\"{d['zeta_a']},{d['zeta_u']},{d['zeta_pde']}\")")
  echo "=== bench $MODE tuned zetas=$Z ($(date +%H:%M:%S)) ===" >> runs_r5/tune_modes.log
  BENCH_GUIDANCE_MODE=$MODE BENCH_ZETAS=$Z timeout 900 python bench.py \
    2>> runs_r5/tune_modes.log | tail -1 | \
    python -c "import sys,json; d=json.loads(sys.stdin.read()); d['tag']='${MODE}_i4_tuned'; print(json.dumps(d))" >> runs_r5/perf_sweep.jsonl
done
echo TUNE_DONE >> runs_r5/tune_modes.log
