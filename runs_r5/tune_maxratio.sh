#!/bin/bash
cd /root/repo
PROTO="observations.interior_a=0.2 observations.boundary_a=0.2 observations.interior_u=0.0 observations.boundary_u=0.0 observations.same_interior=false observations.same_boundary=false"
for MODE in hybrid second_eval; do
  echo "=== tune-maxratio $MODE ($(date +%H:%M:%S)) ===" >> runs_r5/tune_mr.log
  timeout 2400 python tools/tune_sampler.py sampling_conf=heat_logt_joint_tuned \
    dataset=heat_eq_logt_joint $PROTO \
    +run.eval_dtype=bfloat16 +run.guidance_mode=$MODE \
    +tune.n_calls=36 +tune.n_items=4 +tune.objective=maxratio \
    run.dir=runs_r5/tune_mr_$MODE 2>> runs_r5/tune_mr.log
  Z=$(python -c "import json; d=json.load(open('runs_r5/tune_mr_$MODE/sampler_tuning.json'))['best']; print(f\"{d['zeta_a']},{d['zeta_u']},{d['zeta_pde']}\")")
  echo "=== bench $MODE maxratio zetas=$Z ($(date +%H:%M:%S)) ===" >> runs_r5/tune_mr.log
  BENCH_GUIDANCE_MODE=$MODE BENCH_ZETAS=$Z timeout 900 python bench.py \
    2>> runs_r5/tune_mr.log | tail -1 | \
    python -c "import sys,json; d=json.loads(sys.stdin.read()); d['tag']='${MODE}_i4_mrtuned'; print(json.dumps(d))" >> runs_r5/perf_sweep.jsonl
done
echo MRTUNE_DONE >> runs_r5/tune_mr.log
