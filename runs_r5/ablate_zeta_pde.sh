#!/bin/bash
# zeta_pde ablation at the reference protocol (VERDICT r4 item 3a):
# does PDE-residual guidance move ANY metric? 32 spread items, two obs
# regimes (protocol 0.2/0.2 and sparse 0.05/0.0 — physics should matter
# most when observations are scarce), zeta_pde in {0, serving(0.0237),
# 1, 20}, serving config (bf16, second_eval, maxratio-tuned zeta_a/u).
cd /root/repo
for REG in proto sparse; do
  if [ $REG = proto ]; then OBS="observations.interior_a=0.2 observations.boundary_a=0.2"
  else OBS="observations.interior_a=0.05 observations.boundary_a=0.0"; fi
  for ZP in 0.0 0.0237 1.0 20.0; do
    DIR=runs_r5/ablate_zpde/${REG}_zp${ZP}
    mkdir -p $DIR
    echo "=== $REG zeta_pde=$ZP ($(date +%H:%M:%S)) ===" >> runs_r5/ablate_zpde/run.log
    timeout 1800 python test.py sampling_conf=heat_logt_joint_serving \
      dataset=heat_eq_logt_joint $OBS \
      observations.interior_u=0.0 observations.boundary_u=0.0 \
      observations.same_interior=false observations.same_boundary=false \
      sampling_conf.zeta_pde=$ZP \
      sampling_conf.max_num_samples=32 +run.item_stride=31 \
      run.items_per_batch=4 run.dir=$DIR \
      2>&1 | grep -avE "cpu_aot_loader|Machine type" | tail -6 >> runs_r5/ablate_zpde/run.log
    python tools/summarize_eval.py $DIR/validation_data.npz \
      "{\"regime\": \"$REG\", \"zeta_pde\": $ZP}" >> runs_r5/ablate_zpde/run.log
  done
done
echo ABLATE_DONE
