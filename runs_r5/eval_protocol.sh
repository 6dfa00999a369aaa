#!/bin/bash
# bf16 serving-config 1000-item reference-protocol heat eval (VERDICT r4
# item 2), under the freeze watchdog (item 8).
cd /root/repo
DIR=runs_r5/eval_heat_serving
mkdir -p $DIR
python tools/watchdog.py --stall-s 240 --cooloff-s 660 --max-restarts 2 -- \
  python test.py sampling_conf=heat_logt_joint_serving dataset=heat_eq_logt_joint \
    observations.interior_a=0.2 observations.boundary_a=0.2 \
    observations.interior_u=0.0 observations.boundary_u=0.0 \
    observations.same_interior=false observations.same_boundary=false \
    run.items_per_batch=4 run.dir=$DIR \
    ${EXTRA_OVERRIDES} \
    2>&1 | grep -avE "cpu_aot_loader|Machine type" > $DIR/eval.log
python tools/summarize_eval.py $DIR/validation_data.npz \
  '{"protocol": "reference test2.py: 1000 sequential view items, masks interior_a=0.2 boundary_a=0.2, u unobserved, 50 steps, 32 samples; SERVING config: bfloat16, second_eval guidance, maxratio-tuned zetas"}' \
  >> $DIR/eval.log
tail -3 $DIR/eval.log
echo PROTO_DONE
