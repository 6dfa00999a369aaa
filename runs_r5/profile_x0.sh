#!/bin/bash
# x0-mode profiles: (a) i4 with xprof trace -> per-op table; (b) i8
# without trace -> isolate the items_per_batch regression from bench's
# per-call host->device uploads (profile_sampler reuses device args).
cd /root/repo
GUIDANCE_MODE=x0 PROFILE_TRACE=logs/profile_r5_x0 REPS=2 ITEMS_PER_BATCH=4 \
  timeout 1200 python tools/profile_sampler.py \
  > runs_r5/profile_x0_i4.json 2> runs_r5/profile_x0_i4.log
cp benchmarks/results/profile_sampler.json runs_r5/profile_x0_i4_report.json 2>/dev/null
GUIDANCE_MODE=x0 REPS=3 ITEMS_PER_BATCH=8 \
  timeout 1200 python tools/profile_sampler.py \
  > runs_r5/profile_x0_i8.json 2> runs_r5/profile_x0_i8.log
cp benchmarks/results/profile_sampler.json runs_r5/profile_x0_i8_report.json 2>/dev/null
echo PROFILE_DONE
