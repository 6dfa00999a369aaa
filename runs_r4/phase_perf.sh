#!/bin/bash
# Round-4 performance phase: dtype/matmul-precision A/B + items-per-batch
# sweep + roofline. Run AFTER phase_heat (tuned zetas known). One client
# at a time; every run exits by itself.
set -x
cd /root/repo

Z=${BZ:-20,0.5,0.2}   # tuned zetas (override with BZ=...)

# A/B 1: fp32 reference point (items 4) — usually already measured
if [ -z "$SKIP_FP32" ]; then
  BENCH_ZETAS=$Z python bench.py > runs_r4/bench_fp32_i4.json \
      2> runs_r4/bench_fp32_i4.log
fi

# A/B 2: fp32 activations + bf16 MXU passes
BENCH_MATMUL_PRECISION=bfloat16 BENCH_ZETAS=$Z python bench.py \
    > runs_r4/bench_mmbf16_i4.json 2> runs_r4/bench_mmbf16_i4.log

# A/B 3: full bf16 activations
BENCH_DTYPE=bfloat16 BENCH_ZETAS=$Z python bench.py \
    > runs_r4/bench_bf16_i4.json 2> runs_r4/bench_bf16_i4.log

# items-per-batch sweep at the best-quality fast config
for N in 8 16; do
  BENCH_MATMUL_PRECISION=bfloat16 BENCH_ITEMS_PER_BATCH=$N BENCH_ZETAS=$Z \
      python bench.py > runs_r4/bench_mmbf16_i$N.json \
      2> runs_r4/bench_mmbf16_i$N.log
done

# roofline / MFU accounting
python tools/profile_sampler.py > runs_r4/profile_sampler.log 2>&1
