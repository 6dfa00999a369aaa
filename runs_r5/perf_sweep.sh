#!/bin/bash
# Round-5 perf sweep: guidance modes x batch x param dtype, sequential
# single-TPU-client bench.py runs (each exits on its own).
cd /root/repo
OUT=runs_r5/perf_sweep.jsonl
: > $OUT
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> runs_r5/perf_sweep.log
  env "$@" timeout 900 python bench.py 2>> runs_r5/perf_sweep.log | tail -1 | \
    python -c "import sys,json; d=json.loads(sys.stdin.read()); d['tag']='$tag'; print(json.dumps(d))" >> $OUT
  echo "--- $tag done ($(date +%H:%M:%S))" >> runs_r5/perf_sweep.log
}
run exact_i4            BENCH_GUIDANCE_MODE=exact
run second_eval_i4      BENCH_GUIDANCE_MODE=second_eval
run x0_i4               BENCH_GUIDANCE_MODE=x0
run x0_i8               BENCH_GUIDANCE_MODE=x0 BENCH_ITEMS_PER_BATCH=8
run second_eval_i8      BENCH_GUIDANCE_MODE=second_eval BENCH_ITEMS_PER_BATCH=8
run second_eval_i4_pbf16 BENCH_GUIDANCE_MODE=second_eval BENCH_PARAM_DTYPE=bfloat16
run x0_i4_pbf16         BENCH_GUIDANCE_MODE=x0 BENCH_PARAM_DTYPE=bfloat16
echo ALL_DONE >> runs_r5/perf_sweep.log
