#!/bin/bash
cd /root/repo
for CFG in "upsample2" "upsample2_pallasgn BENCH_PALLAS_GN=1"; do
  set -- $CFG; TAG=$1; shift
  echo "=== $TAG ($(date +%H:%M:%S)) ===" >> runs_r5/ab2.log
  env "$@" timeout 900 python bench.py 2>> runs_r5/ab2.log | tail -1 | \
    python -c "import sys,json; d=json.loads(sys.stdin.read()); d['tag']='$TAG'; print(json.dumps(d))" >> runs_r5/perf_sweep.jsonl
done
echo AB2_DONE >> runs_r5/ab2.log
