#!/usr/bin/env bash
# Build the native host-side kernels into shared libraries loaded via
# ctypes (dpde_tpu/native/*.py). Pure g++, no external deps.
set -euo pipefail
cd "$(dirname "$0")"
CXX=${CXX:-g++}
FLAGS="-O3 -march=native -fPIC -shared -std=c++17"
if $CXX -fopenmp -x c++ -c /dev/null -o /dev/null 2>/dev/null; then
  FLAGS="$FLAGS -fopenmp"
fi
$CXX $FLAGS newell.cc -o libnewell.so
echo "built $(pwd)/libnewell.so"
