#!/usr/bin/env bash
# Run every bench mode sequentially (ONE TPU process at a time) and record
# each as a BENCH_SIDE.json entry (bench.py record_side).  The driver's
# flagship metric stays the plain `python bench.py` stdout line.
#
#   PYTHONPATH=/root/repo bash scripts/bench_all.sh
set -e
cd "$(dirname "$0")/.."

run() { echo "== $*" >&2; env "$@" python bench.py; }

run BENCH_MODE=dp                         # structured analytic locate
run BENCH_MODE=dp BENCH_ANALYTIC=off      # general unstructured walk
run BENCH_MODE=picparts BENCH_CAPF=1.05
run BENCH_MODE=picparts BENCH_CAPF=1.5
run BENCH_MODE=picparts BENCH_CAPF=1.5 BENCH_ADAPT=1
run BENCH_MODE=pps3d                      # structured analytic locate
run BENCH_MODE=pps3d BENCH_KUHN=off       # general unstructured walk
run BENCH_MODE=dp BENCH_MESH=data/xgc_like_120k.msh.gz
