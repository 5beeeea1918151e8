#!/usr/bin/env bash
# Round-4 follow-up TPU campaign (run AFTER scripts/bench_all.sh):
# rot_analytic A/B, adaptive-picparts re-measure with per-iter diagnostics,
# 50%-churn rebuild conservation check, sigma-window sweep.
set -e
cd "$(dirname "$0")/.."

run() { echo "== $*" >&2; env "$@" python bench.py; }

run BENCH_MODE=dp                        # fresh default (analytic rot)
run BENCH_MODE=dp BENCH_ROT_ANALYTIC=0   # A/B arm: keep the rot-table gather
echo "== adaptive picparts re-measure (per-iter diagnostics)" >&2
BENCH_MODE=picparts BENCH_CAPF=1.5 BENCH_ADAPT=1 BENCH_PERIT=1 python bench.py
echo "== reshuffle 50% churn conservation" >&2
RS_DENOMS=2 python perf/reshuffle_ab.py
echo "== sigma sweep" >&2
SG_SIGMAS=64,256,1024,full python perf/sigma_sweep.py
