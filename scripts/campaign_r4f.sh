#!/bin/bash
# Round-4f TPU campaign: picparts arms with the gather-free banded routing
# (default) vs the packed 1-col [lid|route] gather (BENCH_ROUTE=gather A/B),
# plus the adaptive capacity configuration.  ONE TPU process at a time.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/campaign_r4f.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

run env BENCH_MODE=picparts BENCH_CAPF=1.05 BENCH_ITERS=10 python bench.py
run env BENCH_MODE=picparts BENCH_CAPF=1.05 BENCH_ROUTE=gather BENCH_ITERS=10 python bench.py
run env BENCH_MODE=picparts BENCH_CAPF=1.5 BENCH_ADAPT=1 BENCH_ITERS=10 python bench.py

echo ALL_DONE | tee -a "$LOG"
