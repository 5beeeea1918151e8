#!/bin/bash
# Round-4e TPU campaign: picparts R=1 premium split + dp scale arms.
# ONE TPU process at a time (CLAUDE.md); arms run sequentially.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
LOG=/tmp/campaign_r4e.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? ---" | tee -a "$LOG"
}

# 1) picparts analytic R=1 stage split (attributes the 56 ms premium)
run env PS_PTCLS=10000000 PS_ITERS=10 python perf/picparts_split3.py

# 2) dp scale arms (the analytic path removed the walk-temp HBM ceiling)
run env BENCH_PTCLS=20000000 BENCH_ITERS=10 python bench.py
run env BENCH_PTCLS=50000000 BENCH_ITERS=10 python bench.py
run env BENCH_PTCLS=100000000 BENCH_ITERS=10 python bench.py

echo ALL_DONE | tee -a "$LOG"
