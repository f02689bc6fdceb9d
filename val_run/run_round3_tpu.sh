#!/bin/bash
# Round-3 TPU measurement batch — run jobs SEQUENTIALLY (one process may
# hold the chip at a time). Usage: bash val_run/run_round3_tpu.sh [from]
# where `from` skips ahead (bench|records|localsearch|completeness|
# crossdomain|staging|scale).
set -x
cd "$(dirname "$0")/.."
FROM="${1:-bench}"
run_from() { [ "$(printf '%s\n' "$FROM" "$1" | sort | head -1)" ]; }

step() { echo "=== ROUND3-TPU: $1 $(date) ==="; }

if [ "$FROM" = "bench" ]; then
  step bench
  timeout 4200 python bench.py 2>&1 | tail -20
  FROM=records
fi
if [ "$FROM" = "records" ]; then
  step records
  timeout 7200 python val_run/run_validation.py eval 2>&1 | tail -15
  FROM=completeness
fi
if [ "$FROM" = "completeness" ]; then
  step completeness
  timeout 4200 python val_run/run_completeness.py 2>&1 | tee /tmp/comp.out | tail -8
  mkdir -p results/synthetic
  cp /tmp/comp.out results/synthetic/completeness_head.txt
  FROM=crossdomain
fi
if [ "$FROM" = "crossdomain" ]; then
  step crossdomain
  timeout 7200 python val_run/run_crossdomain.py reverse 2>&1 | tail -6
  timeout 7200 python val_run/run_crossdomain.py mix 2>&1 | tail -6
  FROM=staging
fi
if [ "$FROM" = "staging" ]; then
  step staging
  timeout 7200 python val_run/run_staging_bench.py 2>&1 | tail -16
  FROM=scale
fi
if [ "$FROM" = "scale" ]; then
  step scale
  timeout 7200 python val_run/run_scale.py 2>&1 | tail -12
fi
echo "=== ROUND3-TPU DONE $(date) ==="
