#!/bin/bash
# Round-3 TPU measurement batch — run jobs SEQUENTIALLY (one process may
# hold the chip at a time). Usage:
#   bash val_run/run_round3_tpu.sh [stage ...]
# with stages from: bench pretrain records completeness crossdomain
# staging scale. No args = all, in that order. `bench` validates the new
# multi-room/pipelined headline on the existing checkpoint first;
# `pretrain` then retrains with the near-cap mix, and later stages record
# against the NEW checkpoint.
set -x
cd "$(dirname "$0")/.."
STAGES="${*:-bench pretrain records completeness crossdomain staging scale}"

step() { echo "=== ROUND3-TPU: $1 $(date) ==="; }

for s in $STAGES; do
  case "$s" in
    bench)
      step bench
      timeout 4200 python bench.py 2>&1 | tail -20 ;;
    pretrain)
      step pretrain
      timeout 9000 python val_run/run_pretrain.py data 2>&1 | tail -8
      timeout 10800 python val_run/run_pretrain.py train 2>&1 | tail -6
      # headline again on the new checkpoint
      timeout 4200 python bench.py 2>&1 | tail -8 ;;
    records)
      step records
      timeout 10800 python val_run/run_validation.py eval 2>&1 | tail -15
      timeout 4200 python val_run/run_emb.py eval 2>&1 | tail -4 ;;
    completeness)
      step completeness
      timeout 4200 python val_run/run_completeness.py 2>&1 \
        | tee /tmp/comp.out | tail -8
      mkdir -p results/synthetic
      cp /tmp/comp.out results/synthetic/completeness_head.txt ;;
    crossdomain)
      step crossdomain
      timeout 7200 python val_run/run_crossdomain.py reverse 2>&1 | tail -6
      timeout 7200 python val_run/run_crossdomain.py mix 2>&1 | tail -6 ;;
    staging)
      step staging
      timeout 7200 python val_run/run_staging_bench.py 2>&1 | tail -16 ;;
    scale)
      step scale
      timeout 10800 python val_run/run_scale.py 2>&1 | tail -14 ;;
    cap)
      step cap
      timeout 4200 python val_run/run_cap.py 2>&1 | tail -6 ;;
    *) echo "unknown stage $s" ;;
  esac
done
echo "=== ROUND3-TPU DONE $(date) ==="
