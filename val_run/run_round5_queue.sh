#!/bin/sh
# Round-5 TPU record queue: waits for the pretrain pipeline (PID $1) to
# exit, checks the flagship checkpoint was actually rewritten, then runs
# every record regeneration in sequence on the (now free) TPU.
# Usage: nohup sh val_run/run_round5_queue.sh <pretrain_pid> > /tmp/queue_r5.log 2>&1 &
set -x
cd /root/repo
PID=${1:?pretrain pid}
START=$(date +%s)

while kill -0 "$PID" 2>/dev/null; do sleep 30; done
echo "pretrain pid $PID exited after $(( $(date +%s) - START ))s"
sleep 10   # let the TPU lease drop

CKPT=/root/repo/models/synthetic_pretrained.npz
AGE=$(( $(date +%s) - $(stat -c %Y "$CKPT") ))
if [ "$AGE" -gt 600 ]; then
    echo "QUEUE ABORT: checkpoint not refreshed (age ${AGE}s) — retrain failed?"
    exit 1
fi
echo "checkpoint refreshed ${AGE}s ago — running the record queue"

run() { echo "=== $* ==="; timeout 7200 "$@"; echo "=== exit $? ==="; }

# ordered cheapest/most-critical first: if the session is cut mid-queue,
# the records that back the round-5 verdict claims (cap quality, local
# search A/B, outdoor set) land before the long sweeps
run python bench.py
run python val_run/run_cap.py
run python val_run/run_hbm_cap.py
run python val_run/run_localsearch_ab.py
run python val_run/run_outdoor.py all
run python val_run/run_gsweep.py 131072
run python val_run/run_gsweep.py 262144
run python val_run/run_scale.py
run python val_run/run_phase_breakdown.py
run python val_run/run_crossdomain.py methods
echo "QUEUE DONE after $(( $(date +%s) - START ))s"
