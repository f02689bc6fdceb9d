#!/bin/sh
# Wrapper: wait (in throwaway subprocesses) until the single-client axon TPU
# claim is grabbable, then launch the validation in a FRESH interpreter.
# (A process whose registration failed once cannot recover even via execv —
# the plugin's client-identity env vars leak through.)
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"
i=0
while [ $i -lt 40 ]; do
    if timeout 120 python -c "import jax; assert jax.devices()[0].platform=='tpu'" 2>/dev/null; then
        exec python val_run/run_validation.py
    fi
    echo "TPU not grabbable (attempt $i); waiting"
    i=$((i+1))
    sleep 15
done
echo "TPU never became available" >&2
exit 2
