#!/bin/sh
# Probe the axon tunnel every 3 minutes; when it answers, run the serial
# TPU backlog (scripts/tpu_backlog.sh).  Logs to /tmp/tpu_backlog.log.
# A dead tunnel makes any device use HANG (not raise), so every probe is
# wrapped in `timeout`.
cd "$(dirname "$0")/.."
while true; do
    if timeout 100 python -c "import jax, jax.numpy as jnp; print(float(jnp.zeros(8).sum()))" >/dev/null 2>&1; then
        echo "TUNNEL UP at $(date)" >> /tmp/tpu_backlog.log
        sh scripts/tpu_backlog.sh >> /tmp/tpu_backlog.log 2>&1
        exit 0
    fi
    echo "tunnel still down at $(date)" >> /tmp/tpu_backlog.log
    sleep 180
done
