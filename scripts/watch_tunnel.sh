#!/bin/bash
# Poll the axon TPU tunnel; the moment it answers, run the pending
# measurement queue (scripts/tpu_checklist.sh) and exit. Launch in the
# background during an outage so no tunnel uptime is wasted:
#   nohup bash scripts/watch_tunnel.sh > /tmp/watch_tunnel.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
while true; do
    if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "tunnel UP at $(date)"
        bash scripts/tpu_checklist.sh
        echo "checklist done at $(date)"
        exit 0
    fi
    echo "tunnel still down at $(date)"
    sleep 300
done
