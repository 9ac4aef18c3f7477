#!/bin/bash
# Post-slim-retrain automation (keeps the single chip saturated):
#   1. the moment train_flow_slim.sh exits, grab the UNCONTENDED profiling
#      window: op-level trace of detect_step + the (H,W,3) layout probe
#      (both meaningless while a trainer timeshares the chip);
#   2. launch stage E (scale-2 serving-distribution finetune,
#      finetune_flow_scale2.sh) on the WIDE pwc_v4 — independent of slim's
#      outcome and the biggest end-to-end lever (141.5 vs 95.6 pairs/s if
#      the scale-2 quality gates pass).
# Logs: /tmp/tpu_logs/{trace_idle,layout_idle}.log, /tmp/train_e_wide.log.
set -u
cd "$(dirname "$0")/.."
PID=${1:?pid of the slim training shell}
while kill -0 "$PID" 2>/dev/null; do sleep 30; done
mkdir -p /tmp/tpu_logs
echo "== slim train done ($(date)): idle profiling window =="
timeout 1200 python scripts/profile_trace.py --trained --frames 30 \
    > /tmp/tpu_logs/trace_idle.log 2>&1
timeout 1200 python scripts/profile_layout.py \
    > /tmp/tpu_logs/layout_idle.log 2>&1
echo "== launching stage E on wide pwc_v4 =="
nohup bash scripts/finetune_flow_scale2.sh checkpoints/pwc_v4 pwc_v4e \
    > /tmp/train_e_wide.log 2>&1 &
echo $! > /tmp/train_e_wide.pid
echo "stage E (wide) pid $(cat /tmp/train_e_wide.pid)"
