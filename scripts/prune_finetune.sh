#!/bin/bash
# Pruned-decoder finetune: the full-resolution serving lever (VERDICT
# round-2 #3 — full-res >= 150 pairs/s with all quality gates green).
#
# Slices the promoted flow checkpoint's dense blocks to ~3/4 width
# (scripts/prune_flow.py keeps the highest-L1 channels bit-identical —
# a finetune init that never revisits the predict-zero basin the
# from-scratch slim retrain got stuck in, PLAN_NEXT 2026-08-19), then
# finetunes briefly on the full serving mixture and runs the standard
# gate battery.
#
# Usage: scripts/prune_finetune.sh [src_ckpt] [est_widths] [ctx_widths]
set -eu
cd "$(dirname "$0")/.."
SRC=${1:-weights/pwc_v6.fp16.npz}
EST=${2:-96,96,72,48,24}
CTX=${3:-96,96,96,72,48,24}

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== prune $SRC -> /tmp/pwc_p0.npz (est $EST ctx $CTX) =="
python scripts/prune_flow.py "$SRC" /tmp/pwc_p0.npz \
    --estimator "$EST" --context "$CTX"

echo "== stage P1: recovery finetune (192x448, serving mixture) =="
train --steps 4000 --batch 8 --height 192 --width 448 --lr 1e-4 --warmup 200 \
    --max-shift 96 --bg-max-shift 40 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.4 \
    --resume /tmp/pwc_p0.npz --checkpoint checkpoints/pwc_p1 \
    --save-every 1000 --seed 71

echo "== export candidate =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_p1",
                                   PipelineConfig().flownet)
save_flow_params_npz("/tmp/pwc_p1_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_p1_candidate.fp16.npz")
PYEOF

echo "== gates =="
timeout 2400 python scripts/eval_flow_ckpt.py /tmp/pwc_p1_candidate.fp16.npz \
    || echo "EVAL1 FAIL rc=$?"
timeout 3600 python scripts/eval_flow_ckpt.py /tmp/pwc_p1_candidate.fp16.npz 384 896 \
    || echo "EVAL2 FAIL rc=$?"
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p1_candidate.fp16.npz 192 448 10 || echo "DET1 FAIL rc=$?"
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p1_candidate.fp16.npz 384 896 8 2 2 || echo "DET2 FAIL rc=$?"
echo "== P1 DONE: if gates pass, bench full-res with this ckpt =="
