#!/bin/bash
# Stage P2 — the full-resolution 150 pairs/s lever (VERDICT round-3 #3):
# pyramid + deep estimator/context structured prune of the promoted
# pwc_v6m3, then recovery finetune.
#
# Why P2 after P1: the decoder-only prune (pwc_p1, est/ctx at 75%) bought
# only 0.3 ms because full-res flow cost is pyramid+correlation-dominated
# (BENCH_MATRIX round-4 full-res row). P2 therefore also slims the
# FEATURE pyramid (prune_flow.py --pyramid, with the correlation
# mean-divisor compensation so zero-channel pruning stays exact) and cuts
# the dense blocks to 50%. More quality risk than P1 — gate hard, promote
# only on the full battery:
#   - eval_flow_ckpt at 192x448 AND 384x896 (EPE floor both scales)
#   - validate_detection_quality at both scales
#   - validate_scene_matrix --vel-gate 0.6 (lateral/multi/occlusion)
# If the 50% recovery misses gates, retry EST/CTX at 75% with the same
# pyramid targets before giving up on the pyramid prune.
#
# Usage: scripts/prune_finetune2.sh [src_ckpt] [steps]
set -eu
cd "$(dirname "$0")/.."
SRC=${1:-weights/pwc_v6m3.fp16.npz}
STEPS=${2:-4000}
PYR=16,24,48,72,96,128
EST=64,64,48,32,16
CTX=64,64,64,48,32,16

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== prune $SRC -> /tmp/pwc_p2_init.npz (pyr $PYR est $EST ctx $CTX) =="
python scripts/prune_flow.py "$SRC" /tmp/pwc_p2_init.npz \
    --pyramid "$PYR" --estimator "$EST" --context "$CTX"

echo "== stage P2: recovery finetune (192x448, serving mixture) =="
train --steps "$STEPS" --batch 8 --height 192 --width 448 --lr 1e-4 --warmup 200 \
    --max-shift 96 --bg-max-shift 40 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.4 --motion-contrast 4.0 \
    --resume /tmp/pwc_p2_init.npz --checkpoint checkpoints/pwc_p2 \
    --save-every 1000 --seed 83

echo "== export candidate =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_p2",
                                   PipelineConfig().flownet)
save_flow_params_npz("/tmp/pwc_p2_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_p2_candidate.fp16.npz")
PYEOF

echo "== gates =="
timeout 2400 python scripts/eval_flow_ckpt.py /tmp/pwc_p2_candidate.fp16.npz \
    || echo "EVAL1 FAIL rc=$?"
timeout 3600 python scripts/eval_flow_ckpt.py /tmp/pwc_p2_candidate.fp16.npz 384 896 \
    || echo "EVAL2 FAIL rc=$?"
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p2_candidate.fp16.npz 192 448 10 || echo "DET1 FAIL rc=$?"
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p2_candidate.fp16.npz 384 896 8 2 2 || echo "DET2 FAIL rc=$?"
timeout 2400 python scripts/validate_scene_matrix.py \
    /tmp/pwc_p2_candidate.fp16.npz --vel-gate 0.6 || echo "MATRIX FAIL rc=$?"
echo "== P2 DONE: on all-PASS, cp candidate to weights/pwc_p2.fp16.npz, allowlist with measured numbers, bench full-res =="
