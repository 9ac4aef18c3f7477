#!/bin/bash
# pwc_v6m — stage M: motion-contrast finetune from the L1 local-motion
# checkpoint (scripts/train_flow_v6.sh stage L1).
#
# Round-3 measurements that shaped this recipe:
#   - L1 (local-motion curriculum, uniform loss) wins the planar scene
#     matrix (vel err 0.32/0.52/0.40 vs v5's 0.62/0.63/0.55) but still
#     fails the paste probe (~1.9 px under-tracking) — curriculum alone
#     cannot beat the uniform-loss gradient starvation on object pixels.
#   - Stage L2 (shift 112, uniform loss) regressed local motion entirely
#     (v6-final matrix 0.71/0.64/0.78, paste ~2.0 px): large-shift
#     background dominates the uniform loss.
#   - Fix: --motion-contrast 4 (flow_trainer.motion_contrast_weights)
#     gives independently-moving pixels (1+4)x weight, so the local and
#     large-motion regimes stop competing.
#   - L1 @384x896: scale-2 EPE 1.84 (gate <4.5 PASS) but [24,64) bin
#     12.4 / [64,160) 45.2 — the shift-112 mixture here must restore
#     those without the L2 regression.
#
# Usage: scripts/train_flow_v6m.sh [resume] [steps]
set -eu
cd "$(dirname "$0")/.."
RESUME=${1:-checkpoints/pwc_v6.sL1}
STEPS=${2:-6000}

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== stage M: motion-contrast joint finetune (192x448, shift 112) =="
train --steps "$STEPS" --batch 8 --height 192 --width 448 --lr 5e-5 --warmup 200 \
    --max-shift 112 --bg-max-shift 48 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.5 --motion-contrast 4.0 \
    --resume "$RESUME" --checkpoint checkpoints/pwc_v6m \
    --save-every 1000 --seed 63

echo "== export candidate =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_v6m",
                                   PipelineConfig().flownet)
save_flow_params_npz("/tmp/pwc_v6m_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_v6m_candidate.fp16.npz")
PYEOF
echo "== M DONE: run /tmp-gates (eval_flow_ckpt, detection, scene matrix, paste) =="
