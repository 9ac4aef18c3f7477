#!/bin/bash
# Continuation of scripts/retrain_flow.sh from stage B, v2: stage A is done
# (checkpoints/pwc_v3.sA, EPE 1.04 / spurious 0.0%). The first stage-B run
# (fixed shift 48) regressed the static fine-texture spurious rate to 43.4%;
# data_synth now applies a per-sample magnitude mixture (10% exactly static),
# and the shift ceilings are raised to offset the mixture's dilution.
set -eu
cd "$(dirname "$0")/.."
S2=8000; S3=4000
train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }
score() { echo "== eval $1 =="; timeout 1800 python scripts/eval_flow_ckpt.py "$@"; }

echo "== stage B: magnitude extension (192x448, shift 56 * mag mixture) =="
train --steps $S2 --batch 8 --height 192 --width 448 --lr 1.5e-4 --warmup 300 \
    --max-shift 56 --bg-max-shift 28 --resume checkpoints/pwc_v3.sA \
    --checkpoint checkpoints/pwc_v3.sB --save-every 2000 --seed 12
score checkpoints/pwc_v3.sB

echo "== stage C: high res, large shift (256x576, shift 72 * mag mixture) =="
train --steps $S3 --batch 6 --height 256 --width 576 --lr 8e-5 --warmup 200 \
    --max-shift 72 --bg-max-shift 32 --resume checkpoints/pwc_v3.sB \
    --checkpoint checkpoints/pwc_v3 --save-every 1000 --seed 13
score checkpoints/pwc_v3
score checkpoints/pwc_v3 256 576

echo "== export fp16 npz =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params_abstract
from moving_object_detector_tpu.utils.checkpoint import (
    restore_flow_params, save_flow_params_npz)
model = PWCNet(config=PipelineConfig().flownet)
params = restore_flow_params(
    "checkpoints/pwc_v3", like=init_pwc_params_abstract(model))
save_flow_params_npz("weights/pwc_v3.fp16.npz", jax.device_get(params))
print("wrote weights/pwc_v3.fp16.npz")
PYEOF
echo "== end-to-end detection gate =="
timeout 1800 python scripts/validate_detection_quality.py \
    weights/pwc_v3.fp16.npz 192 448 10
echo "== RESUME-B DONE =="
