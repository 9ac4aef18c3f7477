#!/bin/bash
# Staged flow-net retraining (PLAN_NEXT item 4) — run when the TPU is up.
#
# Fixes the two measured failure modes of weights/pwc_v2.fp16.npz:
#   a) fine-only-texture hallucination: the generator now drops coarse
#      octaves on ~30% of textures (train/data_synth.py); resuming on the
#      new distribution teaches "uniform coarse level => near-zero flow".
#   b) magnitude ceiling: v2 saw max_shift<=24 px; KITTI ego flows exceed
#      100 px at 1242 width (~36 px at the 448 training width). Stages
#      extend to 48 then 64 px with a higher-resolution final stage.
#
# Stage A resumes from $RESUME_FROM (default: the bundled fp16 npz, which
# survives machine resets; an orbax dir also works). Later stages resume
# from the previous stage's checkpoint; each is scored with
# scripts/eval_flow_ckpt.py (EPE on the held-out batch + static
# fine-texture spurious-flow rate). Final artifact:
# checkpoints/pwc_v3 (orbax) + weights/pwc_v3.fp16.npz.
#
# Usage: bash scripts/retrain_flow.sh [--quick]
set -eu
cd "$(dirname "$0")/.."
QUICK=${1:-}
S1=6000; S2=8000; S3=4000
if [ "$QUICK" = "--quick" ]; then S1=300; S2=300; S3=200; fi

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }
score() { echo "== eval $1 =="; timeout 1800 python scripts/eval_flow_ckpt.py "$@"; }

echo "== stage A: adapt to coarse-dropout textures (192x448, shift 24) =="
train --steps $S1 --batch 8 --height 192 --width 448 --lr 2e-4 --warmup 300 \
    --max-shift 24 --bg-max-shift 10 --resume "${RESUME_FROM:-weights/pwc_v2.fp16.npz}" \
    --checkpoint checkpoints/pwc_v3.sA --save-every 2000 --seed 11
score checkpoints/pwc_v3.sA

echo "== stage B: magnitude extension (192x448, shift 48) =="
train --steps $S2 --batch 8 --height 192 --width 448 --lr 1.5e-4 --warmup 300 \
    --max-shift 48 --bg-max-shift 20 --resume checkpoints/pwc_v3.sA \
    --checkpoint checkpoints/pwc_v3.sB --save-every 2000 --seed 12
score checkpoints/pwc_v3.sB

echo "== stage C: high res, large shift (256x576, shift 64) =="
train --steps $S3 --batch 6 --height 256 --width 576 --lr 8e-5 --warmup 200 \
    --max-shift 64 --bg-max-shift 24 --resume checkpoints/pwc_v3.sB \
    --checkpoint checkpoints/pwc_v3 --save-every 1000 --seed 13
score checkpoints/pwc_v3
score checkpoints/pwc_v3 256 576

echo "== export fp16 npz =="
python - <<'EOF'
import jax, jax.numpy as jnp
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params_abstract
from moving_object_detector_tpu.utils.checkpoint import (
    restore_flow_params, save_flow_params_npz)
model = PWCNet(config=PipelineConfig().flownet)
params = restore_flow_params(
    "checkpoints/pwc_v3", like=init_pwc_params_abstract(model))
save_flow_params_npz("weights/pwc_v3.fp16.npz", jax.device_get(params))
print("wrote weights/pwc_v3.fp16.npz")
EOF
echo "== end-to-end detection gate (must PASS: no phantoms, >=70% hits;"
echo "   v2 baseline: 1/3 hits, 4 phantoms) =="
timeout 1800 python scripts/validate_detection_quality.py \
    weights/pwc_v3.fp16.npz 192 448 10

echo "== DONE. Compare evals above against v2 (EPE<4.5 floor; static"
echo "   fine-texture spurious rate target <5%, v2 was 35.7%). If good:"
echo "   switch utils/checkpoint.default_flow_checkpoint to pwc_v3 and"
echo "   rerun tests + bench."
