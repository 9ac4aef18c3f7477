#!/bin/bash
# Train the SLIM decoder variant (PLAN_NEXT item 2: flow fwd is the #1
# stage at 3.25 ms; halved estimator/context widths cut the decoder conv
# FLOPs ~4x). From scratch, so the pool curriculum escapes the
# predict-zero basin first (measured: fresh-data-from-scratch stalls >=3k
# steps; pool 8 -> 64 -> 0 escapes in minutes), then the same staged
# magnitude recipe as pwc_v3 (data_synth's per-sample magnitude mixture
# keeps static scenes in-distribution throughout).
#
# Artifacts: checkpoints/pwc_v4s (orbax) + weights/pwc_v4s.fp16.npz.
# Serving needs no flags: checkpoints are shape-self-describing.
set -eu
cd "$(dirname "$0")/.."
SLIM="--estimator-channels 64,64,48,32,16 --context-channels 64,64,64,48,32,16"
train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }
score() { echo "== eval $1 =="; timeout 1800 python scripts/eval_flow_ckpt.py "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== stage 0: basin escape (pool curriculum) =="
train --steps 400 --batch 8 --height 128 --width 320 --lr 3e-4 --warmup 100 \
    --max-shift 8 --bg-max-shift 4 --pool 8 $SLIM --constant-lr \
    --checkpoint checkpoints/pwc_v4s.s0a --seed 21
train --steps 600 --batch 8 --height 128 --width 320 --lr 3e-4 --warmup 0 \
    --max-shift 12 --bg-max-shift 6 --pool 64 $SLIM --constant-lr \
    --resume checkpoints/pwc_v4s.s0a --checkpoint checkpoints/pwc_v4s.s0b --seed 22

echo "== stage A: fresh data, small shifts (192x448, shift 24) =="
train --steps 6000 --batch 8 --height 192 --width 448 --lr 2e-4 --warmup 300 \
    --max-shift 24 --bg-max-shift 10 --resume checkpoints/pwc_v4s.s0b \
    --checkpoint checkpoints/pwc_v4s.sA --save-every 2000 --seed 23
score checkpoints/pwc_v4s.sA

echo "== stage B: magnitude extension (192x448, shift 56 * mag mixture) =="
train --steps 8000 --batch 8 --height 192 --width 448 --lr 1.5e-4 --warmup 300 \
    --max-shift 56 --bg-max-shift 28 --resume checkpoints/pwc_v4s.sA \
    --checkpoint checkpoints/pwc_v4s.sB --save-every 2000 --seed 24
score checkpoints/pwc_v4s.sB

echo "== stage C: high res, large shift (256x576, shift 72 * mag mixture) =="
train --steps 4000 --batch 6 --height 256 --width 576 --lr 8e-5 --warmup 200 \
    --max-shift 72 --bg-max-shift 32 --resume checkpoints/pwc_v4s.sB \
    --checkpoint checkpoints/pwc_v4s --save-every 1000 --seed 25
score checkpoints/pwc_v4s
score checkpoints/pwc_v4s 256 576

echo "== export fp16 npz =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint(
    "checkpoints/pwc_v4s", PipelineConfig().flownet)
save_flow_params_npz("weights/pwc_v4s.fp16.npz", jax.device_get(params))
print("wrote weights/pwc_v4s.fp16.npz", cfg.estimator_channels)
PYEOF
echo "== end-to-end detection gate =="
timeout 1800 python scripts/validate_detection_quality.py \
    weights/pwc_v4s.fp16.npz 192 448 10
echo "== SLIM DONE. Bench with: python bench.py --flow-checkpoint"
echo "   weights/pwc_v4s.fp16.npz (architecture inferred from shapes). =="
