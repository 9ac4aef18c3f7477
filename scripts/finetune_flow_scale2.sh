#!/bin/bash
# Stage E: make the flow_input_scale=2 serving knob deployable.
#
# Measured gap (2026-08-18): pwc_v4 scores EPE 1.06 at scale 1 but 19.4 at
# scale 2 on the held-out batch — half-res texture statistics are out of
# distribution. bench.py at scale 2 runs 141.5 pairs/s vs 95.6 at scale 1,
# so closing this is the single biggest end-to-end lever.
#
# Recipe: finetune an existing checkpoint with --downsample-frac 0.4 (40%
# of each batch drawn from the exact serving distribution via
# generate_pair_scale2), same magnitude mixture, moderate LR. Gates:
#   - eval_flow_ckpt EPE < 4.5 at BOTH scales;
#   - validate_detection_quality PASS at scale 1 AND scale 2.
#
# Usage: scripts/finetune_flow_scale2.sh <resume_ckpt> <out_name>
#   e.g. scripts/finetune_flow_scale2.sh checkpoints/pwc_v4s pwc_v4s_e
set -eu
cd "$(dirname "$0")/.."
RESUME=${1:?resume checkpoint}
OUT=${2:?output name (under checkpoints/, weights/)}

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== stage E1: mixed-scale finetune (192x448, shift 56) =="
train --steps 6000 --batch 8 --height 192 --width 448 --lr 8e-5 --warmup 200 \
    --max-shift 56 --bg-max-shift 28 --downsample-frac 0.4 \
    --resume "$RESUME" --checkpoint "checkpoints/$OUT.sE1" \
    --save-every 2000 --seed 31
echo "== eval E1 =="
timeout 1800 python scripts/eval_flow_ckpt.py "checkpoints/$OUT.sE1"

echo "== stage E2: high-res polish (256x576, shift 72) =="
train --steps 3000 --batch 6 --height 256 --width 576 --lr 5e-5 --warmup 100 \
    --max-shift 72 --bg-max-shift 32 --downsample-frac 0.4 \
    --resume "checkpoints/$OUT.sE1" --checkpoint "checkpoints/$OUT" \
    --save-every 1000 --seed 32
echo "== eval final =="
timeout 1800 python scripts/eval_flow_ckpt.py "checkpoints/$OUT"

echo "== export fp16 npz =="
python - "$OUT" <<'PYEOF'
import sys
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
out = sys.argv[1]
params, cfg = load_flow_checkpoint(f"checkpoints/{out}",
                                   PipelineConfig().flownet)
save_flow_params_npz(f"weights/{out}.fp16.npz", jax.device_get(params))
print(f"wrote weights/{out}.fp16.npz", cfg.estimator_channels)
PYEOF

echo "== end-to-end detection gates (scale 1 AND scale 2) =="
timeout 1800 python scripts/validate_detection_quality.py \
    "weights/$OUT.fp16.npz" 192 448 10
timeout 1800 python scripts/validate_detection_quality.py \
    "weights/$OUT.fp16.npz" 192 448 10 2
echo "== STAGE E DONE: both gates passed. Bench with:"
echo "   python bench.py --flow-checkpoint weights/$OUT.fp16.npz --flow-input-scale 2 =="
