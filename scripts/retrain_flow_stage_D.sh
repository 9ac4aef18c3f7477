#!/bin/bash
# Stage D: texture-family adaptation (cell-quantized/blocky textures,
# data_synth._cell_texture) on top of the pwc_v3 staged retrain.
#
# Why: pwc_v3 passes the EPE floor at both input scales but FAILS the
# end-to-end detection gate — the net is blind to motion on sharp
# cell-quantized textures it never saw (6 px block motion read as ~1 px;
# /tmp retrain2 log + PLAN_NEXT). Stage D resumes from pwc_v3 on the
# widened texture distribution (65% octave noise / 35% cell-quantized,
# randomized mask sharpness) with the same magnitude mixture, then a short
# high-res polish to preserve the large-shift tail.
#
# Gate: scripts/eval_flow_ckpt.py (EPE floors + static spurious) AND
# scripts/validate_detection_quality.py (must PASS).
set -eu
cd "$(dirname "$0")/.."
S1=${S1:-6000}; S2=${S2:-2000}

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }
score() { echo "== eval $1 =="; timeout 1800 python scripts/eval_flow_ckpt.py "$@"; }

echo "== stage D: mixed textures (192x448, shift 56) =="
train --steps $S1 --batch 8 --height 192 --width 448 --lr 1.2e-4 --warmup 200 \
    --max-shift 56 --bg-max-shift 20 --resume "${RESUME_FROM:-checkpoints/pwc_v3}" \
    --checkpoint checkpoints/pwc_v4.sD --save-every 2000 --seed 14
score checkpoints/pwc_v4.sD

echo "== stage E: high-res polish (256x576, shift 72) =="
train --steps $S2 --batch 6 --height 256 --width 576 --lr 6e-5 --warmup 100 \
    --max-shift 72 --bg-max-shift 24 --resume checkpoints/pwc_v4.sD \
    --checkpoint checkpoints/pwc_v4 --save-every 1000 --seed 15
score checkpoints/pwc_v4
score checkpoints/pwc_v4 256 576

echo "== export fp16 npz =="
python - <<'EOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params_abstract
from moving_object_detector_tpu.utils.checkpoint import (
    restore_flow_params, save_flow_params_npz)
model = PWCNet(config=PipelineConfig().flownet)
params = restore_flow_params(
    "checkpoints/pwc_v4", like=init_pwc_params_abstract(model))
save_flow_params_npz("weights/pwc_v4.fp16.npz", jax.device_get(params))
print("wrote weights/pwc_v4.fp16.npz")
EOF

echo "== end-to-end detection gate (stage D ckpt) =="
timeout 1800 python scripts/validate_detection_quality.py \
    checkpoints/pwc_v4.sD 192 448 10 || true
echo "== end-to-end detection gate (final) =="
timeout 1800 python scripts/validate_detection_quality.py \
    weights/pwc_v4.fp16.npz 192 448 10
