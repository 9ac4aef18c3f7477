#!/bin/bash
# Stage O — occlusion-cue finetune (VERDICT r4 #4): upgrade pwc_v6m3 to
# the occlusion-cue architecture (exact zero-init, augment_flow_occlusion
# .py) and finetune on the local-motion/motion-contrast mixture so the
# estimator learns to use the cue at occluding edges.
#
# Why this and not more loss weighting: three loss/curriculum stages
# plateaued at 1.9-2.4 px on the paste probe's shift-10/16 cases with the
# residual concentrated on the OCCLUDING half (tests/test_real_imagery.py
# _LOCAL_MOTION_TRAINED note) — the matching evidence there is
# fundamentally ambiguous, so the net needs an occlusion SIGNAL (the
# mean |f1 - warp(f2)| residual channel), not a bigger gradient.
#
# Usage: scripts/train_flow_occ.sh [src_ckpt] [steps]
set -eu
cd "$(dirname "$0")/.."
SRC=${1:-weights/pwc_v6m3.fp16.npz}
STEPS=${2:-6000}

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== augment $SRC -> /tmp/pwc_occ_init.npz (zero-init cue rows) =="
python scripts/augment_flow_occlusion.py "$SRC" /tmp/pwc_occ_init.npz

echo "== stage O: occlusion-cue finetune (192x448, M3-style mixture) =="
train --steps "$STEPS" --batch 8 --height 192 --width 448 --lr 5e-5 --warmup 200 \
    --max-shift 112 --bg-max-shift 48 --downsample-frac 0.5 --real-frac 0.3 \
    --local-motion-frac 0.5 --motion-contrast 6.0 \
    --resume /tmp/pwc_occ_init.npz --checkpoint checkpoints/pwc_occ \
    --save-every 1000 --seed 131

echo "== export candidate =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_occ",
                                   PipelineConfig().flownet)
assert cfg.occlusion_cue
save_flow_params_npz("/tmp/pwc_occ_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_occ_candidate.fp16.npz")
PYEOF

echo "== gates =="
ok=1
gate() {  # gate <name> <timeout> <cmd...>
    local name=$1 to=$2; shift 2
    timeout "$to" "$@" || { echo "$name FAIL rc=$?"; ok=0; }
}
gate PASTE 1200 python scripts/eval_paste_probe.py /tmp/pwc_occ_candidate.fp16.npz
gate EVAL1 2400 python scripts/eval_flow_ckpt.py /tmp/pwc_occ_candidate.fp16.npz
gate EVAL2 3600 python scripts/eval_flow_ckpt.py /tmp/pwc_occ_candidate.fp16.npz 384 896
gate DET1 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_occ_candidate.fp16.npz 192 448 10
gate DET2 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_occ_candidate.fp16.npz 384 896 8 2 2
gate MATRIX 2400 python scripts/validate_scene_matrix.py \
    /tmp/pwc_occ_candidate.fp16.npz --vel-gate 0.6 --disparity-rate 3.0
if [ "$ok" = 1 ]; then
    echo "== O DONE: ALL GATES PASS — cp /tmp/pwc_occ_candidate.fp16.npz weights/pwc_v7.fp16.npz, allowlist (incl. _LOCAL_MOTION_TRAINED) with measured numbers, re-bench =="
else
    echo "== O GATES FAILED — do not promote (compare per-gate numbers vs pwc_v6m3 before deciding) =="
    exit 1
fi
