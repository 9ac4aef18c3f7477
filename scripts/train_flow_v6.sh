#!/bin/bash
# pwc_v6: LOCAL-MOTION finetune of pwc_v5 (round-3 measured blind spot).
#
# Measured failure (2026-08-20, paste + PlanarSceneSequence probes): pwc_v5
# under-tracks INDEPENDENTLY MOVING objects on real-photo textures by ~2 px
# at every shift (e.g. net 8.1 on a 10 px pasted rectangle; 3.9 on 6;
# 14.0 on 16), and by ~4.4 px on rendered scenes with a moving camera —
# even though global known-shift recovery is sub-pixel. End-to-end this
# halves measured object velocity (detection vel err ~1.1 m/s on the
# real-sequence eval vs 0.3 on procedural-texture gates).
#
# Fix: --local-motion-frac 0.5 draws half the samples from the regime the
# detector actually serves — near-static background + guaranteed-moving
# objects, half of them hard-edged rectangles under pure translation
# (train/data_synth.py generate_pair docstring).
#
# Gates before promotion (ALL must pass; run scripts/eval_flow_ckpt.py and
# the planar-sequence eval):
#   - everything the v5 gates required (static spurious, known-shift,
#     scale-2 EPE, detection quality at scale 1 + 2);
#   - NEW: paste-rectangle recovery |net - gt| < 1 px mean at shifts
#     6/10/16 (tests/test_real_imagery.py::test_flow_local_object_motion);
#   - NEW: real-sequence eval (tests/test_real_sequence.py) vel_err_median
#     < 0.6 m/s at both serving points.
#
# Usage: scripts/train_flow_v6.sh [resume_ckpt]
set -eu
cd "$(dirname "$0")/.."
RESUME=${1:-weights/pwc_v5.fp16.npz}

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }
score() { echo "== eval $* =="; timeout 2400 python scripts/eval_flow_ckpt.py "$@"; }

echo "== tunnel probe =="
timeout 120 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== stage L1: local-motion finetune (192x448, shift 56) =="
train --steps 5000 --batch 8 --height 192 --width 448 --lr 6e-5 --warmup 200 \
    --max-shift 56 --bg-max-shift 28 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.5 \
    --resume "$RESUME" --checkpoint checkpoints/pwc_v6.sL1 \
    --save-every 1000 --seed 61
score checkpoints/pwc_v6.sL1

echo "== stage L2: large-motion retention (192x448, shift 112) =="
train --steps 4000 --batch 8 --height 192 --width 448 --lr 5e-5 --warmup 100 \
    --max-shift 112 --bg-max-shift 48 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.4 \
    --resume checkpoints/pwc_v6.sL1 --checkpoint checkpoints/pwc_v6 \
    --save-every 1000 --seed 62
score checkpoints/pwc_v6
score checkpoints/pwc_v6 384 896

echo "== export CANDIDATE fp16 npz (promote only after gates) =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_v6",
                                   PipelineConfig().flownet)
save_flow_params_npz("/tmp/pwc_v6_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_v6_candidate.fp16.npz")
PYEOF

echo "== end-to-end detection gates (scale 1 AND scale 2) =="
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_v6_candidate.fp16.npz 192 448 10
timeout 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_v6_candidate.fp16.npz 384 896 8 2
echo "== V6 CANDIDATE READY: run the paste-probe + real-sequence gates, "
echo "   then cp /tmp/pwc_v6_candidate.fp16.npz weights/pwc_v6.fp16.npz"
echo "   + update default preference / allowlists =="
