#!/bin/bash
# Stage P3 — 64-width (50%) estimator/context structured prune of
# pwc_v6m3 + recovery finetune: the measured fallback after stage P2
# (48-widths, 150.47 pairs/s ceiling) FAILED its scene-matrix gates
# (2026-08-21 /tmp/p2_finetune.log: matrix vel 0.98/0.69/1.16 vs the
# 0.6 gate and vs v6m3's ~0.27-0.41 — a capacity loss, train EPE still
# 2.2 and near-plateau at step 6000, not an under-trained finetune).
#
# TPU probes with v6m3-init weights (2026-08-21, full-res bench,
# batched pyramid):
#   est/ctx 50% (64-widths)    -> 6.94 ms (144.07 pairs/s)  <- this
#   est/ctx 37.5% (48-widths)  -> 6.65 ms (150.47 pairs/s)  gates FAIL
# Remaining distance to 150 comes from scene-flow/SGM kernel work, not
# more flow pruning.
#
# Usage: scripts/prune_finetune3.sh [src_ckpt] [steps]
set -eu
cd "$(dirname "$0")/.."
SRC=${1:-weights/pwc_v6m3.fp16.npz}
STEPS=${2:-6000}
EST=64,64,48,32,16
CTX=64,64,64,48,32,16

train() { timeout 14400 python -m moving_object_detector_tpu.train.train_flow "$@"; }

echo "== tunnel probe =="
timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

echo "== prune $SRC -> /tmp/pwc_p3_init.npz (est $EST ctx $CTX) =="
python scripts/prune_flow.py "$SRC" /tmp/pwc_p3_init.npz \
    --estimator "$EST" --context "$CTX"

echo "== stage P3: recovery finetune (192x448, serving mixture) =="
train --steps "$STEPS" --batch 8 --height 192 --width 448 --lr 1e-4 --warmup 200 \
    --max-shift 96 --bg-max-shift 40 --downsample-frac 0.4 --real-frac 0.3 \
    --local-motion-frac 0.4 --motion-contrast 4.0 \
    --resume /tmp/pwc_p3_init.npz --checkpoint checkpoints/pwc_p3 \
    --save-every 1000 --seed 97

echo "== export candidate =="
python - <<'PYEOF'
import jax
from moving_object_detector_tpu.config import PipelineConfig
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint, save_flow_params_npz)
params, cfg = load_flow_checkpoint("checkpoints/pwc_p3",
                                   PipelineConfig().flownet)
save_flow_params_npz("/tmp/pwc_p3_candidate.fp16.npz",
                     jax.device_get(params))
print("wrote /tmp/pwc_p3_candidate.fp16.npz")
PYEOF

echo "== gates =="
ok=1
gate() {  # gate <name> <timeout> <cmd...>
    local name=$1 to=$2; shift 2
    timeout "$to" "$@" || { echo "$name FAIL rc=$?"; ok=0; }
}
gate EVAL1 2400 python scripts/eval_flow_ckpt.py /tmp/pwc_p3_candidate.fp16.npz
gate EVAL2 3600 python scripts/eval_flow_ckpt.py /tmp/pwc_p3_candidate.fp16.npz 384 896
gate DET1 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p3_candidate.fp16.npz 192 448 10
gate DET2 1800 python scripts/validate_detection_quality.py \
    /tmp/pwc_p3_candidate.fp16.npz 384 896 8 2 2
gate MATRIX 2400 python scripts/validate_scene_matrix.py \
    /tmp/pwc_p3_candidate.fp16.npz --vel-gate 0.6
if [ "$ok" = 1 ]; then
    echo "== P3 DONE: ALL GATES PASS — cp /tmp/pwc_p3_candidate.fp16.npz weights/pwc_p3.fp16.npz, allowlist with measured numbers, bench full-res =="
else
    echo "== P3 GATES FAILED — do not promote =="
    exit 1
fi
