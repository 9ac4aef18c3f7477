#!/bin/bash
# Timing probe: LANE-FRIENDLY level-1 pyramid slim for the full-res 150
# line (the next concrete lever after stage P3's 140.4 pairs/s).
#
# MEASURED 2026-08-22 (TPU v5e): DEAD END, do not retry.
#   l1_8    (8,32,64,96,128,196)  -> 118.24 pairs/s
#   l12_8_16(8,16,64,96,128,196)  -> 112.09 pairs/s
# vs pwc_p3's 140.37. Even power-of-two slimming of the full-res levels
# REGRESSES: an 8/16-channel conv at H x W is MXU-underutilized (128
# lanes) and XLA picks worse layouts — the (16, 32, ...) pyramid is
# already at the efficient width floor, confirming the round-4 finding
# at lane-unfriendly widths. The remaining full-res levers are the SGM
# DP recurrence and the scene-flow construct.
#
# Context (BENCH_MATRIX round-4 probe table): pruning the pyramid to
# 16,24,48,72,96,128 made full-res SLOWER (9.70 ms) — the lane-unfriendly
# widths (24/48/72) regress conv layouts more than the removed work
# saves. But the FULL-RES cost concentrates in pyramid level 1 (H x W
# convs); halving only that level to 8 channels keeps every width a
# power of two and touches nothing the correlation layer consumes
# beyond level-1 features (exact mean-divisor compensation in
# prune_flow.py --pyramid). Architecture is chosen by TIMING PROBE
# BEFORE any training (the P2/P3 lesson): run this with v6m3-init
# weights (quality-irrelevant), read the ms, and only then decide
# whether a recovery finetune is worth chip time.
#
# Usage: scripts/probe_pyramid_slim.sh   (needs the chip idle)
set -eu
cd "$(dirname "$0")/.."

echo "== tunnel probe =="
timeout 300 python -c "import jax; print(jax.devices())" || {
    echo "TPU tunnel down; aborting." >&2; exit 1; }

probe() {  # probe <name> <pyramid-widths>
    local name=$1 widths=$2
    echo "== probe $name: pyramid $widths (est/ctx at p3's 64-widths)"
    python scripts/prune_flow.py weights/pwc_v6m3.fp16.npz "/tmp/probe_$name.npz" \
        --pyramid "$widths" \
        --estimator 64,64,48,32,16 --context 64,64,64,48,32,16
    timeout 3000 python bench.py --flow-checkpoint "/tmp/probe_$name.npz" \
        --flow-input-scale 1 --sgm-input-scale 1 --repeat 2 2>&1 \
        | grep -E '^\{|repeat'
}

# Level-1-only slim (the full-res H x W level; all widths stay 2^k).
probe l1_8 "8,32,64,96,128,196"
# Levels 1-2 slim.
probe l12_8_16 "8,16,64,96,128,196"
echo "== probes done: compare against the gate-green 140.37 (pwc_p3)."
echo "== A clear win (>= ~146) justifies a recovery finetune + gate battery next."
