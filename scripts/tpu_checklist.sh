#!/bin/bash
# One-shot TPU measurement queue (run when the axon tunnel is back):
# captures every number PLAN_NEXT.md lists as pending into /tmp/tpu_logs.
# Usage: bash scripts/tpu_checklist.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_logs

echo "== tunnel probe =="
if ! timeout 120 python -c "import jax; print(jax.devices())"; then
    echo "TPU tunnel still down; aborting." >&2
    exit 1
fi

run() {
    name=$1; shift
    echo "== $name =="
    timeout 1200 "$@" 2>&1 | tee "/tmp/tpu_logs/$name.log" | tail -12
}

# Kernel oracle: reworked CC kernel, pallas vs xla, odd resolution.
run cc_oracle python scripts/validate_cc.py
# Headline bench, quiet + busy (+ trained weights).
run bench_quiet python bench.py
run bench_busy python bench.py --busy
# Serving knob.
run bench_flowscale2 python bench.py --flow-input-scale 2
# Clusterer substage attribution + fixpoint iteration count.
run profile_scene_fused python scripts/profile_scene_gather.py
run profile_clusterer python scripts/profile_clusterer.py
# Full per-stage profile.
run profile_pipeline python scripts/profile_pipeline.py
echo "All logs in /tmp/tpu_logs/"
