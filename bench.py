"""End-to-end throughput benchmark on the real TPU.

Measures sustained stereo pairs/sec of the fused detection pipeline
(SGM + ego-motion + PWC-Net flow + scene flow + clustering + tracking) at
KITTI resolution (1242x376 — BASELINE.md working resolution), against the
north-star target of 200 pairs/sec/chip (BASELINE.json).

Methodology: the frame steps run inside ONE jitted lax.fori_loop with the
pipeline state threaded through (so the device executes N dependent steps
back-to-back), and a scalar derived from the final step is fetched to the
host. The per-frame time is the SLOPE between two chain lengths, which
cancels the fixed dispatch round trip. This is the only reliable protocol
on the tunneled TPU backend: per-call dispatch costs ~25-100 ms of
round-trip, and block_until_ready can report completion before device work
finishes (measured: it does not block at all there), so completion is
forced with the host fetch.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet,
        init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import PipelineState, detect_step
    from moving_object_detector_tpu.types import StereoModel

    h, w = 376, 1242
    config = PipelineConfig(height=h, width=w)
    stereo = StereoModel.create(
        fx=721.5, fy=721.5, cx=w / 2.0, cy=h / 2.0, baseline=0.54
    )
    model = PWCNet(config=config.flownet)
    params = init_pwc_params(model, h, w)
    state0 = PipelineState.create(config)

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))

    @jax.jit
    def run_frames(state, left, n):
        def body(i, carry):
            state, left = carry
            state, out = detect_step(
                params,
                state,
                left,
                right,
                state.prev_time + 0.1,
                stereo,
                config,
                flow_model=model,
            )
            # Data-dependent no-op keeps iterations serialized and
            # un-elidable.
            bump = (out.disparity.disparity[0, 0] * 0.0).astype(left.dtype)
            return state, left + bump
        state, left = jax.lax.fori_loop(0, n, body, (state, left))
        return left[0, 0]

    def run(n):
        t0 = time.time()
        float(run_frames(state0, left, n))
        return time.time() - t0

    n1, n2 = 20, 120
    t0 = time.time()
    run(n1)
    print(f"# compile+first {n1} frames: {time.time() - t0:.1f}s",
          file=sys.stderr)
    per_frame = (run(n2) - run(n1)) / (n2 - n1)
    pairs_per_sec = 1.0 / per_frame

    baseline = 200.0  # north-star target, BASELINE.json
    print(
        json.dumps(
            {
                "metric": "kitti_stereo_pairs_per_sec_per_chip_end_to_end",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
