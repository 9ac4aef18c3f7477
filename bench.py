"""End-to-end throughput benchmark on the real TPU.

Measures sustained stereo pairs/sec of the fused detection pipeline
(SGM + ego-motion + PWC-Net flow + scene flow + clustering + tracking) at
KITTI resolution (1242x376 — BASELINE.md working resolution), against the
north-star target of 200 pairs/sec/chip (BASELINE.json).

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
    state = PipelineState.create(config)

    rng = np.random.default_rng(0)
    # Two alternating synthetic frames (keeps the whole loop on-device
    # realistic: new inputs every step, state threaded).
    frames = [
        (
            jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
            jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32)),
        )
        for _ in range(2)
    ]

    def step(state, left, right, t):
        return detect_step(
            params, state, left, right, t, stereo, config, flow_model=model
        )

    # Warmup / compile.
    t0 = time.time()
    state, out = step(state, frames[0][0], frames[0][1], jnp.float32(0.0))
    jax.block_until_ready(out.disparity.disparity)
    compile_s = time.time() - t0
    print(f"# compile+first-step: {compile_s:.1f}s", file=sys.stderr)

    # One more warm step.
    state, out = step(state, frames[1][0], frames[1][1], jnp.float32(0.1))
    jax.block_until_ready(out.disparity.disparity)

    n = 20
    t0 = time.time()
    for i in range(n):
        left, right = frames[i % 2]
        state, out = step(state, left, right, jnp.float32(0.2 + 0.1 * i))
        # Block every step: under the remote-tunnel backend, blocking only
        # on the final output lets the measurement miss device work.
        jax.block_until_ready((state, out))
    dt = time.time() - t0
    pairs_per_sec = n / dt

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
