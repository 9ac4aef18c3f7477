"""Op-level device-time attribution for the FULL fused detect_step.

Runs N chained frames under jax.profiler.trace and aggregates the
device-side trace events by op name — direct evidence of where the
per-frame milliseconds go, instead of stub-ablation inference (whose
stubs change the data distribution and confound the numbers, see
profile_fusion.py).

Usage: python scripts/profile_trace.py [--busy] [--frames 30]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--busy", action="store_true")
    ap.add_argument("--trained", action="store_true",
                    help="load bundled trained flow weights")
    ap.add_argument("--streams", type=int, default=1)
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params, init_pwc_params_abstract,
    )
    from moving_object_detector_tpu.pipeline import PipelineState, detect_step
    from moving_object_detector_tpu.types import StereoModel

    h, w = 376, 1242
    config = PipelineConfig(height=h, width=w)
    stereo = StereoModel.create(fx=721.5, fy=721.5, cx=w / 2, cy=h / 2,
                                baseline=0.54)
    model = PWCNet(config=config.flownet)
    if args.trained:
        from moving_object_detector_tpu.utils.checkpoint import (
            resolve_flow_checkpoint, restore_flow_params,
        )
        ckpt = resolve_flow_checkpoint("auto")
        params = restore_flow_params(ckpt, like=init_pwc_params_abstract(model))
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        params = init_pwc_params(model, h, w)

    if args.busy:
        from moving_object_detector_tpu.io.readers import (
            SyntheticStereoSequence,
        )
        seq = SyntheticStereoSequence(height=h, width=w, n_frames=4)
        frames = [seq.frame(k)[:2] for k in range(4)]
        left_ring = jnp.asarray(np.stack([f[0] for f in frames]).astype(np.float32))
        right_ring = jnp.asarray(np.stack([f[1] for f in frames]).astype(np.float32))
    else:
        rng = np.random.default_rng(0)
        left_ring = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))
        right_ring = jnp.asarray(rng.uniform(0, 1, (1, h, w)).astype(np.float32))
    n_ring = left_ring.shape[0]

    n_streams = args.streams
    if n_streams > 1:
        from moving_object_detector_tpu.parallel.streams import (
            create_stream_states, detect_step_streams_scan,
        )
        state0 = create_stream_states(config, n_streams)
    else:
        state0 = PipelineState.create(config)

    @jax.jit
    def run_frames(state, n):
        def probe(x):
            # Full-reduction witness (see bench.py probe for why).
            v = jnp.asarray(x).astype(jnp.float32)
            return jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123)) * 1e-6

        def body(i, carry):
            state, acc = carry
            k = jax.lax.rem(i, n_ring)
            left = jax.lax.dynamic_index_in_dim(left_ring, k, keepdims=False)
            right = jax.lax.dynamic_index_in_dim(right_ring, k, keepdims=False)
            if n_streams > 1:
                lefts = jnp.broadcast_to(left, (n_streams,) + left.shape)
                rights = jnp.broadcast_to(right, (n_streams,) + right.shape)
                state, out = detect_step_streams_scan(
                    params, state, lefts, rights, state.prev_time + 0.1,
                    stereo, config, flow_model=model)
            else:
                state, out = detect_step(
                    params, state, left, right, state.prev_time + 0.1,
                    stereo, config, flow_model=model)
            acc = acc + sum(
                probe(x) for x in (
                    out.disparity.disparity, out.flow,
                    out.scene_flow.velocity, out.static_flow,
                    out.detections.center, out.label_image,
                    out.tracked.objects.center, out.tracked.covariance,
                    out.motion, out.odom_pose,
                )
            )
            return state, acc

        state, acc = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return acc + probe(state.pose) + probe(state.tracker.mean)

    # compile + warm
    float(run_frames(state0, 3))
    tdir = "/tmp/modt_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        float(run_frames(state0, args.frames))

    paths = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in n}
    tot = collections.Counter()
    cnt = collections.Counter()
    grand = 0.0
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in dev_pids:
            name = e["name"]
            dur = e.get("dur", 0) / 1e3  # us -> ms
            # skip the enclosing jit_run_frames envelope event if present
            if name.startswith("jit_"):
                continue
            tot[name] += dur
            cnt[name] += 1
            grand += dur
    n = args.frames
    print(f"# device op time total {grand:.1f} ms over {n} frames "
          f"= {grand / n:.3f} ms/frame")
    print(f"{'op':<58}{'ms/frame':>9}{'count':>7}")
    for name, ms in tot.most_common(args.top):
        print(f"{name[:58]:<58}{ms / n:>9.3f}{cnt[name]:>7}")


if __name__ == "__main__":
    main()
