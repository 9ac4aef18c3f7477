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

Default: random static frames (quiet scene). ``--busy`` cycles a ring of
synthetic moving-object frames (io/readers.py SyntheticStereoSequence) so
detection/tracking costs show; pair with ``--flow-checkpoint`` for trained
flow weights that actually trigger the dynamic gate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--busy", action="store_true",
                    help="cycle synthetic moving-object frames")
    ap.add_argument("--busy-wide", action="store_true",
                    help="with --busy: add a second moving object near the "
                         "opposite frame corner, so the combined dynamic "
                         "extent defeats the cc-crop window and the "
                         "clusterer takes the full-frame fallback path")
    ap.add_argument("--flow-checkpoint", default="auto",
                    help="orbax dir or .npz with trained PWC-Net params; "
                         "'auto' uses the newest gate-passing bundled weights "
                         "if present, 'none' forces random init")
    ap.add_argument("--streams", type=int, default=1,
                    help="step N camera streams (sequential lax.map "
                         "scan single-chip; spatial composition "
                         "multi-chip) and report aggregate pairs/s")
    ap.add_argument("--spatial", type=int, default=1,
                    help="row-stripe the heavy perception of each stream "
                         "over K chips (needs streams*K devices; "
                         "parallel/spatial.py detect_step_streams_spatial)")
    ap.add_argument("--flow-input-scale", type=int, default=0,
                    help="run the flow net at 1/N resolution (serving "
                         "latency knob, pipeline._flow_forward). Default 0 "
                         "= auto: 2 iff the resolved weights passed the "
                         "scale-2 quality gates (stage E finetune — EPE "
                         "floor + end-to-end detection PASS at both "
                         "scales), else 1")
    ap.add_argument("--sgm-input-scale", type=int, default=0,
                    help="run SGM stereo at 1/N resolution (edge-aware "
                         "bilinear-upsampled disparities x N; ~N^2 "
                         "cheaper DP). Default 0 = auto: 2 iff the flow "
                         "weights are scale-2 gated, because that is the "
                         "combination validate_detection_quality passed "
                         "at 384x896 with the promoted pwc_v5 weights "
                         "(flow_scale=2 sgm_scale=2: 6/7 frames, 0 "
                         "phantoms, vel err 0.303, 2026-08-19), else 1")
    ap.add_argument("--repeat", type=int, default=1,
                    help="repeat the timed slope measurement N times in "
                         "one process (no recompiles) and report "
                         "min/median/max per-frame times on stderr; the "
                         "JSON value is the MEDIAN throughput. Bounds "
                         "run-to-run variance (tunnel dispatch jitter, "
                         "thermal) separately from compile-to-compile "
                         "variance.")
    ap.add_argument("--probe-all", action="store_true",
                    help="also consume every DEBUG output per frame "
                         "(label image, static flow, depth...), i.e. the "
                         "'all debug topics subscribed' configuration. "
                         "The default consumes the end products only "
                         "(scene-flow cloud, detections, tracks, odometry "
                         "+ the carried state), which matches the "
                         "reference's publish-when-subscribed semantics "
                         "(clusterer_nodelet.cpp:233-238) and still makes "
                         "every real stage a data dependency: detections "
                         "require clustering require scene flow require "
                         "disparity+flow+ego-motion.")
    ap.add_argument("--cc-crop-windows", type=int, default=None,
                    help="override ClustererConfig.cc_crop_windows "
                         "(1 = single-window crop, 2 = column-gap "
                         "two-window split; default from config)")
    ap.add_argument("--cc-crop", type=int, nargs=2, default=None,
                    metavar=("H", "W"),
                    help="override the clusterer dynamic-extent crop "
                         "window (ClustererConfig.cc_crop_h/w; 0 0 "
                         "disables). Default: the config default.")
    args = ap.parse_args(argv)
    if args.sgm_input_scale < 0:
        ap.error(f"--sgm-input-scale must be 0 (auto) or >= 1, "
                 f"got {args.sgm_input_scale}")
    if args.flow_input_scale < 0:
        ap.error(f"--flow-input-scale must be 0 (auto) or >= 1, "
                 f"got {args.flow_input_scale}")
    if args.streams < 1 or args.spatial < 1:
        ap.error("--streams and --spatial must be >= 1")

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
    from moving_object_detector_tpu.utils.checkpoint import (
        flow_checkpoint_scale2_gated,
        load_flow_checkpoint,
        resolve_flow_checkpoint,
    )

    ckpt = resolve_flow_checkpoint(args.flow_checkpoint)
    if args.flow_input_scale == 0:
        # Auto: the half-res flow path is the default serving config only
        # with weights that passed the scale-2 quality gates.
        args.flow_input_scale = 2 if flow_checkpoint_scale2_gated(ckpt) else 1
    if args.sgm_input_scale == 0:
        # Auto: half-res SGM serves by default only in the combination the
        # end-to-end gate validated (scale-2-gated flow weights + sgm
        # scale 2 at 384x896 -- see --sgm-input-scale help).
        args.sgm_input_scale = 2 if flow_checkpoint_scale2_gated(ckpt) else 1
    config = PipelineConfig(height=h, width=w,
                            flow_input_scale=args.flow_input_scale,
                            sgm_input_scale=args.sgm_input_scale)
    if args.cc_crop is not None or args.cc_crop_windows is not None:
        import dataclasses

        repl = {}
        if args.cc_crop is not None:
            repl["cc_crop_h"] = args.cc_crop[0]
            repl["cc_crop_w"] = args.cc_crop[1]
        if args.cc_crop_windows is not None:
            repl["cc_crop_windows"] = args.cc_crop_windows
        config = dataclasses.replace(
            config,
            clusterer=dataclasses.replace(config.clusterer, **repl),
        )
    stereo = StereoModel.create(
        fx=721.5, fy=721.5, cx=w / 2.0, cy=h / 2.0, baseline=0.54
    )
    if ckpt:
        # Architecture comes from the checkpoint's kernel shapes (slim/wide
        # decoder variants bench without extra flags).
        import dataclasses

        params, flow_cfg = load_flow_checkpoint(ckpt, config.flownet)
        config = dataclasses.replace(config, flownet=flow_cfg)
        model = PWCNet(config=flow_cfg)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        model = PWCNet(config=config.flownet)
        params = init_pwc_params(model, h, w)
    state0 = PipelineState.create(config)

    if args.busy:
        from moving_object_detector_tpu.io.readers import (
            SyntheticStereoSequence,
        )

        seq = SyntheticStereoSequence(height=h, width=w, n_frames=4)
        seq2 = None
        if args.busy_wide:
            # Second object near the opposite corner, same background
            # texture so plain rectangle compositing is exact.
            seq2 = SyntheticStereoSequence(
                height=h, width=w, n_frames=4, seed=1, bg_texture=seq.bg,
            )
            seq2.obj_y = h - seq2.obj_h - max(8, h // 32)
            seq2.obj_x0 = w - seq2.obj_w - max(32, w // 16) - 4 * 6
        lefts, rights = [], []
        for k in range(4):
            fl, fr, _, _ = seq.frame(k)
            if seq2 is not None:
                fl2, fr2, _, tr2 = seq2.frame(k)
                y, x, oh, ow = tr2["obj_box"]
                fl[y : y + oh, x : x + ow] = fl2[y : y + oh, x : x + ow]
                rx = max(0, x - int(round(seq2.d_obj)))
                fr[y : y + oh, rx : rx + ow] = fr2[y : y + oh, rx : rx + ow]
            lefts.append(fl)
            rights.append(fr)
        left_ring = jnp.asarray(np.stack(lefts).astype(np.float32))
        right_ring = jnp.asarray(np.stack(rights).astype(np.float32))
    else:
        # A ring of DISTINCT quiet frames. Two traps bracket this choice:
        # (a) a single repeated frame makes the whole per-frame perception
        # subgraph loop-invariant inside the fori_loop chain, and XLA can
        # hoist it out of the loop — timing a frame rate no real stream
        # can reach; (b) INDEPENDENT random frames are not "quiet" at all:
        # consecutive noise images are unmatchable, the trained flow net
        # emits garbage, every pixel goes dynamic and the CC fixpoint
        # saturates (measured 5 pairs/s). The honest quiet stream is a
        # camera pan over a STATIC world: sliding crops of one static
        # synthetic scene — every frame distinct (no hoisting), flow a
        # uniform ~2 px/frame, scene-flow velocities ~0 (quiet clusterer).
        from moving_object_detector_tpu.io.readers import (
            SyntheticStereoSequence,
        )

        pan = 2  # px/frame lateral camera pan
        n_q = 4
        seq = SyntheticStereoSequence(
            height=h, width=w + pan * n_q, obj_speed_px=0.0, n_frames=1
        )
        fl, fr, _, _ = seq.frame(0)
        # ZIGZAG pan (0,1,2,3,2,1 crops -> steps always +-2 px): a plain
        # forward pan ring jumped BACKWARD by n_q*pan px at the wrap
        # frame — a synthetic artifact no real camera produces that fired
        # thousands of false dynamic pixels on 1 of every n_q "quiet"
        # frames (measured 2026-08-21: 17k px with pwc_v5, 5.6k with
        # pwc_v6m3, one spurious detection each wrap). Every ring frame
        # stays distinct (no loop-invariant hoisting).
        order = list(range(n_q)) + list(range(n_q - 2, 0, -1))
        lefts = [fl[:, k * pan : k * pan + w] for k in order]
        rights = [fr[:, k * pan : k * pan + w] for k in order]
        left_ring = jnp.asarray(np.stack(lefts).astype(np.float32))
        right_ring = jnp.asarray(np.stack(rights).astype(np.float32))
    n_ring = left_ring.shape[0]

    n_streams = args.streams
    n_spatial = args.spatial
    mesh = None
    if n_spatial > 1:
        from moving_object_detector_tpu.parallel.mesh import create_mesh
        from moving_object_detector_tpu.parallel.spatial import (
            detect_step_streams_spatial,
        )

        n_dev = len(jax.devices())
        need = n_streams * n_spatial
        if n_dev < need:
            sys.exit(
                f"--streams {n_streams} --spatial {n_spatial} needs "
                f"{need} devices, found {n_dev}"
            )
        assert h % n_spatial == 0, (h, n_spatial)
        mesh = create_mesh(need, model_parallel=n_spatial)
    if n_streams > 1 or n_spatial > 1:
        from moving_object_detector_tpu.parallel.streams import (
            create_stream_states,
            detect_step_streams_scan,
        )

        state0 = create_stream_states(config, n_streams)

    @jax.jit
    def run_frames(state, left_ring, right_ring, n):
        def probe(x):
            # nan-proof scalar witness: a FULL reduction so every element of
            # the producing subgraph is demanded (a [:8] slice lets XLA
            # narrow elementwise chains to 8 elements and skip the work; a
            # ravel of the full array costs a ~0.5 ms layout copy — measured
            # in the op trace, scripts/profile_trace.py). A sum fuses into
            # the producer and reads each array once (~us).
            v = jnp.asarray(x).astype(jnp.float32)
            return jnp.sum(jnp.where(jnp.isfinite(v), v, 0.123)) * 1e-6

        def body(i, carry):
            state, acc = carry
            k = jax.lax.rem(i, n_ring)
            left = jax.lax.dynamic_index_in_dim(
                left_ring, k, keepdims=False
            )
            right = jax.lax.dynamic_index_in_dim(
                right_ring, k, keepdims=False
            )
            if n_streams > 1 or n_spatial > 1:
                lefts = jnp.broadcast_to(
                    left, (n_streams,) + left.shape
                )
                rights = jnp.broadcast_to(
                    right, (n_streams,) + right.shape
                )
                if n_spatial > 1:
                    state, out = detect_step_streams_spatial(
                        params,
                        state,
                        lefts,
                        rights,
                        state.prev_time + 0.1,
                        stereo,
                        config,
                        model,
                        mesh,
                    )
                else:
                    # Sequential per-stream scan: the supported
                    # single-chip multi-stream form (the vmapped
                    # detect_step_batched is guarded off on accelerators
                    # — BENCH_MATRIX r4 worker crash).
                    state, out = detect_step_streams_scan(
                        params,
                        state,
                        lefts,
                        rights,
                        state.prev_time + 0.1,
                        stereo,
                        config,
                        flow_model=model,
                    )
            else:
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
            # The END PRODUCTS feed the carried accumulator so no real
            # stage is dead code: the scene-flow cloud is the published
            # product AND the clusterer's input; detections/tracks/odom
            # transitively require clustering, scene flow, disparity, flow
            # and ego-motion. (An earlier bench bumped the input by
            # output*0.0 and discarded the final state — XLA folded the
            # multiply and eliminated everything but SGM, inflating the
            # number ~3x. NEVER time a chain whose outputs aren't data
            # dependencies of the fetched scalar.)
            acc = (
                acc
                + probe(out.scene_flow.velocity)
                + probe(out.detections.center)
                + probe(out.tracked.objects.center)
                + probe(out.odom_pose)
            )
            if args.probe_all:
                # Debug outputs the reference only computes when a
                # subscriber is attached (rqt dashboards).
                acc = (
                    acc
                    + probe(out.disparity.disparity)
                    + probe(out.flow)
                    + probe(out.static_flow)
                    + probe(out.label_image)
                    + probe(out.tracked.covariance)
                    + probe(out.motion)
                )
            return state, acc
        state, acc = jax.lax.fori_loop(
            0, n, body, (state, jnp.float32(0.0))
        )
        # The final state is consumed too: the state chain stays live.
        return acc + probe(state.pose) + probe(state.tracker.mean)

    def run(n):
        t0 = time.time()
        float(run_frames(state0, left_ring, right_ring, n))
        return time.time() - t0

    n1, n2 = 20, 120
    t0 = time.time()
    run(n1)
    print(f"# compile+first {n1} frames: {time.time() - t0:.1f}s",
          file=sys.stderr)
    samples = []
    for r in range(max(1, args.repeat)):
        pf = (run(n2) - run(n1)) / (n2 - n1)
        samples.append(pf)
        if args.repeat > 1:
            print(f"# repeat {r}: {1.0 / pf:.2f} pairs/s "
                  f"({pf * 1e3:.3f} ms/frame)", file=sys.stderr)
    per_frame = float(np.median(samples))
    if args.repeat > 1:
        print(f"# per-frame ms over {len(samples)} repeats: "
              f"min={min(samples) * 1e3:.3f} "
              f"median={per_frame * 1e3:.3f} "
              f"max={max(samples) * 1e3:.3f}", file=sys.stderr)
    # Per-CHIP throughput: N streams over N*K devices aggregate
    # n_streams/per_frame pairs/s on n_streams*n_spatial chips.
    pairs_per_sec = n_streams / per_frame / n_spatial

    baseline = 200.0  # north-star target, BASELINE.json
    metric = "kitti_stereo_pairs_per_sec_per_chip_end_to_end"
    if args.busy:
        metric += "_busywide" if args.busy_wide else "_busy"
    if n_streams > 1:
        metric += f"_x{n_streams}streams"
    if n_spatial > 1:
        metric += f"_x{n_spatial}spatial"
    if args.flow_input_scale > 1:
        metric += f"_flowscale{args.flow_input_scale}"
    if args.sgm_input_scale > 1:
        metric += f"_sgmscale{args.sgm_input_scale}"
    if args.probe_all:
        metric += "_alldebug"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
