#!/usr/bin/env python
"""Real-time live-input replay: the ZED-operating-point validation.

VERDICT r4 #6: the reference's primary mode is a live camera
(detect_with_zed.launch:1-55, zed_common.yaml:24-25 HD720@15fps with a
capacity-1 latest-wins subscriber queue). This script replays a rendered
stereo sequence through the SOCKET reader at real time — a sensor-server
thread streams frames at --fps with wall-clock timestamps; the pipeline
consumes them through the (native, when built) frame ring in drop-oldest
mode — and reports the measured end-to-end latency budget:

  capture wall-clock (sensor)  ->  harvest wall-clock (runner)

Latency stats are computed over the steady-state tail (after jit compile
has drained), alongside sent/processed/dropped counts and sustained
throughput. Output: one JSON line, plus a human-readable summary.

Usage (TPU serving point):
  python scripts/replay_live.py --fps 15 --duration 240
CPU smoke (tiny preset):
  python scripts/replay_live.py --preset tiny --height 64 --width 160 \
      --fps 10 --duration 30
"""

from __future__ import annotations

import argparse
import json
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_frames(h, w, fx, baseline, fps, n_render):
    """Pre-render a zigzag ring of scene frames (continuous ±motion, no
    wrap jump — the bench.py quiet-ring lesson) so the sensor thread can
    stream at full rate without paying the raycast per frame."""
    from moving_object_detector_tpu.io.scenes import (
        PlaneObject,
        PlanarSceneSequence,
        _procedural_texture,
    )

    rng = np.random.default_rng(11)
    seq = PlanarSceneSequence(
        h, w, fx=fx, baseline=baseline, bg_depth=12.0,
        objects=[
            PlaneObject(
                center0=(-1.2, -0.75, 6.0), size=(2.0, 1.28),
                velocity=(1.2, 0.0, 0.0),
                texture=_procedural_texture(rng, 256, 256),
            ),
        ],
        cam_velocity=(0.4, 0.0, 0.2), yaw_rate=np.deg2rad(1.0),
        fps=fps, n_frames=n_render,
    )
    frames = []
    for k in range(n_render):
        left, right, _, _ = seq.frame(k)
        frames.append((np.asarray(left, np.float32),
                       np.asarray(right, np.float32)))
    order = list(range(n_render)) + list(range(n_render - 2, 0, -1))
    return frames, order


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=376)
    ap.add_argument("--width", type=int, default=1242)
    ap.add_argument("--fx", type=float, default=721.5)
    ap.add_argument("--baseline", type=float, default=0.54)
    ap.add_argument("--fps", type=float, default=15.0,
                    help="sensor rate (zed_common.yaml:24-25 -> 15)")
    ap.add_argument("--duration", type=float, default=240.0,
                    help="stream wall-clock seconds (must outlive the "
                         "jit compile; serving-point compile is ~3 min)")
    ap.add_argument("--n-render", type=int, default=12,
                    help="distinct frames in the pre-rendered zigzag ring")
    ap.add_argument("--preset", choices=["default", "tiny"],
                    default="default")
    ap.add_argument("--flow-input-scale", type=int, default=0,
                    help="0 = auto (bench.py semantics)")
    ap.add_argument("--sgm-input-scale", type=int, default=0)
    ap.add_argument("--tail-frac", type=float, default=0.5,
                    help="fraction of processed frames (latest) used for "
                         "steady-state latency stats")
    ap.add_argument("--budget-ms", type=float, default=None,
                    help="fail (rc 1) if steady-state p95 latency "
                         "exceeds this")
    args = ap.parse_args(argv)

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.io import readers
    from moving_object_detector_tpu.io.runner import PipelineRunner
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.types import StereoModel
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        flow_checkpoint_scale2_gated,
        load_flow_checkpoint,
    )

    h, w = args.height, args.width
    if args.preset == "tiny":
        from moving_object_detector_tpu.config import (
            EgoMotionConfig, FlowNetConfig, SGMConfig,
        )

        config = PipelineConfig(
            height=h, width=w,
            flownet=FlowNetConfig(
                feature_channels=(8, 16, 32), search_range=2,
                use_context_net=False, dtype="float32",
            ),
            sgm=SGMConfig(max_disparity=32),
            egomotion=EgoMotionConfig(
                max_features=64, nms_radius=2, ransac_hypotheses=8,
                lk_pyramid_levels=1, min_inliers=4,
            ),
        )
        ckpt = None
    else:
        config = PipelineConfig(height=h, width=w)
        ckpt = default_flow_checkpoint()
    # bench.py auto-scale semantics: half-res flow+SGM iff gated weights.
    fscale, sscale = args.flow_input_scale, args.sgm_input_scale
    if fscale == 0:
        fscale = 2 if (ckpt and flow_checkpoint_scale2_gated(ckpt)) else 1
    if sscale == 0:
        sscale = fscale
    config = config.replace(flow_input_scale=fscale, sgm_input_scale=sscale)

    stereo = StereoModel.create(fx=args.fx, fy=args.fx, cx=w / 2.0,
                                cy=h / 2.0, baseline=args.baseline)
    if ckpt is not None:
        params, flow_cfg = load_flow_checkpoint(ckpt, config.flownet)
        config = config.replace(flownet=flow_cfg)
        model = PWCNet(config=flow_cfg)
    else:
        model = PWCNet(config=config.flownet)
        params = init_pwc_params(model, h, w)

    print(f"# rendering {args.n_render} frames at {h}x{w} ...", flush=True)
    frames, order = build_frames(h, w, args.fx, args.baseline, args.fps,
                                 args.n_render)

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    sent = {"n": 0}

    def sensor():
        conn, _ = srv.accept()
        period = 1.0 / args.fps
        t_end = time.time() + args.duration
        k = 0
        try:
            with conn:
                while time.time() < t_end:
                    t_next = time.time() + period
                    left, right = frames[order[k % len(order)]]
                    readers.write_socket_frame(conn, left, right,
                                               time.time())
                    sent["n"] += 1
                    k += 1
                    dt = t_next - time.time()
                    if dt > 0:
                        time.sleep(dt)
        except (BrokenPipeError, ConnectionResetError):
            pass
        finally:
            srv.close()

    runner = PipelineRunner(config, stereo, params, model,
                            ring_capacity=1, drop_oldest=True)
    th = threading.Thread(target=sensor, daemon=True)
    th.start()
    seq = readers.SocketStereoSequence("127.0.0.1", port,
                                       idle_timeout=10.0)
    t0 = time.time()
    results = runner.run(seq)
    th.join(timeout=10.0)

    n = len(results)
    if n == 0:
        print(json.dumps({"error": "no frames processed"}))
        return 1
    lat = np.asarray([r.harvest_wall - r.time for r in results])
    tail = lat[int(n * (1.0 - args.tail_frac)):]
    tail_res = results[int(n * (1.0 - args.tail_frac)):]
    span = tail_res[-1].harvest_wall - tail_res[0].harvest_wall
    sustained = (len(tail_res) - 1) / span if span > 0 else float("nan")
    stats = {
        "metric": "live_replay_latency",
        "resolution": f"{h}x{w}",
        "fps_in": args.fps,
        "flow_input_scale": fscale,
        "sgm_input_scale": sscale,
        "sent": sent["n"],
        "processed": n,
        "ring_dropped": runner.ring.dropped(),
        "wall_s": round(time.time() - t0, 1),
        "latency_ms": {
            "first_frame": round(float(lat[0]) * 1e3, 1),
            "steady_p50": round(float(np.median(tail)) * 1e3, 1),
            "steady_p95": round(float(np.percentile(tail, 95)) * 1e3, 1),
            "steady_max": round(float(tail.max()) * 1e3, 1),
        },
        "sustained_fps": round(sustained, 2),
        "frame_valid_tail": bool(all(r.frame_valid for r in tail_res)),
    }
    print(json.dumps(stats), flush=True)
    p95 = stats["latency_ms"]["steady_p95"]
    print(f"# steady-state latency p50/p95/max = "
          f"{stats['latency_ms']['steady_p50']}/{p95}/"
          f"{stats['latency_ms']['steady_max']} ms at {args.fps} fps in "
          f"({stats['processed']}/{stats['sent']} processed, "
          f"{stats['ring_dropped']} dropped latest-wins)", flush=True)
    if args.budget_ms is not None and p95 > args.budget_ms:
        print(f"# FAIL: p95 {p95} ms > budget {args.budget_ms} ms")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
