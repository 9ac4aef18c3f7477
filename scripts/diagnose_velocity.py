#!/usr/bin/env python
"""Published-velocity error attribution (VERDICT r4 weak #6).

The per-object velocity the pipeline publishes is the cluster's
median-|v| member (clusterer_nodelet.cpp:168-177 semantics); on the
held-out real-texture sequence its median error measured 0.59-0.61 m/s
at the serving point vs the 0.3 m/s `dynamic_speed` gate. This script
splits that error between the three candidate terms by running the SAME
sequence/scoring with ground-truth stage substitution
(eval.evaluate_planar_sequence flow_oracle / disparity_oracle):

  mode            flow      disparity   remaining error sources
  full            net       SGM         everything (the headline number)
  gt-flow         GT        SGM         disparity subpixel + construction
  gt-disp         net       GT          flow + construction
  gt-both         GT        GT          scene-flow construction + median
                                        member selection only

Usage:
  python scripts/diagnose_velocity.py [ckpt] [--scale 2] [--modes all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "tests",
                       "fixtures", "real_textures.npz")


def heldout_textures():
    data = np.load(FIXTURE)
    return {
        k: data[k].astype(np.float32) / 255.0
        for k in data.files if k.startswith("heldout_")
    }


def build_sequence(h, w, fx):
    from moving_object_detector_tpu.io.scenes import (
        PlaneObject,
        PlanarSceneSequence,
    )

    tex = heldout_textures()
    # Mirrors tests/test_real_sequence._sequence (the gated evaluation).
    return PlanarSceneSequence(
        h, w, fx=fx, bg_depth=12.0, bg_texture=tex["heldout_camera"],
        objects=[
            PlaneObject(
                center0=(-1.2, -0.75, 6.0), size=(2.0, 1.28),
                velocity=(2.0, 0.0, 0.0), texture=tex["heldout_blade"],
            ),
            PlaneObject(
                center0=(0.55, 0.5, 6.5), size=(1.7, 1.1),
                velocity=(0.2, 0.0, -4.0),
                texture=tex["heldout_freedom"],
            ),
        ],
        cam_velocity=(0.5, 0.0, 0.3), yaw_rate=np.deg2rad(1.5),
        fps=10.0, n_frames=7,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="auto")
    ap.add_argument("--scale", type=int, default=2, choices=[1, 2])
    ap.add_argument("--modes", default="all",
                    help="comma list of full,gt-flow,gt-disp,gt-both")
    ap.add_argument("--sgm-scale", type=int, default=0,
                    help="override sgm_input_scale (0 = same as --scale);"
                         " e.g. --scale 2 --sgm-scale 1 measures the"
                         " quality-serving point (half-res flow,"
                         " full-res SGM)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.eval import evaluate_planar_sequence
    from moving_object_detector_tpu.models.pwc_net import PWCNet
    from moving_object_detector_tpu.utils.checkpoint import (
        load_flow_checkpoint,
        resolve_flow_checkpoint,
    )

    ckpt = resolve_flow_checkpoint(args.ckpt)
    if not ckpt:
        sys.exit("no flow checkpoint")
    params, cfg = load_flow_checkpoint(ckpt, PipelineConfig().flownet)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model = PWCNet(config=cfg)

    if args.scale == 2:
        h, w, fx = 384, 896, 600.0
    else:
        h, w, fx = 192, 448, 300.0
    print(f"# ckpt={ckpt} scale={args.scale} res={h}x{w}")

    modes = {
        "full": (False, False),
        "gt-flow": (True, False),
        "gt-disp": (False, True),
        "gt-both": (True, True),
    }
    if args.modes != "all":
        keep = set(args.modes.split(","))
        modes = {k: v for k, v in modes.items() if k in keep}

    rows = {}
    for name, (fo, do) in modes.items():
        seq = build_sequence(h, w, fx)
        m = evaluate_planar_sequence(
            seq, params, model,
            flow_input_scale=args.scale,
            sgm_input_scale=args.sgm_scale or args.scale,
            flow_oracle=fo, disparity_oracle=do,
        )
        rows[name] = {
            "vel_err_median": round(float(m["vel_err_median"]), 3),
            "center_err_median": round(float(m["center_err_median"]), 3),
            "det": f"{m['det_hits']}/{m['det_scoreable']}",
            "phantoms": int(m["phantoms"]),
            "epe": round(float(m["flow_epe"]), 3),
        }
        print(f"{name:8s} vel_err={rows[name]['vel_err_median']:.3f} "
              f"center_err={rows[name]['center_err_median']:.3f} "
              f"phantoms={rows[name]['phantoms']}", flush=True)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    sys.exit(main())
