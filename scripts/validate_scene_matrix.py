#!/usr/bin/env python
"""Detection-quality gate over the FULL validation scene matrix
(VERDICT round-2 item 4): every canned PlanarSceneSequence scene —
lateral, multi_object, occlusion, approach, rotating_cam
(io/scenes.py validation_scenes) — runs through the complete pipeline
(SGM + PWC flow + ego-motion + scene flow + clustering + tracking) and is
scored against the renderer's analytic ground truth
(eval.evaluate_planar_sequence). Exits nonzero unless ALL scenes pass.

Usage:
  python scripts/validate_scene_matrix.py [ckpt] [--scale N] [--vel-gate V]

ckpt: flow checkpoint ('auto' = bundled weights). --scale 2 evaluates the
serving point (flow 2 + SGM 2 at 384x896, net sees 192x448 — the served
distribution, PLAN_NEXT 2026-08-19b); default scale 1 at 192x448.
--vel-gate: median velocity error gate in m/s (1.4 carries the measured
pwc_v5 local-motion under-tracking; tighten to 0.6 for v6+).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", default="auto")
    # Only 1 and 2 select validated geometries (2 -> 384x896 so the net
    # sees the served 192x448); other values would silently score an
    # unserved resolution.
    ap.add_argument("--scale", type=int, default=1, choices=[1, 2])
    ap.add_argument("--vel-gate", type=float, default=1.4)
    ap.add_argument("--disparity-rate", type=float, default=0.0,
                    help="SceneFlowConfig.dynamic_disparity_rate (px/s; 0 "
                         "= off). The approach scene needs > 0 to be "
                         "detectable at all (flow-gate blind spot); 3.0 "
                         "is the validated operating point.")
    ap.add_argument("--scenes", default=None,
                    help="comma-separated subset (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.eval import evaluate_planar_sequence
    from moving_object_detector_tpu.io.scenes import validation_scenes
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
    print(f"# ckpt={ckpt} scale={args.scale} vel_gate={args.vel_gate}")

    if args.scale == 2:
        h, w, fx = 384, 896, 600.0
    else:
        h, w, fx = 192, 448, 300.0
    scenes = validation_scenes(h=h, w=w, fx=fx)
    if args.scenes:
        keep = set(args.scenes.split(","))
        scenes = {k: v for k, v in scenes.items() if k in keep}

    failures = []
    for name, seq in scenes.items():
        m = evaluate_planar_sequence(
            seq, params, model,
            flow_input_scale=args.scale, sgm_input_scale=args.scale,
            dynamic_disparity_rate=args.disparity_rate,
            details=True,
        )
        # Per-object hit fractions over the frames where that object was
        # scoreable (visible enough to be expected).
        n_obj = len(seq.objects)
        obj_hits = [0] * n_obj
        obj_scoreable = [0] * n_obj
        for df in m["detail_frames"]:
            for sc, hit in zip(df["scoreable"], df["matched"]):
                j = sc["obj_index"]
                obj_scoreable[j] += 1
                obj_hits[j] += int(hit)
        frac = [
            (obj_hits[j] / obj_scoreable[j]) if obj_scoreable[j] else None
            for j in range(n_obj)
        ]

        errs = []
        if m["phantoms"] != 0:
            errs.append(f"phantoms={m['phantoms']}")
            for df in m["detail_frames"]:
                for ph in df.get("phantoms", []):
                    c = ph["center"]
                    v = ph["vel"]
                    px = ph["px"]
                    print(f"#   phantom frame {df['k']}: "
                          f"cam=({c[0]:.2f},{c[1]:.2f},{c[2]:.2f}) "
                          f"|v|={sum(x * x for x in v) ** 0.5:.2f} "
                          f"px={px}")
        if m["ego_failures"] != 0:
            errs.append(f"ego_failures={m['ego_failures']}")
        if m["d1"] >= 0.05:
            errs.append(f"d1={m['d1']:.3f}")
        if name == "occlusion":
            # During the crossing one object occludes the other; each
            # object must still be hit in >= half its scoreable frames.
            for j, f in enumerate(frac):
                if f is not None and f < 0.5:
                    errs.append(f"obj{j}_hit={f:.2f}<0.5")
        elif name == "approach":
            # Expansion flow crosses the dynamic gate late: require the
            # last scoreable frames to hit.
            appr = [df["matched"][0] for df in m["detail_frames"]
                    if df["matched"]]
            if sum(appr[-3:]) < 2:
                errs.append(f"approach_last3={appr[-3:]}")
        else:
            for j, f in enumerate(frac):
                if f is not None and f < 0.8:
                    errs.append(f"obj{j}_hit={f:.2f}<0.8")
        if m["vel_err_median"] >= args.vel_gate:
            errs.append(f"vel_err={m['vel_err_median']:.3f}")
        if m["center_err_median"] >= 0.3:
            errs.append(f"center_err={m['center_err_median']:.3f}")

        status = "PASS" if not errs else "FAIL(" + ",".join(errs) + ")"
        hits_s = ",".join(
            "-" if f is None else f"{f:.2f}" for f in frac
        )
        print(
            f"{name:13s} {status:40s} d1={m['d1']:.3f} "
            f"epe={m['flow_epe']:.2f} ego={m['ego_rot_err_deg']:.2f}deg "
            f"hits=[{hits_s}] vel={m['vel_err_median']:.3f} "
            f"ctr={m['center_err_median']:.3f}",
            flush=True,
        )
        if errs:
            failures.append(name)

    if failures:
        print(f"FAIL: {failures}")
        sys.exit(1)
    print("ALL SCENES PASS")


if __name__ == "__main__":
    main()
