"""Evaluate SGM disparity and PWC-Net flow on a KITTI-2015-format dataset.

The build environment ships no dataset, so this script is data-gated: point
it at a local copy of the KITTI scene-flow training split

    eval_kitti.py --root /path/to/kitti/training [--limit N]
                  [--flow-checkpoint CKPT]

expecting the standard layout
    image_2/XXXXXX_10.png, image_2/XXXXXX_11.png   (left, t and t+1)
    image_3/XXXXXX_10.png                          (right, t)
    disp_occ_0/XXXXXX_10.png                       (GT disparity, u16/256)
    flow_occ/XXXXXX_10.png                         (GT flow, u16 KITTI enc.)

Reports D1-all for disparity (ops/sgm.py vs sgm_gpu_ros's role, SURVEY.md
§2.3) and EPE/Fl-all for optical flow, via the metric kernels in eval.py.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_kitti_disparity(path):
    from moving_object_detector_tpu.io.readers import read_png

    raw = read_png(path)
    if raw.dtype != np.uint16:
        raw = (raw * 65535.0 + 0.5).astype(np.uint16) if raw.dtype.kind == "f" else raw.astype(np.uint16)
    disp = raw.astype(np.float32) / 256.0
    valid = raw > 0
    return disp, valid


def load_kitti_flow(path):
    from moving_object_detector_tpu.io.readers import read_png

    raw = read_png(path)
    assert raw.ndim == 3 and raw.shape[2] == 3, "flow png must be 16-bit RGB"
    raw = raw.astype(np.float32)
    u = (raw[..., 0] - 2.0 ** 15) / 64.0
    v = (raw[..., 1] - 2.0 ** 15) / 64.0
    valid = raw[..., 2] > 0
    return np.stack([u, v], axis=-1), valid


def to_gray(img):
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114], np.float32)
    img = img.astype(np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True,
                    help="KITTI scene-flow training/ directory")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--flow-checkpoint", default=None)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from moving_object_detector_tpu.config import PipelineConfig, SGMConfig
    from moving_object_detector_tpu.eval import disparity_d1, flow_epe
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.ops.sgm import sgm_disparity_raw
    from moving_object_detector_tpu.pipeline import _flow_forward

    frames = sorted(
        glob.glob(os.path.join(args.root, "image_2", "*_10.png"))
    )[: args.limit]
    if not frames:
        print(f"no frames under {args.root}", file=sys.stderr)
        return 2

    sgm_cfg = SGMConfig()
    model = None
    params = None

    d1s, epes, fls = [], [], []
    for lf in frames:
        stem = os.path.basename(lf)[:6]
        rf = os.path.join(args.root, "image_3", stem + "_10.png")
        lf2 = os.path.join(args.root, "image_2", stem + "_11.png")
        dgt = os.path.join(args.root, "disp_occ_0", stem + "_10.png")
        fgt = os.path.join(args.root, "flow_occ", stem + "_10.png")

        from moving_object_detector_tpu.io.readers import read_png

        left = to_gray(read_png(lf))
        h, w = left.shape

        if os.path.exists(rf) and os.path.exists(dgt):
            right = to_gray(read_png(rf))
            pred = np.asarray(
                sgm_disparity_raw(jnp.asarray(left), jnp.asarray(right),
                                  sgm_cfg)
            )
            gt, valid = load_kitti_disparity(dgt)
            d1s.append(disparity_d1(pred, gt, gt_valid=valid)["d1"])

        if os.path.exists(lf2) and os.path.exists(fgt):
            if model is None:
                cfg = PipelineConfig(height=h, width=w)
                model = PWCNet(config=cfg.flownet)
                params = init_pwc_params(model, h, w)
                if args.flow_checkpoint:
                    from moving_object_detector_tpu.utils.checkpoint import (
                        restore_flow_params,
                    )

                    params = restore_flow_params(
                        args.flow_checkpoint, like=params
                    )
            nxt = to_gray(read_png(lf2))
            pred_flow = np.asarray(
                _flow_forward(params, model, jnp.asarray(left),
                              jnp.asarray(nxt))
            )
            gt_flow, fvalid = load_kitti_flow(fgt)
            stats = flow_epe(pred_flow, gt_flow, valid_mask=fvalid)
            epes.append(stats["epe"])
            fls.append(stats["fl"])

    out = {"frames": len(frames)}
    if d1s:
        out["d1_all"] = round(float(np.mean(d1s)), 4)
    if epes:
        out["flow_epe"] = round(float(np.mean(epes)), 3)
        out["flow_fl_all"] = round(float(np.mean(fls)), 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
