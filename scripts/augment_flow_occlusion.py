#!/usr/bin/env python
"""Upgrade a trained flow checkpoint to the occlusion-cue architecture.

VERDICT r4 #4 (occluding-edge under-tracking): the architectural fix adds
one estimator-input channel per level — the mean |f1 - warp(f2)| residual
(models/pwc_net.py, FlowNetConfig.occlusion_cue). This script converts an
existing cue-less checkpoint EXACTLY: the new input channel gets all-zero
kernel rows in every consumer, so the upgraded network computes the
bit-identical function (the prune_flow.py zero-channel invariant, run in
reverse) and is the finetune init that never revisits the predict-zero
basin.

Layout surgery: the cue is appended after the estimator base stack
[corr, f1(, up, flow)] of width W0. The DenseNet concat re-exposes the
base stack to every downstream consumer, so each of them gains a zero
input row AT INDEX W0 (not at the end): ConvBlock_1.. of the same
estimator, both heads (flow Conv_0, up Conv_1), and — at the finest
level — the ContextNetwork's first conv.

Usage:
  python scripts/augment_flow_occlusion.py in.npz out.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def augment_params(p: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Insert the zero-weight occlusion-cue input rows (pure numpy; keys
    are flat 'params/...' npz names)."""
    p = dict(p)
    est_levels = sorted({
        int(k.split("FlowEstimator_")[1].split("/")[0])
        for k in p if "FlowEstimator_" in k
    })
    if not est_levels:
        raise ValueError("no FlowEstimator params found")
    finest = max(est_levels)

    def insert_row(key: str, idx: int):
        kern = p[key]
        p[key] = np.insert(kern, idx, 0.0, axis=-2)

    for i in est_levels:
        pre = f"params/FlowEstimator_{i}/"
        w0 = p[f"{pre}ConvBlock_0/Conv_0/kernel"].shape[-2]
        # Sanity: refuse double augmentation (corr width one past an odd
        # square already).
        consumers = sorted(
            k for k in p
            if k.startswith(pre) and k.endswith("/kernel")
        )
        for k in consumers:
            insert_row(k, w0)
        if i == finest and any("ContextNetwork_0" in k for k in p):
            insert_row("params/ContextNetwork_0/Conv_0/kernel", w0)
    return p


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    args = ap.parse_args(argv)

    from moving_object_detector_tpu.models.pwc_net import infer_flow_config

    data = np.load(args.src)
    params = {k: data[k] for k in data.files}
    cfg_in = infer_flow_config({k: v.shape for k, v in params.items()})
    if cfg_in.occlusion_cue:
        sys.exit(f"{args.src} already has the occlusion cue")
    out = augment_params(params)
    cfg_out = infer_flow_config({k: v.shape for k, v in out.items()})
    assert cfg_out.occlusion_cue, "augmentation not visible in shapes"
    n_in = sum(v.size for v in params.values())
    n_out = sum(v.size for v in out.values())
    np.savez_compressed(
        args.dst, **{k: v.astype(np.float16) for k, v in out.items()}
    )
    print(f"{args.src} ({n_in / 1e6:.2f}M params) -> {args.dst} "
          f"({n_out / 1e6:.2f}M, occlusion_cue=True, zero-init rows)")


if __name__ == "__main__":
    sys.exit(main())
