#!/usr/bin/env python
"""Structured channel pruning for trained PWC-Net checkpoints.

Full-resolution serving lever (VERDICT round-2 #3): the flow net is the
largest stage at flow_input_scale=1, and a from-scratch slim retrain
measured capacity-limited on large motions (PLAN_NEXT 2026-08-19). This
instead SLICES a trained checkpoint: per dense-block the lowest-L1 output
channels are removed together with the matching input rows of every
downstream consumer (dense-net concatenation layout), producing a smaller
architecture whose surviving weights are bit-identical — a far better
finetune init than random (it never revisits the predict-zero basin).

Exactness invariant (tested in tests/test_prune.py): pruning channels
whose kernel AND bias are all-zero leaves the network function unchanged,
because a zeroed ConvBlock output is exactly 0 after leaky_relu and
contributes exactly 0 through every consumer.

Checkpoints are shape-self-describing (utils/checkpoint.py
infer_flow_config), so pruned weights serve everywhere with no flags.

Scope: FlowEstimator dense blocks (all levels, shared target widths) and
the ContextNetwork trunk. The feature pyramid and the 16-channel up
projection are left intact (they feed the correlation layer / inter-level
carry whose semantics the estimators were trained against).

Usage:
  python scripts/prune_flow.py in.npz out.npz \
      --estimator 64,64,48,32,16 --context 64,64,64,48,32,16
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _level_indices(params: dict, cls: str) -> list[int]:
    pat = re.compile(rf"params/{cls}_(\d+)/")
    return sorted({int(m.group(1)) for k in params for m in [pat.match(k)] if m})


def _l1_scores(kernel: np.ndarray, bias: np.ndarray) -> np.ndarray:
    """Per-output-channel importance: mean |kernel| + |bias|."""
    k = np.abs(kernel.astype(np.float64)).mean(axis=tuple(range(kernel.ndim - 1)))
    return k + np.abs(bias.astype(np.float64))


def _keep_indices(scores: np.ndarray, n_keep: int) -> np.ndarray:
    """Indices of the n_keep highest-scoring channels, ascending (order
    within the block is preserved so downstream layouts stay aligned)."""
    if n_keep > scores.shape[0]:
        raise ValueError(f"cannot keep {n_keep} of {scores.shape[0]} channels")
    return np.sort(np.argsort(scores)[::-1][:n_keep])


def prune_pyramid_params(
    p: dict[str, np.ndarray],
    pyramid_channels: tuple[int, ...],
) -> dict[str, np.ndarray]:
    """Prune the FeaturePyramid level widths IN PLACE to
    ``pyramid_channels`` (one target per level), slicing every consumer:

    * the level's two ConvBlocks (block 2l+1's input rows follow block
      2l's kept outputs) and the next level's stride-2 conv input rows;
    * the f1 columns of the matching FlowEstimator's input stack — which
      appear in EVERY dense block, both heads and (at the finest level)
      the ContextNetwork's first conv, since the dense concat re-exposes
      the base stack to each consumer;
    * the correlation renormalization: ``ops.flow_ops.correlation`` takes
      the MEAN over channels, so dropping c_old - c_new channels scales
      every corr plane by c_old/c_new even when the dropped channels are
      all-zero. leaky_relu commutes with a positive scale and the corr
      planes are consumed only through the estimator base columns, so
      multiplying those kernel rows by c_new/c_old restores the function
      exactly (tested in tests/test_prune.py).

    The zero-channel exactness invariant of the module docstring therefore
    extends to the pyramid; for L1-lowest (non-zero) channels this is the
    same finetune-init approximation as the estimator path.
    """
    fp = "params/FeaturePyramid_0/"
    n_blocks = 0
    while f"{fp}ConvBlock_{n_blocks}/Conv_0/kernel" in p:
        n_blocks += 1
    levels = n_blocks // 2
    if len(pyramid_channels) != levels:
        raise ValueError(
            f"pyramid target has {len(pyramid_channels)} levels, "
            f"checkpoint has {levels}"
        )
    old_widths = [
        p[f"{fp}ConvBlock_{2 * l + 1}/Conv_0/kernel"].shape[-1]
        for l in range(levels)
    ]

    prev_keep = None  # input-row selection for the next conv in the chain
    level_keep: dict[int, np.ndarray] = {}
    for l in range(levels):
        for j in (2 * l, 2 * l + 1):
            kk = f"{fp}ConvBlock_{j}/Conv_0/kernel"
            bk = f"{fp}ConvBlock_{j}/Conv_0/bias"
            kern, bias = p[kk], p[bk]
            if prev_keep is not None:
                kern = kern[..., prev_keep, :]
            keep = _keep_indices(_l1_scores(kern, bias), pyramid_channels[l])
            p[kk] = kern[..., keep]
            p[bk] = bias[keep]
            prev_keep = keep
        level_keep[l] = prev_keep

    est_levels = _level_indices(p, "FlowEstimator")
    finest = max(est_levels) if est_levels else None
    for i in est_levels:
        lvl = levels - 1 - i  # estimator 0 sits at the coarsest level
        keep = level_keep[lvl]
        old_ch = old_widths[lvl]
        new_ch = len(keep)
        pre = f"params/FlowEstimator_{i}/"
        base_in = p[f"{pre}ConvBlock_0/Conv_0/kernel"].shape[-2]
        if i == 0:
            extras = 0  # coarsest input = [corr, f1]
        else:  # [corr, f1, up_feat, flow]
            up_ch = p[f"params/FlowEstimator_{i - 1}/Conv_1/kernel"].shape[-1]
            extras = up_ch + 2
        corr_dim = base_in - old_ch - extras
        side = int(round(corr_dim ** 0.5))
        assert side * side == corr_dim and side % 2 == 1, (
            f"estimator {i}: corr_dim {corr_dim} is not an odd square "
            f"(base {base_in}, f1 {old_ch}, extras {extras})"
        )
        base_cols = np.concatenate([
            np.arange(corr_dim),
            corr_dim + keep,
            np.arange(corr_dim + old_ch, base_in),
        ])
        corr_scale = new_ch / old_ch  # mean-divisor compensation

        def reslice(key: str):
            kin = p[key].shape[-2]
            cols = np.concatenate([base_cols, np.arange(base_in, kin)])
            kern = p[key][..., cols, :].astype(np.float32)
            kern[..., :corr_dim, :] *= corr_scale
            p[key] = kern

        j = 0
        while f"{pre}ConvBlock_{j}/Conv_0/kernel" in p:
            reslice(f"{pre}ConvBlock_{j}/Conv_0/kernel")
            j += 1
        for head in ("Conv_0", "Conv_1"):
            reslice(f"{pre}{head}/kernel")
        if i == finest and "params/ContextNetwork_0/Conv_0/kernel" in p:
            reslice("params/ContextNetwork_0/Conv_0/kernel")
    return p


def prune_flow_params(
    params: dict[str, np.ndarray],
    estimator_channels: tuple[int, ...],
    context_channels: tuple[int, ...] | None,
    pyramid_channels: tuple[int, ...] | None = None,
) -> dict[str, np.ndarray]:
    """Return a new flat param dict with the dense-block widths pruned to
    ``estimator_channels`` (every FlowEstimator level), the context
    trunk to ``context_channels`` (None = leave untouched), and the
    feature pyramid levels to ``pyramid_channels`` (None = leave
    untouched; applied first, so the estimator/context slicing below
    operates on the already-narrowed input stacks)."""
    p = dict(params)
    if pyramid_channels is not None:
        p = prune_pyramid_params(p, pyramid_channels)

    est_levels = _level_indices(p, "FlowEstimator")
    finest = max(est_levels) if est_levels else None
    finest_keep_cols = None  # column selection of the finest dense stack

    for lvl in est_levels:
        pre = f"params/FlowEstimator_{lvl}/"
        old_ch = []
        j = 0
        while f"{pre}ConvBlock_{j}/Conv_0/kernel" in p:
            old_ch.append(p[f"{pre}ConvBlock_{j}/Conv_0/kernel"].shape[-1])
            j += 1
        if len(estimator_channels) != len(old_ch):
            raise ValueError(
                f"estimator target has {len(estimator_channels)} blocks, "
                f"checkpoint has {len(old_ch)}"
            )
        base = p[f"{pre}ConvBlock_0/Conv_0/kernel"].shape[-2]
        # Per-block kept OUTPUT channels.
        keeps = []
        for j, n_new in enumerate(estimator_channels):
            kk = f"{pre}ConvBlock_{j}/Conv_0/kernel"
            bk = f"{pre}ConvBlock_{j}/Conv_0/bias"
            keep = _keep_indices(_l1_scores(p[kk], p[bk]), n_new)
            keeps.append(keep)
        # Input-column selection for a consumer seeing [base, y0..y_{m-1}].
        def stack_cols(m: int, extra: int = 0) -> np.ndarray:
            cols = [np.arange(base)]
            off = base
            for j in range(m):
                cols.append(off + keeps[j])
                off += old_ch[j]
            if extra:
                cols.append(np.arange(off, off + extra))
            return np.concatenate(cols)

        for j in range(len(old_ch)):
            kk = f"{pre}ConvBlock_{j}/Conv_0/kernel"
            bk = f"{pre}ConvBlock_{j}/Conv_0/bias"
            kern = p[kk][..., stack_cols(j), :][..., keeps[j]]
            p[kk] = kern
            p[bk] = p[bk][keeps[j]]
        all_cols = stack_cols(len(old_ch))
        for head in ("Conv_0", "Conv_1"):  # flow head, up projection
            p[f"{pre}{head}/kernel"] = p[f"{pre}{head}/kernel"][..., all_cols, :]
        if lvl == finest:
            finest_keep_cols = all_cols

    ctx_pre = "params/ContextNetwork_0/"
    has_ctx = f"{ctx_pre}Conv_0/kernel" in p
    if has_ctx and finest_keep_cols is not None:
        # Context input = [finest dense stack, flow(2)].
        k0 = p[f"{ctx_pre}Conv_0/kernel"]
        stack_in = k0.shape[-2] - 2
        cols = np.concatenate(
            [finest_keep_cols, np.arange(stack_in, stack_in + 2)]
        )
        p[f"{ctx_pre}Conv_0/kernel"] = k0[..., cols, :]
    if has_ctx and context_channels is not None:
        n_trunk = 0
        while f"{ctx_pre}Conv_{n_trunk + 1}/kernel" in p:
            n_trunk += 1  # Conv_0..n_trunk-1 are trunk; Conv_n_trunk = 2ch head
        if len(context_channels) != n_trunk:
            raise ValueError(
                f"context target has {len(context_channels)} convs, "
                f"checkpoint trunk has {n_trunk}"
            )
        prev_keep = None
        for j, n_new in enumerate(context_channels):
            kk = f"{ctx_pre}Conv_{j}/kernel"
            bk = f"{ctx_pre}Conv_{j}/bias"
            kern, bias = p[kk], p[bk]
            if prev_keep is not None:
                kern = kern[..., prev_keep, :]
            keep = _keep_indices(_l1_scores(kern, bias), n_new)
            p[kk] = kern[..., keep]
            p[bk] = bias[keep]
            prev_keep = keep
        kk = f"{ctx_pre}Conv_{n_trunk}/kernel"
        p[kk] = p[kk][..., prev_keep, :]
    return p


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--estimator", default="64,64,48,32,16",
                    help="comma-separated target dense-block widths")
    ap.add_argument("--context", default="64,64,64,48,32,16",
                    help="comma-separated target context trunk widths, "
                         "or 'keep'")
    ap.add_argument("--pyramid", default="keep",
                    help="comma-separated target feature-pyramid level "
                         "widths (one per level), or 'keep'")
    ap.add_argument("--check", action="store_true",
                    help="load the pruned checkpoint and run a tiny "
                         "forward pass (CPU)")
    args = ap.parse_args(argv)

    src = np.load(args.src)
    params = {k: np.asarray(src[k]) for k in src.files}
    est = tuple(int(x) for x in args.estimator.split(","))
    ctx = (None if args.context == "keep"
           else tuple(int(x) for x in args.context.split(",")))
    pyr = (None if args.pyramid == "keep"
           else tuple(int(x) for x in args.pyramid.split(",")))
    pruned = prune_flow_params(params, est, ctx, pyr)
    np.savez_compressed(
        args.dst, **{k: v.astype(np.float16) for k, v in pruned.items()}
    )
    n_old = sum(v.size for v in params.values())
    n_new = sum(v.size for v in pruned.values())
    print(f"{args.src} ({n_old / 1e6:.2f}M params) -> "
          f"{args.dst} ({n_new / 1e6:.2f}M params, "
          f"{100 * n_new / n_old:.1f}%)")

    if args.check:
        import jax.numpy as jnp

        from moving_object_detector_tpu.config import FlowNetConfig
        from moving_object_detector_tpu.models.pwc_net import PWCNet
        from moving_object_detector_tpu.utils.checkpoint import (
            load_flow_checkpoint,
        )

        loaded, cfg = load_flow_checkpoint(args.dst, FlowNetConfig())
        print("inferred:", cfg.estimator_channels, cfg.context_channels)
        net = PWCNet(config=cfg)
        x = jnp.zeros((1, 64, 128, 1), jnp.float32)
        flow, _ = net.apply(loaded, x, x)
        print("forward ok:", flow.shape)


if __name__ == "__main__":
    main()
