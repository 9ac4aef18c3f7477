"""PWC-Net-style dense optical flow in Flax.

Replaces pwc_net_ros + the patched Caffe fork (SURVEY.md §2.3; consumed via
``estimateOpticalFlow`` at scene_flow_constructor.cpp:279-290). Architecture
parity with PWC-Net (Sun et al., CVPR 2018): a shared siamese feature
pyramid, per-level warping of the second image's features by the upsampled
coarser flow, a local correlation cost volume, a DenseNet-style flow
estimator, and a dilated context network at the finest estimated level.
Weights are trained/tuned on this side rather than ported from the dead
Caffe fork — SURVEY.md §7 step 7 plans "architecture parity + retuned
weights".

TPU-first choices: NHWC layout, bfloat16 conv compute with f32 flow heads,
static shapes per level, everything jit/vmap-friendly. Flow is estimated
down to quarter resolution and bilinearly upscaled (standard PWC-Net
behavior), so the hot convolutions run at <= H/4 x W/4.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import FlowNetConfig
from ..ops import flow_ops


def _dtype(cfg: FlowNetConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _correlation_dispatch(f1, f2, search_range: int, backend: str):
    """Correlation-layer backend dispatch (FlowNetConfig.corr_backend)."""
    from ..ops import resolve_auto_backend

    backend = resolve_auto_backend(backend)
    if backend in ("pallas", "pallas_interpret"):
        from ..ops.flow_corr_pallas import correlation_pallas

        return correlation_pallas(
            f1, f2, search_range, interpret=backend == "pallas_interpret"
        )
    return flow_ops.correlation(f1, f2, search_range)


class ConvBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, 0.1)


class FeaturePyramid(nn.Module):
    """Siamese feature extractor: one level per pyramid octave."""

    channels: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img):
        feats = []
        x = img
        for ch in self.channels:
            x = ConvBlock(ch, stride=2, dtype=self.dtype)(x)
            x = ConvBlock(ch, stride=1, dtype=self.dtype)(x)
            feats.append(x)
        return feats


class FlowEstimator(nn.Module):
    """DenseNet-style flow decoder head for one pyramid level.

    Returns (context_features, up_features, flow): the full dense stack
    feeds the context network at the finest level, while the inter-level
    carry is a slim ``up_channels`` projection — upsampling the full
    500+-channel stack between levels cost ~2-4 ms/frame at KITTI res
    (the original PWC-Net likewise carries a 2-channel deconv upfeat).
    """

    dtype: Any = jnp.bfloat16
    up_channels: int = 16
    channels: Tuple[int, ...] = (128, 128, 96, 64, 32)

    @nn.compact
    def __call__(self, x):
        for ch in self.channels:
            y = ConvBlock(ch, dtype=self.dtype)(x)
            x = jnp.concatenate([x, y], axis=-1)
        flow = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        up = nn.Conv(self.up_channels, (1, 1), dtype=self.dtype)(x)
        return x, up, flow


class ContextNetwork(nn.Module):
    """Dilated refinement network applied at the finest estimated level.

    ``dilation_impl="space_to_batch"`` lowers each dilated conv as d*d
    dense convs on phase-subsampled grids (flow_ops.space_to_batch) — the
    identical function with the identical params, so checkpoints are
    interchangeable between the two lowerings.
    """

    dtype: Any = jnp.bfloat16
    dilation_impl: str = "direct"
    channels: Tuple[int, ...] = (128, 128, 128, 96, 64, 32)

    @nn.compact
    def __call__(self, features, flow):
        x = jnp.concatenate([features, flow.astype(self.dtype)], axis=-1)
        dilations = (1, 2, 4, 8, 16, 1)[: len(self.channels)]
        for ch, dil in zip(self.channels, dilations):
            s2b = self.dilation_impl == "space_to_batch" and dil > 1
            if s2b:
                x, hw = flow_ops.space_to_batch(x, dil)
            x = nn.Conv(
                ch,
                (3, 3),
                padding="SAME",
                kernel_dilation=(1, 1) if s2b else (dil, dil),
                dtype=self.dtype,
            )(x)
            if s2b:
                x = flow_ops.batch_to_space(x, dil, hw)
            x = nn.leaky_relu(x, 0.1)
        residual = nn.Conv(2, (3, 3), padding="SAME", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return flow + residual


class PWCNet(nn.Module):
    """Full coarse-to-fine flow network.

    Input: two (B, H, W, 1) grayscale (or (B, H, W, 3) RGB) images in
    [0, 1]; H and W must be divisible by 2**pyramid_levels.
    Output: (B, H, W, 2) forward flow (pixels, full resolution) plus the
    per-level flow list for training supervision.
    """

    config: FlowNetConfig = FlowNetConfig()

    @nn.compact
    def __call__(self, img1, img2):
        cfg = self.config
        assert len(cfg.feature_channels) >= 3, (
            "need >= 3 pyramid levels (flow is estimated down to level 2)"
        )
        dt = _dtype(cfg)
        b, h, w, _ = img1.shape

        pyramid = FeaturePyramid(cfg.feature_channels, dtype=dt)
        # Siamese extraction as ONE batch-2b conv pass instead of two
        # sequential applications: identical math (convolutions are
        # batch-parallel; shared params either way), but half the kernel
        # dispatches and double the matmul M-dimension at the small
        # coarse levels — measured ~0.25 ms/frame at full-res KITTI where
        # the pyramid was 2 x 0.39 ms of mostly-underutilized MXU work.
        both = pyramid(jnp.concatenate([img1, img2], axis=0).astype(dt))
        f1s = [f[:b] for f in both]
        f2s = [f[b:] for f in both]

        flows = []
        flow = None
        up_feat = None
        # Coarse-to-fine from the top of the pyramid down to level 2
        # (quarter resolution), standard PWC-Net.
        for lvl in range(len(f1s) - 1, 1, -1):
            f1, f2 = f1s[lvl], f2s[lvl]
            if flow is None:
                warped = f2
                corr_in = []
            else:
                # Resize to the actual next-level shape (robust to odd level
                # sizes from non-power-of-two inputs), scaling vectors by the
                # true width ratio.
                ratio = f1.shape[2] / flow.shape[2]
                flow = flow_ops.resize_bilinear(
                    flow, (f1.shape[1], f1.shape[2])
                ) * ratio
                up_feat = flow_ops.resize_bilinear(
                    up_feat, (f1.shape[1], f1.shape[2])
                )
                # Warp in the compute dtype (bf16): halves the gather
                # traffic of the warp layer; the features are bf16-precision
                # anyway.
                if cfg.warp_backend == "two_pass":
                    warped = flow_ops.warp_two_pass(f2, flow.astype(dt))
                else:
                    warped = flow_ops.warp(f2, flow.astype(dt))
                corr_in = [up_feat.astype(dt), flow.astype(dt)]
            corr = _correlation_dispatch(
                f1.astype(jnp.float32),
                warped.astype(jnp.float32),
                cfg.search_range,
                cfg.corr_backend,
            ).astype(dt)
            corr = nn.leaky_relu(corr, 0.1)
            extra = []
            if cfg.occlusion_cue:
                # Occlusion cue: mean |f1 - warp(f2)| over channels. Large
                # exactly where the true match is hidden behind an
                # occluding edge (the warped features then show the
                # occluder, not the match) — the signal the estimator
                # needs to extrapolate boundary-owned flow instead of
                # averaging mismatched evidence. Appended LAST so a
                # cue-less checkpoint upgrades exactly by zero-padding
                # each estimator's first-conv kernel
                # (scripts/augment_flow_occlusion.py).
                occ = jnp.mean(
                    jnp.abs(f1.astype(jnp.float32)
                            - warped.astype(jnp.float32)),
                    axis=-1, keepdims=True,
                ).astype(dt)
                extra = [occ]
            x = jnp.concatenate([corr, f1] + corr_in + extra, axis=-1)
            feat, up, res_flow = FlowEstimator(
                dtype=dt, channels=cfg.estimator_channels
            )(x)
            flow = res_flow if flow is None else flow + res_flow
            if lvl == 2 and cfg.use_context_net:
                flow = ContextNetwork(
                    dtype=dt,
                    dilation_impl=cfg.context_dilation_impl,
                    channels=cfg.context_channels,
                )(feat, flow)
            flows.append(flow)
            up_feat = up

        # Upscale quarter-res flow to full resolution ( x4 and scale ).
        full = flow_ops.resize_bilinear(flow, (h, w)) * (h / flow.shape[1])
        return full, flows[::-1]


def create_pwc_net(cfg: FlowNetConfig | None = None) -> PWCNet:
    return PWCNet(config=cfg or FlowNetConfig())


def infer_flow_config(
    shapes: dict, base: FlowNetConfig | None = None
) -> FlowNetConfig:
    """Recover the architecture fields of a checkpoint's FlowNetConfig from
    its kernel shapes (flat "params/Module_i/.../kernel" keys -> shape).

    Checkpoints are shape-self-describing: feature/estimator/context widths
    are the kernels' output channels, search_range falls out of the first
    estimator conv's input width ((2r+1)^2 correlation planes + top-level
    features). Non-architecture fields (dtype, kernel backends) come from
    ``base``. This lets slim/wide decoder variants (the
    estimator_channels/context_channels retraining knobs) load with zero
    CLI plumbing — serving infers the net from the weights, the way the
    reference's Caffe prototxt travels with its caffemodel.
    """
    import dataclasses
    import math

    base = base or FlowNetConfig()

    def out_ch(key: str) -> int:
        return int(shapes[key][-1])

    def indices(prefix: str, field: str) -> list[int]:
        found = set()
        for k in shapes:
            if k.startswith(prefix + field + "_") and k.endswith("/kernel"):
                found.add(int(k[len(prefix + field + "_"):].split("/")[0]))
        return sorted(found)

    fp = "params/FeaturePyramid_0/"
    n_blocks = len(indices(fp, "ConvBlock"))
    assert n_blocks % 2 == 0 and n_blocks >= 6, n_blocks
    feature_channels = tuple(
        out_ch(f"{fp}ConvBlock_{2 * i + 1}/Conv_0/kernel")
        for i in range(n_blocks // 2)
    )
    # Input channel count (1 = grayscale, 3 = RGB weights): the first
    # pyramid conv's kernel input width.
    in_channels = int(shapes[f"{fp}ConvBlock_0/Conv_0/kernel"][-2])

    est = "params/FlowEstimator_0/"
    estimator_channels = tuple(
        out_ch(f"{est}ConvBlock_{i}/Conv_0/kernel")
        for i in indices(est, "ConvBlock")
    )

    use_context = any(k.startswith("params/ContextNetwork_0/") for k in shapes)
    context_channels = base.context_channels
    if use_context:
        ctx = indices("params/ContextNetwork_0/", "Conv")
        context_channels = tuple(
            out_ch(f"params/ContextNetwork_0/Conv_{i}/kernel")
            for i in ctx[:-1]  # the last conv is the 2-channel flow head
        )

    corr_dim = (
        int(shapes[f"{est}ConvBlock_0/Conv_0/kernel"][-2])
        - feature_channels[-1]
    )
    # The occlusion cue adds exactly one estimator-input channel per
    # level, so the top-level input width is corr + features [+ 1]; a
    # width that is one past a perfect odd square identifies a cue-bearing
    # checkpoint (both cases are unambiguous: consecutive odd squares
    # differ by >= 8).
    side = math.isqrt(corr_dim)
    if side * side == corr_dim and side % 2 == 1:
        occlusion_cue = False
    else:
        side = math.isqrt(corr_dim - 1)
        assert side * side == corr_dim - 1 and side % 2 == 1, corr_dim
        occlusion_cue = True
    search_range = (side - 1) // 2

    return dataclasses.replace(
        base,
        pyramid_levels=len(feature_channels),
        feature_channels=feature_channels,
        estimator_channels=estimator_channels,
        context_channels=context_channels,
        use_context_net=use_context,
        search_range=search_range,
        in_channels=in_channels,
        occlusion_cue=occlusion_cue,
    )


def init_pwc_params(model: PWCNet, height: int, width: int, key=None):
    """Initialize parameters (identical for every input resolution).

    All layers are convolutions, so the param pytree does not depend on
    H/W. Tracing at full resolution compiled the whole forward on the
    target backend just to materialize shapes (~minutes at KITTI res over
    the tunneled TPU); instead trace at the smallest resolution the
    pyramid accepts.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    n = 2 ** model.config.pyramid_levels
    c = getattr(model.config, "in_channels", 1)
    dummy = jnp.zeros((1, n, 2 * n, c), jnp.float32)
    # jit: one compiled program instead of ~50 eager dispatches (200+ s on
    # a 1-core host), and it lands in the persistent compilation cache.
    return jax.jit(model.init)(key, dummy, dummy)


def init_pwc_params_abstract(model: PWCNet):
    """Param pytree as ShapeDtypeStructs — no compile, no compute. Use as
    the ``like`` when restoring a checkpoint (utils/checkpoint)."""
    n = 2 ** model.config.pyramid_levels
    c = getattr(model.config, "in_channels", 1)
    dummy = jnp.zeros((1, n, 2 * n, c), jnp.float32)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy, dummy)
