"""Structured-pruning tests (scripts/prune_flow.py): shape mechanics,
config round-trip through the shape-self-describing checkpoint loader, and
the exactness invariant — pruning all-zero channels leaves the network
function unchanged (a zeroed ConvBlock output is exactly 0 after
leaky_relu and contributes exactly 0 through every consumer)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from prune_flow import prune_flow_params  # noqa: E402

from moving_object_detector_tpu.config import FlowNetConfig  # noqa: E402
from moving_object_detector_tpu.models.pwc_net import (  # noqa: E402
    PWCNet,
    init_pwc_params,
)

CFG = FlowNetConfig(
    feature_channels=(8, 16, 32, 32),  # 2 estimator levels (3 and 2)
    search_range=2,
    use_context_net=True,
    estimator_channels=(16, 16, 8),
    context_channels=(16, 8),
    dtype="float32",
)
EST_T = (8, 8, 4)
CTX_T = (8, 4)


def _flat(params):
    out = {}
    for kpath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        out[key] = np.asarray(leaf)
    return out


def _unflat(flat):
    tree = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree


def test_prune_shapes_and_forward():
    model = PWCNet(config=CFG)
    params = init_pwc_params(model, 32, 48)
    pruned = prune_flow_params(_flat(params), EST_T, CTX_T)

    for lvl in (0, 1):
        for j, ch in enumerate(EST_T):
            assert pruned[
                f"params/FlowEstimator_{lvl}/ConvBlock_{j}/Conv_0/kernel"
            ].shape[-1] == ch
    assert pruned["params/ContextNetwork_0/Conv_0/kernel"].shape[-1] == CTX_T[0]
    assert pruned["params/ContextNetwork_0/Conv_2/kernel"].shape[-2:] == (
        CTX_T[-1], 2,
    )

    slim_cfg = FlowNetConfig(
        feature_channels=CFG.feature_channels,
        search_range=CFG.search_range,
        use_context_net=True,
        estimator_channels=EST_T,
        context_channels=CTX_T,
        dtype="float32",
    )
    slim = PWCNet(config=slim_cfg)
    x = jnp.zeros((1, 32, 48, 1), jnp.float32)
    flow, _ = slim.apply(_unflat(pruned), x, x)
    assert flow.shape == (1, 32, 48, 2)


def test_prune_checkpoint_roundtrip(tmp_path):
    from moving_object_detector_tpu.utils.checkpoint import (
        load_flow_checkpoint,
        save_flow_params_npz,
    )

    model = PWCNet(config=CFG)
    params = init_pwc_params(model, 32, 48)
    src = tmp_path / "wide.npz"
    save_flow_params_npz(str(src), params)
    data = np.load(src)
    pruned = prune_flow_params({k: data[k] for k in data.files}, EST_T, CTX_T)
    dst = tmp_path / "slim.npz"
    np.savez_compressed(dst, **pruned)

    loaded, cfg = load_flow_checkpoint(str(dst), CFG)
    assert cfg.estimator_channels == EST_T
    assert cfg.context_channels == CTX_T
    slim = PWCNet(config=cfg)
    x = jnp.zeros((1, 32, 48, 1), jnp.float32)
    flow, _ = slim.apply(loaded, x, x)
    assert flow.shape == (1, 32, 48, 2)


def test_prune_zero_channels_is_exact():
    """Zero the channels that pruning will drop; the pruned net must
    compute the SAME function as the zeroed wide net."""
    model = PWCNet(config=CFG)
    params = init_pwc_params(model, 32, 48)
    flat = {k: v.copy() for k, v in _flat(params).items()}

    rng = np.random.default_rng(3)
    for lvl in (0, 1):
        pre = f"params/FlowEstimator_{lvl}/"
        for j, (old, new) in enumerate(zip(CFG.estimator_channels, EST_T)):
            drop = np.sort(
                rng.choice(old, size=old - new, replace=False)
            )
            flat[f"{pre}ConvBlock_{j}/Conv_0/kernel"][..., drop] = 0.0
            flat[f"{pre}ConvBlock_{j}/Conv_0/bias"][drop] = 0.0
    for j, (old, new) in enumerate(zip(CFG.context_channels, CTX_T)):
        drop = np.sort(rng.choice(old, size=old - new, replace=False))
        flat[f"params/ContextNetwork_0/Conv_{j}/kernel"][..., drop] = 0.0
        flat[f"params/ContextNetwork_0/Conv_{j}/bias"][drop] = 0.0

    x1 = jnp.asarray(
        rng.normal(size=(1, 32, 48, 1)).astype(np.float32) * 0.3 + 0.5
    )
    x2 = jnp.asarray(
        rng.normal(size=(1, 32, 48, 1)).astype(np.float32) * 0.3 + 0.5
    )
    wide_flow, _ = model.apply(_unflat(flat), x1, x2)

    pruned = prune_flow_params(flat, EST_T, CTX_T)
    slim_cfg = FlowNetConfig(
        feature_channels=CFG.feature_channels,
        search_range=CFG.search_range,
        use_context_net=True,
        estimator_channels=EST_T,
        context_channels=CTX_T,
        dtype="float32",
    )
    slim_flow, _ = PWCNet(config=slim_cfg).apply(_unflat(pruned), x1, x2)
    np.testing.assert_allclose(
        np.asarray(wide_flow), np.asarray(slim_flow), atol=1e-5, rtol=1e-5
    )


PYR_T = (6, 12, 24, 28)


def test_prune_pyramid_zero_channels_is_exact():
    """Pyramid pruning: zero the to-be-dropped pyramid channels; the
    pruned net must compute the same function as the zeroed wide net.
    This also exercises the correlation mean-divisor compensation (the
    corr planes rescale by c_old/c_new when channels are dropped; the
    pruner folds the inverse into the estimator base-column kernels)."""
    model = PWCNet(config=CFG)
    params = init_pwc_params(model, 32, 48)
    flat = {k: v.copy() for k, v in _flat(params).items()}

    rng = np.random.default_rng(7)
    fp = "params/FeaturePyramid_0/"
    for lvl, (old, new) in enumerate(zip(CFG.feature_channels, PYR_T)):
        for j in (2 * lvl, 2 * lvl + 1):
            drop = np.sort(rng.choice(old, size=old - new, replace=False))
            flat[f"{fp}ConvBlock_{j}/Conv_0/kernel"][..., drop] = 0.0
            flat[f"{fp}ConvBlock_{j}/Conv_0/bias"][drop] = 0.0

    x1 = jnp.asarray(
        rng.normal(size=(1, 32, 48, 1)).astype(np.float32) * 0.3 + 0.5
    )
    x2 = jnp.asarray(
        rng.normal(size=(1, 32, 48, 1)).astype(np.float32) * 0.3 + 0.5
    )
    wide_flow, _ = model.apply(_unflat(flat), x1, x2)

    pruned = prune_flow_params(
        flat, CFG.estimator_channels, None, pyramid_channels=PYR_T
    )
    slim_cfg = FlowNetConfig(
        feature_channels=PYR_T,
        search_range=CFG.search_range,
        use_context_net=True,
        estimator_channels=CFG.estimator_channels,
        context_channels=CFG.context_channels,
        dtype="float32",
    )
    slim_flow, _ = PWCNet(config=slim_cfg).apply(_unflat(pruned), x1, x2)
    np.testing.assert_allclose(
        np.asarray(wide_flow), np.asarray(slim_flow), atol=1e-5, rtol=1e-5
    )


def test_prune_pyramid_then_estimator_roundtrip(tmp_path):
    """Composed pyramid+estimator+context prune loads back through the
    shape-self-describing checkpoint loader with the right config."""
    from moving_object_detector_tpu.utils.checkpoint import (
        load_flow_checkpoint,
        save_flow_params_npz,
    )

    model = PWCNet(config=CFG)
    params = init_pwc_params(model, 32, 48)
    src = tmp_path / "wide.npz"
    save_flow_params_npz(str(src), params)
    data = np.load(src)
    pruned = prune_flow_params(
        {k: data[k] for k in data.files}, EST_T, CTX_T, PYR_T
    )
    dst = tmp_path / "slim.npz"
    np.savez_compressed(dst, **pruned)

    loaded, cfg = load_flow_checkpoint(str(dst), CFG)
    assert cfg.feature_channels == PYR_T
    assert cfg.estimator_channels == EST_T
    assert cfg.context_channels == CTX_T
    assert cfg.search_range == CFG.search_range
    slim = PWCNet(config=cfg)
    x = jnp.zeros((1, 32, 48, 1), jnp.float32)
    flow, _ = slim.apply(loaded, x, x)
    assert flow.shape == (1, 32, 48, 2)
