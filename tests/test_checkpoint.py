"""Checkpoint util tests: orbax/npz roundtrips including abstract targets."""

import jax
import jax.numpy as jnp
import numpy as np

from moving_object_detector_tpu.config import FlowNetConfig
from moving_object_detector_tpu.models.pwc_net import (
    PWCNet,
    init_pwc_params,
    init_pwc_params_abstract,
)
from moving_object_detector_tpu.utils.checkpoint import (
    restore_flow_params,
    save_flow_params,
)

CFG = FlowNetConfig(
    feature_channels=(8, 16, 32), search_range=2,
    use_context_net=False, dtype="float32",
)


def _params():
    model = PWCNet(config=CFG)
    return model, init_pwc_params(model, 32, 64, jax.random.PRNGKey(0))


def _assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_orbax_roundtrip_with_abstract_like(tmp_path):
    """Restoring an orbax checkpoint against an ABSTRACT params tree
    (init_pwc_params_abstract — ShapeDtypeStruct leaves) must work: this is
    the cheap-startup path bench.py/run.py use. A regression here
    previously raised tensorstore 'Unsupported data type: object'."""
    model, params = _params()
    path = str(tmp_path / "ckpt")
    save_flow_params(path, jax.device_get(params))
    like = init_pwc_params_abstract(model)
    restored = restore_flow_params(path, like=like)
    _assert_trees_equal(params, restored)


def test_npz_roundtrip_fp16(tmp_path):
    model, params = _params()
    path = str(tmp_path / "w.npz")
    save_flow_params(path, jax.device_get(params))
    restored = restore_flow_params(
        path, like=init_pwc_params_abstract(model)
    )
    fa = jax.tree_util.tree_leaves(params)
    fb = jax.tree_util.tree_leaves(restored)
    for x, y in zip(fa, fb):
        assert np.asarray(y).dtype == np.asarray(x).dtype
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-3, rtol=2e-3
        )


def test_load_flow_checkpoint_infers_architecture(tmp_path):
    """Checkpoints are shape-self-describing: load_flow_checkpoint recovers
    the decoder widths / pyramid / search_range from kernel shapes, so
    slim/wide variants serve with zero width flags (the prototxt-travels-
    with-caffemodel property of the reference's flow net)."""
    import dataclasses

    from moving_object_detector_tpu.utils.checkpoint import (
        load_flow_checkpoint,
    )

    slim = FlowNetConfig(
        feature_channels=(8, 16, 32, 48),
        estimator_channels=(48, 32, 16),
        context_channels=(32, 24, 16),
        search_range=3,
        pyramid_levels=4,
        dtype="float32",
    )
    model = PWCNet(config=slim)
    params = init_pwc_params(model, 32, 64)

    for name in ("w.npz", "orbax_dir"):
        path = str(tmp_path / name)
        save_flow_params(path, params)
        restored, cfg = load_flow_checkpoint(path, base_config=slim)
        assert cfg == slim, cfg
        # Non-architecture fields come from base, architecture from shapes.
        base = dataclasses.replace(
            FlowNetConfig(), dtype="float32", corr_backend="xla"
        )
        _, cfg2 = load_flow_checkpoint(path, base_config=base)
        assert cfg2.estimator_channels == slim.estimator_channels
        assert cfg2.feature_channels == slim.feature_channels
        assert cfg2.context_channels == slim.context_channels
        assert cfg2.search_range == 3 and cfg2.pyramid_levels == 4
        assert cfg2.corr_backend == "xla"
        # The restored tree drives a forward pass at the inferred config.
        img = jnp.zeros((1, 32, 64, 1), jnp.float32)
        full, _ = PWCNet(config=cfg2).apply(restored, img, img)
        assert full.shape == (1, 32, 64, 2)


def test_bundled_pwc_p3_loads_and_is_gated():
    """The round-5 speed-option weights: shape-self-describing load
    (64-width est/ctx), scale-2 allowlist membership, and NOT the
    default (v6m3 stays the quality default)."""
    import os

    from moving_object_detector_tpu.config import PipelineConfig
    from moving_object_detector_tpu.utils.checkpoint import (
        default_flow_checkpoint,
        flow_checkpoint_scale2_gated,
        load_flow_checkpoint,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p3 = os.path.join(root, "weights", "pwc_p3.fp16.npz")
    if not os.path.exists(p3):
        import pytest

        pytest.skip("pwc_p3 weights not bundled")
    params, cfg = load_flow_checkpoint(p3, PipelineConfig().flownet)
    assert cfg.estimator_channels == (64, 64, 48, 32, 16)
    assert cfg.context_channels == (64, 64, 64, 48, 32, 16)
    assert cfg.occlusion_cue is False
    assert flow_checkpoint_scale2_gated(p3)
    default = default_flow_checkpoint()
    assert default is not None and os.path.basename(default) != os.path.basename(p3)
