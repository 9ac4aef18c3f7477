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
