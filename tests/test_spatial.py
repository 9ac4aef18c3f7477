"""Spatial (row-stripe) sharding: sharded perception must reproduce the
single-device result away from stripe seams (parallel/spatial.py contract).

Runs on the virtual 8-device CPU mesh (conftest bootstrap)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moving_object_detector_tpu.config import FlowNetConfig, SGMConfig
from moving_object_detector_tpu.ops.sgm import sgm_disparity_raw
from moving_object_detector_tpu.parallel.mesh import create_mesh
from moving_object_detector_tpu.parallel.spatial import (
    compute_disparity_spatial,
    flow_forward_spatial,
)
from moving_object_detector_tpu.types import StereoModel


def _stereo_pair(h, w, d_true, key):
    """Textured scene where the right view is the left shifted by d_true."""
    img = jax.random.uniform(key, (h, w), jnp.float32)
    # smooth a little so census windows carry structure
    k = jnp.ones((3, 3), jnp.float32) / 9.0
    img = jax.scipy.signal.convolve2d(img, k, mode="same")
    left = img
    right = jnp.roll(img, -d_true, axis=1)
    return left, right


def test_sgm_spatial_matches_single_device():
    h, w, d_true = 64, 160, 7
    left, right = _stereo_pair(h, w, d_true, jax.random.PRNGKey(0))
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)

    mesh = create_mesh(8, model_parallel=4)  # 4-way row sharding
    ref = sgm_disparity_raw(left, right, cfg)
    out = compute_disparity_spatial(
        left, right, stereo, cfg, mesh, axis="model", halo=12
    ).disparity

    ref_np = np.asarray(ref)
    out_np = np.asarray(out)
    both_valid = (ref_np >= 0) & (out_np >= 0)
    # Valid/invalid status identical for almost all pixels.
    assert (ref_np >= 0).mean() > 0.5  # scene actually matches
    status_agree = ((ref_np >= 0) == (out_np >= 0)).mean()
    assert status_agree > 0.97, status_agree
    # Where both valid, disparities agree to <= 1 px nearly everywhere and
    # exactly on the vast majority.
    diff = np.abs(ref_np - out_np)[both_valid]
    assert (diff <= 1.0).mean() > 0.98, (diff <= 1.0).mean()
    assert (diff == 0.0).mean() > 0.90, (diff == 0.0).mean()


def test_sgm_spatial_recovers_true_disparity():
    h, w, d_true = 64, 160, 5
    left, right = _stereo_pair(h, w, d_true, jax.random.PRNGKey(2))
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    mesh = create_mesh(8, model_parallel=2)
    out = np.asarray(
        compute_disparity_spatial(
            left, right, stereo, cfg, mesh, halo=16
        ).disparity
    )
    valid = out[:, d_true + 2 :][out[:, d_true + 2 :] >= 0]
    assert valid.size > 0.5 * h * w
    assert np.median(np.abs(valid - d_true)) < 0.51


def test_flow_spatial_matches_single_device():
    h, w = 128, 96
    cfg = FlowNetConfig(
        feature_channels=(8, 16, 32), search_range=2,
        use_context_net=False, dtype="float32",
    )
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )
    from moving_object_detector_tpu.pipeline import _flow_forward

    model = PWCNet(config=cfg)
    params = init_pwc_params(model, h, w, jax.random.PRNGKey(0))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (h, w), jnp.float32)
    img2 = jnp.roll(img1, -2, axis=1)

    ref = np.asarray(_flow_forward(params, model, img1, img2))
    mesh = create_mesh(8, model_parallel=4)
    out = np.asarray(
        flow_forward_spatial(params, model, img1, img2, mesh, halo=32)
    )
    assert out.shape == ref.shape
    # Interior (away from seams + image border by a pyramid stride) agrees.
    err = np.abs(out - ref)
    assert np.median(err) < 0.05, np.median(err)
    assert np.mean(err < 0.25) > 0.9, np.mean(err < 0.25)


def test_sgm_spatial_halo_bounds_checked():
    h, w = 64, 160
    left = jnp.zeros((h, w), jnp.float32)
    cfg = SGMConfig(max_disparity=32, backend="xla")
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    mesh = create_mesh(8, model_parallel=8)
    with pytest.raises(AssertionError):
        compute_disparity_spatial(left, left, stereo, cfg, mesh, halo=16)
