"""Pallas SGM aggregation parity vs the lax.scan reference (interpreter mode
on CPU; the real kernels run on TPU with identical code)."""

import numpy as np
import jax.numpy as jnp
import pytest

from moving_object_detector_tpu.config import SGMConfig
from moving_object_detector_tpu.ops import sgm
from moving_object_detector_tpu.ops.sgm_pallas import (
    aggregate_cost_volume_pallas,
)


@pytest.mark.parametrize("h,w", [(16, 64), (8, 32), (16, 50)])
def test_pallas_aggregation_matches_xla(h, w):
    rng = np.random.default_rng(0)
    d = 128
    cost = rng.integers(0, 25, (h, w, d)).astype(np.float32)
    cfg = SGMConfig(max_disparity=d)
    ref = np.asarray(sgm.aggregate_cost_volume(jnp.asarray(cost), cfg))
    out = np.asarray(
        aggregate_cost_volume_pallas(
            jnp.asarray(cost), p1=cfg.p1, p2=cfg.p2, interpret=True
        )
    )
    np.testing.assert_array_equal(out, ref)


def test_pallas_backend_end_to_end():
    """compute_disparity with the interpreted Pallas backend reproduces the
    XLA backend's disparities on a synthetic constant-disparity scene."""
    from moving_object_detector_tpu.types import StereoModel

    rng = np.random.default_rng(1)
    h, w, d_true = 16, 96, 5
    left = rng.uniform(0, 1, (h, w)).astype(np.float32)
    right = np.zeros_like(left)
    right[:, :-d_true] = left[:, d_true:]
    right[:, -d_true:] = left[:, -d_true:]
    stereo = StereoModel.create(fx=100.0, fy=100.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)
    out_xla = sgm.compute_disparity(
        jnp.asarray(left), jnp.asarray(right), stereo,
        SGMConfig(max_disparity=128, backend="xla"),
    )
    out_pl = sgm.compute_disparity(
        jnp.asarray(left), jnp.asarray(right), stereo,
        SGMConfig(max_disparity=128, backend="pallas_v1_interpret"),
    )
    np.testing.assert_allclose(
        np.asarray(out_pl.disparity), np.asarray(out_xla.disparity), atol=1e-4
    )


def test_census_cost_kernel_matches_xla():
    """Fused census+cost kernel (interpret) == XLA census + cost volume on
    the real image region."""
    from moving_object_detector_tpu.ops.sgm_pallas import (
        census_cost_volume_pallas,
    )

    rng = np.random.default_rng(3)
    h, w, d = 16, 96, 128
    left = rng.uniform(0, 1, (h, w)).astype(np.float32)
    right = rng.uniform(0, 1, (h, w)).astype(np.float32)
    vol = np.asarray(
        census_cost_volume_pallas(
            jnp.asarray(left), jnp.asarray(right), d, (5, 5), interpret=True
        )
    )
    cl = sgm.census_transform(jnp.asarray(left), (5, 5))
    cr = sgm.census_transform(jnp.asarray(right), (5, 5))
    ref = np.asarray(sgm.hamming_cost_volume_dhw(cl, cr, d))
    np.testing.assert_array_equal(vol[:, :h, :w], ref)
