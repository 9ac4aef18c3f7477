"""SGM v2 fused-kernel parity vs the lax.scan reference (interpret mode on
CPU; the identical kernels run compiled on TPU — verified bitwise-equal
there too)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moving_object_detector_tpu.config import SGMConfig
from moving_object_detector_tpu.ops import sgm
from moving_object_detector_tpu.ops import sgm_pallas2 as v2


def _census_pair(h, w, shift, seed):
    left = jax.random.uniform(jax.random.PRNGKey(seed), (h, w))
    right = jnp.roll(left, -shift, axis=1)
    return sgm.census_transform(left), sgm.census_transform(right)


@pytest.mark.parametrize("h,w,shift", [(30, 150, 5), (64, 300, 11), (100, 257, 2)])
def test_v2_total_matches_xla(h, w, shift):
    """4-path aggregated totals reconstructed from the int8 deltas equal
    the lax.scan reference exactly (integers)."""
    cl, cr = _census_pair(h, w, shift, seed=h)
    tot2 = np.asarray(v2.total_from_parts(cl, cr, 10, 120, interpret=True))
    cost = jnp.transpose(
        sgm.hamming_cost_volume_dhw(cl, cr, 128), (1, 2, 0)
    ).astype(jnp.float32)
    ref = np.asarray(
        sgm.aggregate_cost_volume(cost, SGMConfig(p1=10, p2=120))
    )
    np.testing.assert_array_equal(tot2.astype(np.float32), ref)


@pytest.mark.parametrize("subpixel,lr", [(False, False), (True, False), (True, True)])
def test_v2_disparity_matches_xla(subpixel, lr):
    """Full fused WTA (left argmin, subpixel, systolic right view, ring-
    buffer LR resolve) is bitwise-equal to the reference WTA."""
    h, w = 40, 180
    cl, cr = _census_pair(h, w, 7, seed=3)
    cost = jnp.transpose(
        sgm.hamming_cost_volume_dhw(cl, cr, 128), (1, 2, 0)
    ).astype(jnp.float32)
    cfg = SGMConfig(subpixel=subpixel, lr_check=lr)
    tot = sgm.aggregate_cost_volume(cost, cfg)
    ref = np.asarray(sgm.wta_disparity(tot, cfg))
    out = np.asarray(
        v2.sgm_disparity_v2(
            cl, cr, subpixel=subpixel, lr_check=lr, interpret=True
        )
    )
    np.testing.assert_array_equal(out, ref)


def test_v2_backend_end_to_end():
    """compute_disparity backend='pallas_interpret' (v2) == backend='xla'
    and recovers a known constant disparity."""
    from moving_object_detector_tpu.types import StereoModel

    rng = np.random.default_rng(1)
    h, w, d_true = 32, 160, 6
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
    out_v2 = sgm.compute_disparity(
        jnp.asarray(left), jnp.asarray(right), stereo,
        SGMConfig(max_disparity=128, backend="pallas_interpret"),
    )
    np.testing.assert_array_equal(
        np.asarray(out_v2.disparity), np.asarray(out_xla.disparity)
    )
    disp = np.asarray(out_v2.disparity)
    valid = disp >= 0
    interior = valid[:, d_true + 8: -8]
    assert interior.mean() > 0.8
    med = np.median(disp[:, d_true + 8: -8][interior])
    assert abs(med - d_true) < 0.6
