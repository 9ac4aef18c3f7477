"""Pallas correlation kernel vs the XLA reference (interpret mode on CPU).

Oracle: ops/flow_ops.py ``correlation`` — the portable shift-and-reduce
form whose semantics mirror the reference's Caffe correlation layer
(SURVEY.md §2.3 pwc_net_ros)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moving_object_detector_tpu.ops.flow_corr_pallas import correlation_pallas
from moving_object_detector_tpu.ops.flow_ops import correlation


@pytest.mark.parametrize(
    "b,h,w,c,r",
    [
        (1, 24, 40, 16, 4),
        (2, 16, 33, 8, 2),  # odd width, batch
        (1, 12, 130, 32, 4),  # width > one lane tile
        (1, 9, 20, 5, 3),  # h not a multiple of the block
    ],
)
def test_correlation_matches_xla(b, h, w, c, r):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    f1 = jax.random.normal(k1, (b, h, w, c), jnp.float32)
    f2 = jax.random.normal(k2, (b, h, w, c), jnp.float32)
    ref = correlation(f1, f2, r)
    out = correlation_pallas(f1, f2, r, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_correlation_zero_outside_image():
    """Offsets that reach past the image border must contribute zeros, not
    wrapped or padded garbage."""
    b, h, w, c, r = 1, 8, 16, 4, 4
    f1 = jnp.ones((b, h, w, c), jnp.float32)
    f2 = jnp.ones((b, h, w, c), jnp.float32)
    out = correlation_pallas(f1, f2, r, interpret=True)
    ref = correlation(f1, f2, r)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # Corner pixel with the extreme negative offset sees only out-of-image
    # samples -> exactly 0.
    assert float(out[0, 0, 0, 0]) == 0.0


def test_correlation_grad_matches_xla():
    b, h, w, c, r = 1, 16, 24, 8, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    f1 = jax.random.normal(k1, (b, h, w, c), jnp.float32)
    f2 = jax.random.normal(k2, (b, h, w, c), jnp.float32)

    def loss_p(a, b_):
        return jnp.sum(correlation_pallas(a, b_, r, True) ** 2)

    def loss_x(a, b_):
        return jnp.sum(correlation(a, b_, r) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_model_dispatch_pallas_interpret():
    """PWCNet with corr_backend='pallas_interpret' matches the XLA backend."""
    from moving_object_detector_tpu.config import FlowNetConfig
    from moving_object_detector_tpu.models.pwc_net import (
        PWCNet, init_pwc_params,
    )

    base = dict(feature_channels=(8, 16, 32), search_range=2,
                use_context_net=False, dtype="float32")
    m_x = PWCNet(config=FlowNetConfig(corr_backend="xla", **base))
    m_p = PWCNet(config=FlowNetConfig(corr_backend="pallas_interpret", **base))
    h, w = 32, 48
    params = init_pwc_params(m_x, h, w, jax.random.PRNGKey(0))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 1))
    img2 = jax.random.uniform(jax.random.PRNGKey(2), (1, h, w, 1))
    fx, _ = m_x.apply(params, img1, img2)
    fp, _ = m_p.apply(params, img1, img2)
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fx), atol=1e-4)
