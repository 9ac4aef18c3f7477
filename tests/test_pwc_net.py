"""Flow network structure tests: shapes, warp/correlation semantics, and a
tiny overfit run proving the net can learn a constant flow."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from moving_object_detector_tpu.config import FlowNetConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params
from moving_object_detector_tpu.ops import flow_ops

SMALL = FlowNetConfig(
    feature_channels=(8, 16, 32),
    search_range=2,
    use_context_net=False,
    dtype="float32",
)


def test_warp_identity():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(1, 8, 12, 3)).astype(np.float32))
    out = flow_ops.warp(f, jnp.zeros((1, 8, 12, 2), jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-6)


def test_warp_integer_shift():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(1, 8, 12, 2)).astype(np.float32))
    flow = jnp.full((1, 8, 12, 2), 0.0, jnp.float32).at[..., 0].set(3.0)
    out = np.asarray(flow_ops.warp(f, flow))
    # out(x) = f(x + 3) horizontally; the last 3 columns sample out of
    # bounds -> 0.
    np.testing.assert_allclose(out[0, :, :9], np.asarray(f)[0, :, 3:], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 9:], 0.0, atol=1e-6)


def test_correlation_peak_at_true_offset():
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.normal(size=(1, 16, 20, 64)).astype(np.float32))
    # f2 shifted so that f2(x + (2, 1)) == f1(x).
    f2 = jnp.roll(jnp.roll(f1, 2, axis=2), 1, axis=1)
    corr = np.asarray(flow_ops.correlation(f1, f2, search_range=3))
    # Window offsets enumerate dy in [-3..3] x dx in [-3..3]; the peak
    # should be at (dy, dx) = (1, 2) -> index (1+3)*7 + (2+3) = 33.
    inner = corr[0, 4:-4, 4:-4, :]
    peak = inner.argmax(-1)
    assert (peak == 33).mean() > 0.9


def test_pwc_output_shapes():
    model = PWCNet(config=SMALL)
    params = init_pwc_params(model, 32, 48)
    x1 = jnp.zeros((2, 32, 48, 1), jnp.float32)
    x2 = jnp.zeros((2, 32, 48, 1), jnp.float32)
    full, levels = model.apply(params, x1, x2)
    assert full.shape == (2, 32, 48, 2)
    assert all(l.ndim == 4 and l.shape[-1] == 2 for l in levels)


def test_pwc_learns_constant_shift():
    """Overfit on one pair with a known 2-px shift: EPE should drop well
    below the initial error, proving gradients flow through warp +
    correlation + estimator."""
    rng = np.random.default_rng(2)
    base = np.kron(
        rng.uniform(0, 1, (8, 12)).astype(np.float32), np.ones((4, 4), np.float32)
    )
    img1 = jnp.asarray(base)[None, :, :, None]
    img2 = jnp.asarray(np.roll(base, -2, axis=1))[None, :, :, None]
    true_flow = jnp.full((1, 32, 48, 2), 0.0).at[..., 0].set(2.0)

    model = PWCNet(config=SMALL)
    params = init_pwc_params(model, 32, 48, jax.random.PRNGKey(3))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        pred, _ = model.apply(p, img1, img2)
        return jnp.mean(jnp.sum((pred - true_flow) ** 2, axis=-1))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    losses = []
    for i in range(60):
        params, opt_state, l = step(params, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.5


def test_warp_two_pass_exact_for_row_constant_flow():
    import jax
    from moving_object_detector_tpu.ops.flow_ops import warp, warp_two_pass

    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 14, 23, 6))
    # Flow varying down the image but constant along rows: two-pass is exact.
    rows = jnp.linspace(-3.0, 3.0, 14)[None, :, None]
    flow = jnp.stack(
        [jnp.broadcast_to(rows * 0.7, (2, 14, 23)),
         jnp.broadcast_to(rows, (2, 14, 23))], axis=-1
    )
    ref = warp(feats, flow)
    out = warp_two_pass(feats, flow, 8, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_two_pass_close_for_smooth_flow():
    import jax
    from moving_object_detector_tpu.ops.flow_ops import warp, warp_two_pass

    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    feats = jax.random.normal(k1, (1, 16, 32, 4))
    # Smooth low-frequency flow field (like upsampled inter-level flow).
    coarse = 3.0 * jax.random.normal(k2, (1, 2, 4, 2))
    import jax.image
    flow = jax.image.resize(coarse, (1, 16, 32, 2), "bilinear")
    ref = np.asarray(warp(feats, flow))
    out = np.asarray(warp_two_pass(feats, flow, 8, 8))
    # Approximation: most pixels close; error concentrated where both
    # |u| and dv/dx are large (white-noise features are the worst case —
    # real conv features are spatially correlated).
    assert np.median(np.abs(out - ref)) < 0.1
    assert np.mean(np.abs(out - ref) < 0.3) > 0.75


def test_warp_two_pass_grad_flows():
    import jax
    from moving_object_detector_tpu.ops.flow_ops import warp_two_pass

    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 12, 3))
    flow = jnp.full((1, 8, 12, 2), 0.3)
    g = jax.grad(
        lambda fl: jnp.sum(warp_two_pass(feats, fl, 4, 4) ** 2)
    )(flow)
    assert bool(jnp.any(jnp.abs(g) > 0))


def test_context_dilation_space_to_batch_equivalent():
    """space_to_batch lowering of the dilated context convs is exact (same
    params, same function) vs the direct lowering, incl. non-divisible
    spatial sizes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from moving_object_detector_tpu.models.pwc_net import ContextNetwork

    key = jax.random.PRNGKey(0)
    h, w = 37, 83  # not divisible by the 2/4/8/16 dilations
    feats = jax.random.uniform(key, (1, h, w, 40), jnp.float32)
    flow = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 2),
                              jnp.float32)
    direct = ContextNetwork(dtype=jnp.float32, dilation_impl="direct")
    s2b = ContextNetwork(dtype=jnp.float32,
                         dilation_impl="space_to_batch")
    params = direct.init(key, feats, flow)
    out_d = np.asarray(direct.apply(params, feats, flow))
    out_s = np.asarray(s2b.apply(params, feats, flow))
    np.testing.assert_allclose(out_s, out_d, rtol=2e-5, atol=2e-5)


def test_decoder_width_knobs():
    """estimator_channels / context_channels shrink the decoder params
    without changing output shapes; defaults stay checkpoint-compatible
    (the bundled-npz restore is exercised by test_flow_quality).

    Everything here is a static property, so the whole test runs abstractly
    (eval_shape): no init compute, no forward compute."""
    import dataclasses

    from moving_object_detector_tpu.models.pwc_net import (
        init_pwc_params_abstract,
    )

    wide = FlowNetConfig(
        feature_channels=(8, 16, 32),
        search_range=2,
        use_context_net=True,
        dtype="float32",
    )
    slim = dataclasses.replace(
        wide, estimator_channels=(32, 24, 16), context_channels=(32, 32, 16)
    )
    n_params = {}
    for name, cfg in (("slim", slim), ("wide", wide)):
        model = PWCNet(config=cfg)
        params = init_pwc_params_abstract(model)
        x = jax.ShapeDtypeStruct((1, 32, 48, 1), jnp.float32)
        full, _ = jax.eval_shape(model.apply, params, x, x)
        assert full.shape == (1, 32, 48, 2)
        n_params[name] = sum(
            int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
        )
    assert n_params["slim"] < 0.5 * n_params["wide"], n_params
