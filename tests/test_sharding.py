"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4): mesh construction, tensor-parallel param placement, the
sharded flow-net training step, and batched data-parallel pipeline steps."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from moving_object_detector_tpu.config import FlowNetConfig
from moving_object_detector_tpu.models.pwc_net import PWCNet
from moving_object_detector_tpu.parallel.mesh import (
    create_mesh,
    flow_param_sharding,
    shard_batch,
)
from moving_object_detector_tpu.train.flow_trainer import (
    create_train_state,
    make_sharded_train_step,
    synthetic_flow_batch,
)

SMALL = FlowNetConfig(
    feature_channels=(8, 16, 32), search_range=2,
    use_context_net=False, dtype="float32",
)


def test_eight_virtual_devices_present():
    assert jax.device_count() >= 8


def test_mesh_shapes():
    mesh = create_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_sharding_rules():
    mesh = create_mesh(8, model_parallel=2)
    model = PWCNet(config=SMALL)
    state, _ = create_train_state(model, 32, 64)
    shardings = flow_param_sharding(mesh, state.params)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    sharded = [
        s for p, s in leaves if s.spec and s.spec[-1] == "model"
    ]
    # Most conv kernels/biases should be channel-sharded.
    assert len(sharded) > len(leaves) // 2


def test_sharded_train_step_runs_and_matches_single_device():
    mesh = create_mesh(8, model_parallel=2)
    model = PWCNet(config=SMALL)
    state, tx = create_train_state(model, 32, 64)
    rng = np.random.default_rng(0)
    batch = synthetic_flow_batch(rng, 8, 32, 64)

    # Single-device reference step.
    from moving_object_detector_tpu.train.flow_trainer import train_step

    ref_state, ref_metrics = train_step(model, tx, state, batch)

    step, sharded_state = make_sharded_train_step(model, tx, mesh, state)
    with mesh:
        new_state, metrics = step(sharded_state, batch)
        jax.block_until_ready(new_state.params)

    assert int(new_state.step) == 1
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-3
    )
    # A couple of parameter leaves agree with the unsharded step.
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    new_leaves = jax.tree_util.tree_leaves(new_state.params)
    for a, b in list(zip(ref_leaves, new_leaves))[:5]:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )


def test_data_parallel_pipeline_vmap():
    """Batched camera streams: vmap the fused frame step over a stream axis
    and shard it across the 'data' mesh axis (BASELINE.json configs[4])."""
    from moving_object_detector_tpu.config import (
        ClustererConfig,
        EgoMotionConfig,
        PipelineConfig,
        SGMConfig,
        TrackerConfig,
    )
    from moving_object_detector_tpu.pipeline import PipelineState, detect_step
    from moving_object_detector_tpu.types import StereoModel

    h, w = 32, 64
    config = PipelineConfig(
        height=h,
        width=w,
        clusterer=ClustererConfig(cluster_size=20, max_objects=2,
                                  neighbor_distance=2),
        tracker=TrackerConfig(max_tracks=4),
        sgm=SGMConfig(max_disparity=8),
        egomotion=EgoMotionConfig(
            max_features=32, ransac_hypotheses=4, lk_pyramid_levels=1,
            min_inliers=4,
        ),
    )
    stereo = StereoModel.create(fx=50.0, fy=50.0, cx=w / 2, cy=h / 2,
                                baseline=0.5)

    n_streams = 8
    mesh = create_mesh(8, model_parallel=1)

    def one_stream(state, left, right, t, flow):
        return detect_step(
            None, state, left, right, t, stereo, config,
            flow_override=flow,
        )

    batched = jax.vmap(one_stream)

    rng = np.random.default_rng(0)
    states = jax.vmap(lambda _: PipelineState.create(config))(
        jnp.arange(n_streams)
    )
    left = jnp.asarray(rng.uniform(0, 1, (n_streams, h, w)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 1, (n_streams, h, w)).astype(np.float32))
    t = jnp.zeros((n_streams,), jnp.float32)
    flow = jnp.zeros((n_streams, h, w, 2), jnp.float32)

    sharding = NamedSharding(mesh, P("data"))
    left = jax.device_put(left, sharding)
    right = jax.device_put(right, sharding)

    with mesh:
        states2, outs = jax.jit(batched)(states, left, right, t, flow)
        jax.block_until_ready(outs.disparity.disparity)
    assert outs.disparity.disparity.shape == (n_streams, h, w)
    assert bool(jnp.all(states2.frame_index == 1))
