"""Multi-host (jax.distributed) smoke: two real processes, each owning 2
virtual CPU devices, form one 4-device global mesh; host-local camera
batches become a global P('data') array; a jitted global reduction crosses
the process boundary (the DCN-collective path) and both hosts agree.

This is the TPU-native replacement for the reference's docker-compose
multi-container topology (SURVEY.md §2.4) — validated with actual separate
processes, not a simulated flag.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

proc_id = int(sys.argv[1])
port = sys.argv[2]

from moving_object_detector_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=proc_id,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

mesh = multihost.global_stream_mesh(model_parallel=2)
assert mesh.shape == {"data": 2, "model": 2}, mesh.shape

# Each "host" contributes one camera stream of known content.
local = {"left": np.full((1, 4, 6), float(proc_id + 1), np.float32)}
g = multihost.distribute_streams(mesh, local)
assert g["left"].shape == (2, 4, 6)

@jax.jit
def global_sum(x):
    return jnp.sum(x)

# Crosses the process boundary: stream 0 lives on host 0, stream 1 on
# host 1; the sum must see both (1*24 + 2*24).
total = float(global_sum(g["left"]))
assert abs(total - 72.0) < 1e-6, total

back = multihost.host_local_results({"left": g["left"]})
np.testing.assert_array_equal(back["left"], local["left"])

# The FULL detection pipeline over the global mesh: one camera stream per
# host, data-sharded — each host computes only its own stream.
from moving_object_detector_tpu.config import (
    ClustererConfig, EgoMotionConfig, FlowNetConfig, PipelineConfig,
    SGMConfig, TrackerConfig,
)
from moving_object_detector_tpu.models.pwc_net import PWCNet, init_pwc_params
from moving_object_detector_tpu.parallel.streams import (
    create_stream_states, detect_step_batched,
)
from moving_object_detector_tpu.types import StereoModel

h, w = 32, 64
config = PipelineConfig(
    height=h, width=w,
    clusterer=ClustererConfig(cluster_size=20, max_objects=2,
                              neighbor_distance=2),
    tracker=TrackerConfig(max_tracks=4),
    sgm=SGMConfig(max_disparity=8, backend="xla"),
    egomotion=EgoMotionConfig(max_features=64, nms_radius=2,
                              ransac_hypotheses=8, lk_pyramid_levels=1,
                              min_inliers=4),
    flownet=FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                          use_context_net=False, dtype="float32"),
)
stereo = StereoModel.create(fx=50.0, fy=50.0, cx=w / 2, cy=h / 2,
                            baseline=0.5)
model = PWCNet(config=config.flownet)
params = init_pwc_params(model, h, w)
states = create_stream_states(config, 2)

rng = np.random.default_rng(proc_id)
lefts_local = rng.uniform(0, 1, (1, h, w)).astype(np.float32)
rights_local = np.roll(lefts_local, -4, axis=2)
gb = multihost.distribute_streams(
    mesh, {"l": lefts_local, "r": rights_local}
)
ts = jnp.full((2,), 0.1, jnp.float32)
with mesh:
    states, out = detect_step_batched(
        params, states, gb["l"], gb["r"], ts, stereo, config,
        flow_model=model,
    )
    disp = multihost.host_local_results(out.disparity.disparity)
assert disp.shape == (1, h, w), disp.shape
assert np.isfinite(disp).all()

print(f"worker {proc_id} ok {total}", flush=True)
"""


def test_two_process_distributed_cpu(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=os.getcwd(),
        MODT_TESTS_REEXECED="1",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok 72.0" in out, out
