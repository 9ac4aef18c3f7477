"""TPU-native stereo moving-object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
ActiveIntelligentSystemsLab/moving_object_detector (see SURVEY.md): stereo
disparity (Pallas/XLA SGM), dense optical flow (Flax PWC-Net), stereo
ego-motion (batched Gauss-Newton), per-pixel 3D scene flow, depth-gated
clustering of dynamic pixels into moving objects, and constant-velocity
Kalman tracking — composed as pure functions so a frame runs end-to-end
on-chip under one jit.
"""

import jax as _jax

# This JAX/XLA build runs f32 matmuls at reduced (bf16-class) precision by
# default on both TPU and CPU, which corrupts small geometry/Kalman/GN
# linear algebra (observed 2e-3 error on a 3x3 f32 matmul). Pin f32 matmuls
# to true f32; throughput-critical conv/matmul paths (flow network) opt into
# bfloat16 explicitly via their dtype.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache: OPT-IN via MODT_COMPILE_CACHE=1. Measured
# on the tunneled remote-compile TPU backend it is a net LOSS: reloading
# the cached full-pipeline executable took 555 s where a fresh compile
# took 249 s (the serialized executable is ~150 MB and replays through
# the tunnel). On a directly-attached TPU it should win — hence the knob.
import os as _os

if _os.environ.get("MODT_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", "/tmp/modt_jax_cache"
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .config import (
    DEFAULT_CONFIG,
    ClustererConfig,
    EgoMotionConfig,
    FlowNetConfig,
    PipelineConfig,
    SceneFlowConfig,
    SGMConfig,
    TrackerConfig,
)
from .types import (
    CameraModel,
    DisparityImage,
    MovingObjects,
    SceneFlowCloud,
    StereoModel,
    TrackedObjects,
)

__version__ = "0.1.0"
