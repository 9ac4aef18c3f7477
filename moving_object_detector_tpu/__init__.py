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
