"""Typed array "message" contracts.

These are the TPU-native equivalents of the reference's wire formats
(SURVEY.md §2.1 #6-7): ROS ``stereo_msgs/DisparityImage``,
``pcl::PointXYZVelocity`` organized clouds (pcl_point_xyz_velocity.h:8-34),
``moving_object_msgs/MovingObject{Array}`` (MovingObject.msg:1-7) and
``TrackerCovariance`` (TrackerCovariance.msg:1-4) — re-expressed as
struct-of-array pytrees with fixed capacities and explicit validity masks so
every stage composes under ``jax.jit``.

Invalid entries follow the reference's NaN convention in the dense image-like
products (scene-flow cloud), and boolean masks in the fixed-capacity object
lists (the jit-friendly replacement for variable-length vectors).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CameraModel:
    """Pinhole intrinsics of a rectified camera.

    Mirrors image_geometry::PinholeCameraModel as consumed by the reference
    (disparity_image_processor.cpp:45, scene_flow_constructor.cpp:84).
    Scalars are 0-d f32 arrays so the model is a pytree leaf bundle.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def create(cls, fx, fy, cx, cy) -> "CameraModel":
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(fx=f32(fx), fy=f32(fy), cx=f32(cx), cy=f32(cy))


@struct.dataclass
class StereoModel:
    """Rectified stereo rig: left intrinsics + baseline (meters).

    Mirrors image_geometry::StereoCameraModel usage at
    scene_flow_constructor.cpp:309-314.

    ``base_from_camera`` is the static base_link<-camera extrinsic the
    reference obtains from the TF tree (robot_state_publisher URDF,
    detect_with_zed.launch:36-54) and folds into the integrated odometry
    at scene_flow_constructor.cpp:320-349; identity means the camera IS
    the robot base (the reference's fallback when the lookup fails,
    :333-342).
    """

    cam: CameraModel
    baseline: jnp.ndarray
    base_from_camera: jnp.ndarray  # (4, 4) base_link <- camera

    @classmethod
    def create(
        cls, fx, fy, cx, cy, baseline, base_from_camera=None
    ) -> "StereoModel":
        if base_from_camera is None:
            base_from_camera = jnp.eye(4, dtype=jnp.float32)
        return cls(
            cam=CameraModel.create(fx, fy, cx, cy),
            baseline=jnp.asarray(baseline, jnp.float32),
            base_from_camera=jnp.asarray(base_from_camera, jnp.float32),
        )


@struct.dataclass
class DisparityImage:
    """Dense disparity with the metadata the reference's DisparityImage
    carries (focal length ``f``, baseline ``t``, validity range), consumed at
    disparity_image_processor.cpp:25-27,41-42.

    ``disparity``: (H, W) f32, raw values (may include invalid codes).
    """

    disparity: jnp.ndarray  # (H, W) f32
    f: jnp.ndarray  # focal length used by the matcher
    t: jnp.ndarray  # baseline [m]
    min_disparity: jnp.ndarray
    max_disparity: jnp.ndarray

    @classmethod
    def create(cls, disparity, f, t, min_disparity=0.0, max_disparity=128.0):
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return cls(
            disparity=jnp.asarray(disparity, jnp.float32),
            f=f32(f),
            t=f32(t),
            min_disparity=f32(min_disparity),
            max_disparity=f32(max_disparity),
        )

    def valid_mask(self) -> jnp.ndarray:
        """Validity per the reference's getDisparity gate
        (disparity_image_processor.cpp:17-31): finite and within
        [min_disparity, max_disparity]."""
        d = self.disparity
        return (
            jnp.isfinite(d) & (d >= self.min_disparity) & (d <= self.max_disparity)
        )


@struct.dataclass
class SceneFlowCloud:
    """Organized per-pixel 3D position + velocity cloud.

    The TPU equivalent of the reference's
    ``pcl::PointCloud<pcl::PointXYZVelocity>`` published on ``~scene_flow``
    (pcl_point_xyz_velocity.h:8-34, scene_flow_constructor.cpp:141-142).
    NaN marks invalid, matching initializeVelocityPC
    (scene_flow_constructor.cpp:293-303).
    """

    points: jnp.ndarray  # (H, W, 3) f32, NaN = invalid
    velocity: jnp.ndarray  # (H, W, 3) f32, NaN = invalid


@struct.dataclass
class MovingObjects:
    """Fixed-capacity MovingObjectArray (MovingObject.msg:1-7).

    ``valid`` replaces variable length; invalid rows carry zeros.
    ``label_image`` is the per-pixel compact cluster id (-1 = background), the
    analog of the clusterer's ``~clusters_image`` debug product
    (clusterer_nodelet.cpp:292-322).
    """

    id: jnp.ndarray  # (K,) int32
    center: jnp.ndarray  # (K, 3) f32
    velocity: jnp.ndarray  # (K, 3) f32
    bounding_box: jnp.ndarray  # (K, 3) f32
    valid: jnp.ndarray  # (K,) bool

    @classmethod
    def empty(cls, capacity: int) -> "MovingObjects":
        return cls(
            id=jnp.full((capacity,), -1, jnp.int32),
            center=jnp.zeros((capacity, 3), jnp.float32),
            velocity=jnp.zeros((capacity, 3), jnp.float32),
            bounding_box=jnp.zeros((capacity, 3), jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    @property
    def capacity(self) -> int:
        return self.id.shape[0]


@struct.dataclass
class TrackedObjects:
    """Published track outputs: MovingObjects plus per-track 4x4 covariance,
    mirroring ``~tracked_moving_objects`` + ``~trackers_covariance``
    (moving_objects_tracker.cpp:81-133, TrackerCovariance.msg:1-4)."""

    objects: MovingObjects
    covariance: jnp.ndarray  # (K, 4, 4) f32 of the published tracks
