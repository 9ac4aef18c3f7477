"""Image-space preprocessing: center crop with intrinsics fix-up.

The image_crop package equivalent (SURVEY.md §2.1 #8;
image_crop/src/image_crop.cpp:20-43): crop a camera stream to a target
size around the image center and shift the principal point accordingly, so
downstream geometry stays consistent. The reference uses this to cut ZED
720p to the KITTI-like 1242x376 working resolution
(detect_with_zed.launch:4-5,10-14).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..types import CameraModel, StereoModel


def center_crop_offsets(height: int, width: int, target_h: int, target_w: int):
    """Top-left corner of the centered crop (the reference centers the crop
    and floors the offset)."""
    assert target_h <= height and target_w <= width
    y0 = (height - target_h) // 2
    x0 = (width - target_w) // 2
    return y0, x0


def center_crop(
    image: jnp.ndarray, cam: CameraModel, target_h: int, target_w: int
):
    """Crop (H, W[, C]) to (target_h, target_w) about the center; returns the
    cropped image and intrinsics with cx, cy shifted by the crop offset
    (image_crop.cpp:30-38 semantics: K and P principal points move by
    -x0/-y0; focal lengths unchanged)."""
    h, w = image.shape[:2]
    y0, x0 = center_crop_offsets(h, w, target_h, target_w)
    cropped = image[y0 : y0 + target_h, x0 : x0 + target_w]
    new_cam = CameraModel(
        fx=cam.fx, fy=cam.fy, cx=cam.cx - x0, cy=cam.cy - y0
    )
    return cropped, new_cam


def center_crop_stereo(
    left: jnp.ndarray,
    right: jnp.ndarray,
    stereo: StereoModel,
    target_h: int,
    target_w: int,
):
    """Crop both images of a rectified pair identically (same offsets keep
    the epipolar alignment and disparity values unchanged)."""
    left_c, cam_c = center_crop(left, stereo.cam, target_h, target_w)
    h, w = right.shape[:2]
    y0, x0 = center_crop_offsets(h, w, target_h, target_w)
    right_c = right[y0 : y0 + target_h, x0 : x0 + target_w]
    return left_c, right_c, StereoModel(
        cam=cam_c,
        baseline=stereo.baseline,
        base_from_camera=stereo.base_from_camera,
    )
