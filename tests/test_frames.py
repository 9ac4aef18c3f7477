"""FrameGraph (TF-tree analog, utils/frames.py): composition, LCA
lookup, dynamic updates, and the rig wiring the reference's URDF +
odom broadcast produce (detect_with_zed.launch:36-54)."""

import numpy as np
import pytest

from moving_object_detector_tpu.utils.frames import (
    FrameGraph,
    FrameGraphError,
)


def se3(yaw=0.0, t=(0.0, 0.0, 0.0)):
    c, s = np.cos(yaw), np.sin(yaw)
    T = np.eye(4)
    T[:3, :3] = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
    T[:3, 3] = t
    return T


def test_identity_and_single_edge():
    g = FrameGraph()
    T = se3(0.3, (1.0, 0.0, 2.0))
    g.add_static("base", "cam", T)
    np.testing.assert_allclose(g.lookup("base", "cam"), T)
    np.testing.assert_allclose(g.lookup("cam", "base"), np.linalg.inv(T))
    np.testing.assert_allclose(g.lookup("cam", "cam"), np.eye(4))


def test_chain_composition_matches_matrix_product():
    g = FrameGraph()
    T1 = se3(0.2, (1, 2, 3))
    T2 = se3(-0.4, (0, 1, 0))
    T3 = se3(0.1, (5, 0, 0))
    g.update("odom", "base", T1)
    g.add_static("base", "cam", T2)
    g.add_static("cam", "lens", T3)
    np.testing.assert_allclose(
        g.lookup("odom", "lens"), T1 @ T2 @ T3, atol=1e-12
    )
    # Sibling lookup through the LCA (base): cam <- imu.
    T4 = se3(0.0, (0, 0, 0.5))
    g.add_static("base", "imu", T4)
    np.testing.assert_allclose(
        g.lookup("cam", "imu"), np.linalg.inv(T2) @ T4, atol=1e-12
    )


def test_dynamic_update_refreshes():
    g = FrameGraph()
    g.add_static("base", "cam", se3(0, (0.1, 0, 0)))
    g.update("odom", "base", se3(0, (1, 0, 0)))
    p1 = g.transform_points("odom", "cam", np.zeros((1, 3)))
    np.testing.assert_allclose(p1, [[1.1, 0, 0]])
    g.update("odom", "base", se3(0, (2, 0, 0)))  # next frame's broadcast
    p2 = g.transform_points("odom", "cam", np.zeros((1, 3)))
    np.testing.assert_allclose(p2, [[2.1, 0, 0]])
    with pytest.raises(ValueError, match="static"):
        g.update("base", "cam", np.eye(4))


def test_errors():
    g = FrameGraph()
    g.add_static("base", "cam", np.eye(4))
    g.add_static("world2", "thing", np.eye(4))
    with pytest.raises(FrameGraphError, match="unknown"):
        g.lookup("base", "nope")
    with pytest.raises(FrameGraphError, match="not connected"):
        g.lookup("cam", "thing")
    with pytest.raises(ValueError, match="already has parent"):
        g.add_static("world2", "cam", np.eye(4))
    with pytest.raises(ValueError, match="cycle"):
        g.add_static("cam", "base", np.eye(4))


def test_pipeline_rig_roundtrip():
    """The detect_with_zed rig: odom_pose from the pipeline + static
    base<-camera extrinsic; track centers in odom map back into the
    camera exactly as pipeline.transform_objects' inverse."""
    rng = np.random.default_rng(0)
    T_bc = se3(0.15, (0.2, -0.1, 0.0))
    odom_pose = se3(-0.3, (4.0, 0.0, 1.0))  # odom <- base
    g = FrameGraph()
    g.add_static("base_link", "camera", T_bc)
    g.update("odom", "base_link", odom_pose)
    pts_cam = rng.normal(size=(8, 3))
    expected = pts_cam @ (odom_pose @ T_bc)[:3, :3].T + (
        odom_pose @ T_bc
    )[:3, 3]
    np.testing.assert_allclose(
        g.transform_points("odom", "camera", pts_cam), expected, atol=1e-12
    )
