"""Evaluation-metric tests."""

import numpy as np

from moving_object_detector_tpu.eval import (
    _aabb_iou,
    disparity_d1,
    flow_epe,
    match_detections,
)


def test_iou_identical_boxes():
    assert _aabb_iou([0, 0, 5], [1, 1, 1], [0, 0, 5], [1, 1, 1]) == 1.0


def test_iou_disjoint():
    assert _aabb_iou([0, 0, 0], [1, 1, 1], [5, 5, 5], [1, 1, 1]) == 0.0


def test_iou_half_overlap():
    # Boxes [0,1]x[0,1]x[0,1] and [0.5,1.5]x[0,1]x[0,1]: inter 0.5, union 1.5.
    iou = _aabb_iou([0.5, 0.5, 0.5], [1, 1, 1], [1.0, 0.5, 0.5], [1, 1, 1])
    assert abs(iou - 1 / 3) < 1e-9


def test_match_detections_basic():
    m = match_detections(
        pred_centers=[[0, 0, 5], [3, 0, 5]],
        pred_sizes=[[1, 1, 1], [1, 1, 1]],
        pred_velocities=[[1, 0, 0], [0, 1, 0]],
        gt_centers=[[0.1, 0, 5]],
        gt_sizes=[[1, 1, 1]],
        gt_velocities=[[1.1, 0, 0]],
    )
    assert m.n_pred == 2 and m.n_gt == 1
    assert len(m.matches) == 1
    assert m.matches[0].index_pred == 0
    assert m.recall == 1.0 and m.precision == 0.5
    assert abs(m.matches[0].velocity_error - 0.1) < 1e-6


def test_match_detections_empty():
    m = match_detections([], [], [], [], [], [])
    assert m.precision == 1.0 and m.recall == 1.0

    m2 = match_detections([], [], [], [[0, 0, 1]], [[1, 1, 1]], [[0, 0, 0]])
    assert m2.recall == 0.0


def test_flow_epe_and_fl():
    gt = np.zeros((4, 4, 2))
    gt[..., 0] = 10.0
    pred = gt.copy()
    pred[0, 0, 0] = 20.0  # error 10 px -> outlier
    out = flow_epe(pred, gt)
    assert abs(out["epe"] - 10.0 / 16) < 1e-9
    assert abs(out["fl"] - 1 / 16) < 1e-9


def test_disparity_d1():
    gt = np.full((4, 4), 20.0)
    pred = gt.copy()
    pred[0, 0] = 25.0  # err 5 > 3 and > 5% of 20 -> bad
    pred[0, 1] = -1.0  # invalid prediction -> excluded, lowers density
    out = disparity_d1(pred, gt)
    assert abs(out["d1"] - 1 / 15) < 1e-9
    assert abs(out["density"] - 15 / 16) < 1e-9


def test_synthetic_sequence_eval():
    """End-to-end: run the pipeline on the synthetic sequence with truth
    flow and score detections against ground truth."""
    import jax.numpy as jnp

    import tests.test_pipeline as tp
    from moving_object_detector_tpu.eval import evaluate_synthetic_sequence
    from moving_object_detector_tpu.io.readers import SyntheticStereoSequence

    # Reuse the deterministic pipeline sequence, wrapping results into the
    # runner's FrameResult-like records.
    state, outputs = tp.run_sequence(5)

    class R:
        def __init__(self, k, out):
            self.index = k
            det = out.detections
            valid = np.asarray(det.valid)
            self.detections = {
                "center": np.asarray(det.center)[valid],
                "bounding_box": np.asarray(det.bounding_box)[valid],
                "velocity": np.asarray(det.velocity)[valid],
            }

    seq = SyntheticStereoSequence(
        height=tp.H, width=tp.W, fx=tp.FX, baseline=tp.BASE,
        z_bg=tp.Z_BG, z_obj=tp.Z_OBJ, obj_size=(tp.OBJ_H, tp.OBJ_W),
        obj_speed_px=tp.SHIFT, fps=10.0, n_frames=5,
    )
    # Patch the sequence's truth to the test scene's layout.
    seq.obj_y = tp.OBJ_Y
    seq.obj_x0 = 30

    results = [R(k, out) for k, out in enumerate(outputs)]
    metrics = evaluate_synthetic_sequence(results, seq)
    assert metrics["frames"] == 4
    assert metrics["recall"] > 0.9
    assert metrics["mean_velocity_error"] < 0.3
