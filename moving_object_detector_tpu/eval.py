"""Evaluation metrics: detection/velocity/flow/disparity parity measures.

The reference has no quantitative evaluation at all (SURVEY.md §4 — its
validation is a human watching RViz). This module provides the metrics the
parity story needs (BASELINE.json configs: "IoU/velocity parity", "KITTI
flow metrics"):

* 3D axis-aligned IoU matching between detection sets (greedy, like the
  tracker's association);
* per-matched-pair center / velocity / bounding-box errors;
* dense flow endpoint error (EPE) and KITTI outlier rate (Fl);
* disparity D1 (KITTI: |d - d_gt| > 3 px and > 5%) and density;
* sequence-level aggregation for recorded or synthetic runs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np


def _aabb_iou(center_a, size_a, center_b, size_b) -> float:
    """IoU of two axis-aligned 3D boxes given centers and sizes."""
    lo_a = np.asarray(center_a) - np.asarray(size_a) / 2
    hi_a = np.asarray(center_a) + np.asarray(size_a) / 2
    lo_b = np.asarray(center_b) - np.asarray(size_b) / 2
    hi_b = np.asarray(center_b) + np.asarray(size_b) / 2
    inter = np.maximum(0.0, np.minimum(hi_a, hi_b) - np.maximum(lo_a, lo_b))
    vol_i = float(np.prod(inter))
    vol_a = float(np.prod(np.maximum(hi_a - lo_a, 0)))
    vol_b = float(np.prod(np.maximum(hi_b - lo_b, 0)))
    denom = vol_a + vol_b - vol_i
    return vol_i / denom if denom > 0 else 0.0


@dataclasses.dataclass
class DetectionMatch:
    index_pred: int
    index_gt: int
    iou: float
    center_error: float
    velocity_error: float


@dataclasses.dataclass
class DetectionMetrics:
    n_pred: int
    n_gt: int
    matches: list
    precision: float
    recall: float
    mean_iou: float
    mean_center_error: float
    mean_velocity_error: float


def match_detections(
    pred_centers,
    pred_sizes,
    pred_velocities,
    gt_centers,
    gt_sizes,
    gt_velocities,
    iou_threshold: float = 0.25,
) -> DetectionMetrics:
    """Greedy IoU matching (highest IoU first) + per-pair errors."""
    pred_centers = np.atleast_2d(np.asarray(pred_centers, np.float64))
    gt_centers = np.atleast_2d(np.asarray(gt_centers, np.float64))
    n_p = 0 if pred_centers.size == 0 else len(pred_centers)
    n_g = 0 if gt_centers.size == 0 else len(gt_centers)
    pairs = []
    for i in range(n_p):
        for j in range(n_g):
            iou = _aabb_iou(
                pred_centers[i], np.asarray(pred_sizes)[i],
                gt_centers[j], np.asarray(gt_sizes)[j],
            )
            if iou >= iou_threshold:
                pairs.append((iou, i, j))
    pairs.sort(reverse=True)
    used_p, used_g = set(), set()
    matches = []
    for iou, i, j in pairs:
        if i in used_p or j in used_g:
            continue
        used_p.add(i)
        used_g.add(j)
        ce = float(np.linalg.norm(pred_centers[i] - gt_centers[j]))
        ve = float(
            np.linalg.norm(
                np.asarray(pred_velocities)[i] - np.asarray(gt_velocities)[j]
            )
        )
        matches.append(DetectionMatch(i, j, iou, ce, ve))
    precision = len(matches) / n_p if n_p else (1.0 if n_g == 0 else 0.0)
    recall = len(matches) / n_g if n_g else 1.0
    return DetectionMetrics(
        n_pred=n_p,
        n_gt=n_g,
        matches=matches,
        precision=precision,
        recall=recall,
        mean_iou=float(np.mean([m.iou for m in matches])) if matches else 0.0,
        mean_center_error=(
            float(np.mean([m.center_error for m in matches])) if matches else np.nan
        ),
        mean_velocity_error=(
            float(np.mean([m.velocity_error for m in matches])) if matches else np.nan
        ),
    )


def flow_epe(pred_flow, gt_flow, valid_mask=None):
    """Mean endpoint error + KITTI Fl outlier rate (>3 px and >5%)."""
    pred = np.asarray(pred_flow, np.float64)
    gt = np.asarray(gt_flow, np.float64)
    err = np.linalg.norm(pred - gt, axis=-1)
    mag = np.linalg.norm(gt, axis=-1)
    valid = np.isfinite(err)
    if valid_mask is not None:
        valid &= np.asarray(valid_mask, bool)
    if not valid.any():
        return {"epe": np.nan, "fl": np.nan, "density": 0.0}
    e = err[valid]
    m = mag[valid]
    outlier = (e > 3.0) & (e > 0.05 * np.maximum(m, 1e-9))
    return {
        "epe": float(e.mean()),
        "fl": float(outlier.mean()),
        "density": float(valid.mean()),
    }


def disparity_d1(pred_disp, gt_disp, gt_valid=None):
    """KITTI D1: fraction of valid pixels with |err| > 3 px and > 5% of gt,
    plus density of valid predictions."""
    pred = np.asarray(pred_disp, np.float64)
    gt = np.asarray(gt_disp, np.float64)
    gt_ok = np.isfinite(gt) & (gt > 0)
    if gt_valid is not None:
        gt_ok &= np.asarray(gt_valid, bool)
    pred_ok = np.isfinite(pred) & (pred >= 0)
    both = gt_ok & pred_ok
    if not both.any():
        return {"d1": np.nan, "density": 0.0, "mae": np.nan}
    err = np.abs(pred[both] - gt[both])
    bad = (err > 3.0) & (err > 0.05 * gt[both])
    return {
        "d1": float(bad.mean()),
        "density": float(both.sum() / max(gt_ok.sum(), 1)),
        "mae": float(err.mean()),
    }


def evaluate_synthetic_sequence(results, sequence) -> dict:
    """Aggregate detection metrics of PipelineRunner results against a
    SyntheticStereoSequence's ground truth."""
    per_frame = []
    for r in results:
        if r.index == 0:
            continue
        _, _, _, truth = sequence.frame(r.index)
        y, x, hh, ww = truth["obj_box"]
        # Ground-truth box in camera coordinates.
        z = truth["z"]
        fx = sequence.fx
        cx = sequence.w / 2.0
        cy = sequence.h / 2.0
        x0 = (x - cx) / fx * z
        x1 = (x + ww - cx) / fx * z
        y0 = (y - cy) / fx * z
        y1 = (y + hh - cy) / fx * z
        gt_center = [(x0 + x1) / 2, (y0 + y1) / 2, z]
        gt_size = [x1 - x0, y1 - y0, 0.2]
        m = match_detections(
            r.detections["center"],
            r.detections["bounding_box"],
            r.detections["velocity"],
            [gt_center],
            [gt_size],
            [list(truth["velocity"])],
            iou_threshold=0.1,
        )
        per_frame.append(m)
    if not per_frame:
        return {}
    return {
        "frames": len(per_frame),
        "recall": float(np.mean([m.recall for m in per_frame])),
        "precision": float(np.mean([m.precision for m in per_frame])),
        "mean_velocity_error": float(
            np.nanmean([m.mean_velocity_error for m in per_frame])
        ),
        "mean_center_error": float(
            np.nanmean([m.mean_center_error for m in per_frame])
        ),
    }
