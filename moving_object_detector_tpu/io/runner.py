"""Host streaming runner: sequence -> pipeline -> exported products.

The process-level replacement for the reference's launch-file orchestration
(detect_moving_object.launch wiring, SURVEY.md §1 L9) plus its software
pipelining (the detached construct thread overlapping the next frame's
perception, scene_flow_constructor.cpp:389-392):

* a producer thread decodes/renders frames into the native SPSC ring
  (runtime/modt_runtime.cpp) — the ROS sensor-topic analog;
* the consumer loop feeds the device; JAX's async dispatch overlaps host
  decode of frame k+1 with device compute of frame k (double buffering);
* outputs are fetched one frame behind the device, then optionally exported
  (markers JSON, label/flow/depth images, PLY clouds) — the RViz analog.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time
from typing import Iterable, Optional

import numpy as np

from ..config import PipelineConfig
from ..types import StereoModel
from ..utils.profiling import StageTimer
from .frame_ring import FrameRing
from . import viz


@dataclasses.dataclass
class FrameResult:
    """Host-side distillation of one frame's outputs."""

    index: int
    time: float
    n_detections: int
    n_tracks: int
    detections: dict
    tracks: dict
    ego_success: bool
    frame_valid: bool
    # Capacity observability (pipeline.FrameOutput): size-passing clusters
    # dropped beyond max_objects / track bank full after this frame.
    cluster_overflow: int = 0
    tracker_saturated: bool = False
    # Wall-clock at harvest. When the stream timestamps are producer
    # wall-clock (live/socket sources), harvest_wall - time is the
    # end-to-end capture->published latency of this frame.
    harvest_wall: float = 0.0


class _RunToken:
    """Per-run() feeder handshake: lingering threads from a previous run
    hold a stale token and cannot affect the current run."""

    def __init__(self):
        self.stop = threading.Event()
        self.done = threading.Event()
        self.error: Optional[BaseException] = None


class PipelineRunner:
    """Drives the fused detect_step over a stereo sequence."""

    def __init__(
        self,
        config: PipelineConfig,
        stereo: StereoModel,
        flow_params=None,
        flow_model=None,
        export_dir: Optional[str] = None,
        export_every: int = 1,
        ring_capacity: int = 4,
        drop_oldest: bool = False,
        reconfigure_file: Optional[str] = None,
        dashboard=None,
    ):
        self.config = config
        self.stereo = stereo
        self.flow_params = flow_params
        self.flow_model = flow_model
        self.export_dir = export_dir
        self.export_every = export_every
        self.ring = FrameRing(
            config.height, config.width, capacity=ring_capacity,
            drop_oldest=drop_oldest,
            channels=3 if getattr(config, "color", False) else 1,
        )
        self.timer = StageTimer()
        if export_dir:
            os.makedirs(export_dir, exist_ok=True)
        # Runtime reconfigure channel (the dynamic_reconfigure-server
        # analog, SceneFlowConstructor.cfg / Clusterer.cfg /
        # MovingObjectTracker.cfg callbacks): a watched JSON file whose
        # keys are Tunables fields. Touched between frames -> new values
        # ride into the already-compiled step as traced scalars (no
        # recompile, tunables.py).
        from ..tunables import Tunables

        self.tunables = Tunables.from_config(config)
        self.reconfigure_file = reconfigure_file
        self._reconfigure_mtime: float = -1.0
        # Live HTTP viewer (io/dashboard.LiveDashboard) — the rqt/rviz
        # analog; fed on the harvest path, one frame behind the device.
        self.dashboard = dashboard

    def _maybe_reload_tunables(self) -> bool:
        """Between frames: if the reconfigure file changed, apply its
        values. Returns True when a reload was applied. Unknown keys and
        malformed JSON are reported and skipped (a live tuning UI must
        not be able to crash the pipeline)."""
        path = self.reconfigure_file
        if not path:
            return False
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            return False  # not created yet
        if mtime == self._reconfigure_mtime:
            return False
        self._reconfigure_mtime = mtime
        import json

        try:
            with open(path) as f:
                values = json.load(f)
        except (OSError, ValueError) as e:
            print(f"# reconfigure: unreadable {path}: {e}", flush=True)
            return False
        known = {
            k: v for k, v in values.items()
            if hasattr(self.tunables, k)
        }
        unknown = sorted(set(values) - set(known))
        if unknown:
            print(f"# reconfigure: ignoring unknown keys {unknown}",
                  flush=True)
        if not known:
            return False
        self.tunables = self.tunables.replace_values(**known)
        print(f"# reconfigure: applied {known}", flush=True)
        return True

    def _apply_dashboard_tunables(self) -> bool:
        """Between frames: drain knob values POSTed to the dashboard's
        /tunables endpoint (the rqt-reconfigure loop: observe AND adjust
        in one pane) and publish the current values for /tunables.json.
        Same validation as the file channel: unknown keys are reported
        and skipped, never fatal."""
        if self.dashboard is None or not hasattr(
            self.dashboard, "pop_pending_tunables"
        ):
            return False
        values = self.dashboard.pop_pending_tunables()
        applied = False
        if values:
            known = {
                k: v for k, v in values.items()
                if hasattr(self.tunables, k)
            }
            unknown = sorted(set(values) - set(known))
            if unknown:
                print(
                    f"# dashboard reconfigure: ignoring unknown keys "
                    f"{unknown}",
                    flush=True,
                )
            if known:
                self.tunables = self.tunables.replace_values(**known)
                print(f"# dashboard reconfigure: applied {known}",
                      flush=True)
                applied = True
        self.dashboard.set_tunables_view({
            k: float(np.asarray(getattr(self.tunables, k)))
            for k in self.tunables.__dataclass_fields__
        })
        return applied

    def _feeder(self, sequence: Iterable, token: "_RunToken"):
        try:
            for left, right, t in sequence:
                if token.stop.is_set():
                    return
                # Blocking (backpressure) mode: keep retrying in short
                # slices so a long device compile neither drops the frame
                # (the old single 30 s push silently gave up) nor wedges
                # the thread past a stop request.
                while not token.stop.is_set():
                    if self.ring.push(left, right, t, timeout=2.0):
                        break
        except BaseException as e:  # surface decode errors to run()
            token.error = e
        finally:
            token.done.set()

    def run(
        self,
        sequence: Iterable,
        max_frames: Optional[int] = None,
        initial_state=None,
    ):
        """Run the pipeline over the sequence; returns list[FrameResult].

        ``initial_state``: resume from a PipelineState snapshot
        (restore_state) instead of a fresh state — deterministic resume on
        recorded sequences (SURVEY.md §5 checkpoint/resume gap; the
        reference keeps all of this state in process memory and cannot
        resume). The final state of every run is kept in ``final_state``
        for ``save_state``.
        """
        import jax
        import jax.numpy as jnp

        from ..pipeline import PipelineState, detect_step

        state = (
            initial_state
            if initial_state is not None
            else PipelineState.create(self.config)
        )
        self.final_state = state
        # Per-run token (not shared instance attrs): a lingering feeder
        # from a previous max_frames-truncated run can neither flip this
        # run's done flag nor interleave its frames (we join it + drain
        # the ring first).
        prev = getattr(self, "_feeder_thread", None)
        if prev is not None and prev.is_alive():
            self._token.stop.set()
            prev.join(timeout=10.0)
        while self.ring.pop(timeout=0.0) is not None:
            pass  # discard frames left over from a truncated previous run
        token = _RunToken()
        self._token = token
        feeder = threading.Thread(
            target=self._feeder, args=(sequence, token), daemon=True
        )
        self._feeder_thread = feeder
        feeder.start()

        results: list[FrameResult] = []
        pending = None  # (index, t, FrameOutput) one frame behind
        # Frame numbering (and export filenames) continue across a resume.
        k0 = int(np.asarray(state.frame_index))
        k = k0
        try:
            while max_frames is None or k < k0 + max_frames:
                with self.timer.stage("ring_pop"):
                    frame = self.ring.pop(timeout=2.0)
                if frame is None:
                    if token.done.is_set() and self.ring.size() == 0:
                        break
                    continue
                left, right, t = frame
                self._maybe_reload_tunables()
                self._apply_dashboard_tunables()
                with self.timer.stage("dispatch"):
                    state, out = detect_step(
                        self.flow_params,
                        state,
                        jnp.asarray(left),
                        jnp.asarray(right),
                        jnp.float32(t),
                        self.stereo,
                        self.config,
                        flow_model=self.flow_model,
                        tunables=self.tunables,
                    )
                # Harvest the previous frame while this one computes.
                if pending is not None:
                    results.append(self._harvest(*pending))
                pending = (k, t, out, left)
                k += 1
            if pending is not None:
                results.append(self._harvest(*pending))
        finally:
            token.stop.set()
            # Inside finally: a crash/interrupt mid-run must still leave
            # the progress made so far snapshottable via save_state.
            self.final_state = state
            self.last_results = results
        if token.error is not None:
            raise RuntimeError(
                f"frame feeder failed after {len(results)} processed "
                f"frames (partial results in .last_results, state in "
                f".final_state)"
            ) from token.error
        return results

    def save_state(self, path: str) -> None:
        """Snapshot the state left by the last run() (orbax)."""
        from ..utils.checkpoint import save_pipeline_state

        save_pipeline_state(path, self.final_state)

    def restore_state(self, path: str):
        """Load a snapshot produced by save_state; pass to run(...,
        initial_state=...)."""
        from ..pipeline import PipelineState
        from ..utils.checkpoint import restore_pipeline_state

        return restore_pipeline_state(
            path, PipelineState.create(self.config)
        )

    def _harvest(self, index: int, t: float, out, left=None) -> FrameResult:
        with self.timer.stage("harvest"):
            det = out.detections
            trk = out.tracked.objects
            det_valid = np.asarray(det.valid)
            trk_valid = np.asarray(trk.valid)
            result = FrameResult(
                index=index,
                time=t,
                n_detections=int(det_valid.sum()),
                n_tracks=int(trk_valid.sum()),
                detections={
                    "id": np.asarray(det.id)[det_valid],
                    "center": np.asarray(det.center)[det_valid],
                    "velocity": np.asarray(det.velocity)[det_valid],
                    "bounding_box": np.asarray(det.bounding_box)[det_valid],
                },
                tracks={
                    "id": np.asarray(trk.id)[trk_valid],
                    "center": np.asarray(trk.center)[trk_valid],
                    "velocity": np.asarray(trk.velocity)[trk_valid],
                    "bounding_box": np.asarray(trk.bounding_box)[trk_valid],
                    # 4x4 KF covariance per published track, the
                    # ~trackers_covariance topic analog
                    # (TrackerCovariance.msg, moving_objects_tracker.cpp:
                    # 105-133).
                    "covariance": np.asarray(out.tracked.covariance)[
                        trk_valid
                    ],
                },
                ego_success=bool(out.ego_success),
                frame_valid=bool(out.frame_valid),
                cluster_overflow=int(np.asarray(out.cluster_overflow)),
                tracker_saturated=bool(np.asarray(out.tracker_saturated)),
                harvest_wall=time.time(),
            )
            if result.cluster_overflow or result.tracker_saturated:
                import sys as _sys

                print(
                    f"WARNING frame {index}: capacity saturated "
                    f"(clusters dropped={result.cluster_overflow}, "
                    f"track bank full={result.tracker_saturated}) — "
                    f"raise ClustererConfig.max_objects / "
                    f"TrackerConfig.max_tracks",
                    file=_sys.stderr,
                )
        if self.export_dir and index % self.export_every == 0:
            with self.timer.stage("export"):
                self._export(index, out)
        if self.dashboard is not None:
            with self.timer.stage("dashboard"):
                self.dashboard.update(
                    index, t, out, left, self.config, self.stereo
                )
        return result

    def _export(self, index: int, out) -> None:
        d = self.export_dir
        prefix = os.path.join(d, f"{index:06d}")
        viz.write_ppm(
            prefix + "_clusters.ppm",
            viz.colorize_labels(
                np.asarray(out.label_image), self.config.clusterer.max_objects
            ),
        )
        viz.write_ppm(prefix + "_flow.ppm", viz.flow_to_rgb(np.asarray(out.flow)))
        viz.write_ppm(
            prefix + "_static_flow.ppm",
            viz.flow_to_rgb(np.asarray(out.static_flow)),
        )
        viz.write_ppm(
            prefix + "_depth.ppm",
            viz.depth_image(np.asarray(out.scene_flow.points)),
        )
        viz.write_ppm(
            prefix + "_velocity.ppm",
            viz.velocity_image(
                np.asarray(out.scene_flow.velocity),
                self.config.scene_flow.max_color_velocity,
            ),
        )
        markers = viz.objects_to_markers(out.detections, color=(1, 0, 0, 0.8))
        markers += viz.objects_to_markers(
            out.tracked.objects, frame_id="odom", color=(0, 1, 0, 0.8)
        )
        viz.write_marker_json(prefix + "_markers.json", markers)

    def report(self) -> str:
        return self.timer.report()
