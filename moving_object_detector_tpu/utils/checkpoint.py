"""Checkpoint / resume via orbax.

The reference has no checkpointing at all (SURVEY.md §5): PWC-Net weights
are a frozen caffemodel symlink and pipeline state (integrated pose, tracker
bank) is in-memory only. Here both are first-class:

* flow-net params (+ optimizer state) checkpoints for training/serving;
* pipeline-state snapshots (pose, previous frame/disparity, tracker bank,
  frame index) for deterministic resume on recorded sequences.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_flow_params(path: str, params: Any, opt_state: Any = None) -> None:
    """Save flow-net params (and optionally optimizer state) to ``path``.

    A ``.npz`` path saves a compressed float16 flat archive (compact,
    git-committable weight distribution — the role of the reference's
    ``pwc_net.caffemodel``, dockerfile:108-111); anything else is a full
    f32 orbax checkpoint directory.
    """
    if path.endswith(".npz"):
        save_flow_params_npz(path, params)
        return
    ocp = _ocp()
    ckpt = {"params": params}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), ckpt, force=True)


def save_flow_params_npz(path: str, params: Any) -> None:
    """Compressed float16 flat-key archive of a params pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kpath, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kpath)
        out[key] = np.asarray(leaf).astype(np.float16)
    np.savez_compressed(path, **out)


def default_flow_checkpoint() -> str | None:
    """Path of the bundled trained flow weights (weights/ at the repo root —
    the role of the reference's ``pwc_net.caffemodel`` symlink,
    dockerfile:108-111), or None if not present.

    Preference order = newest checkpoint that passes ALL bundled-weight
    gates (tests/test_flow_quality.py EPE floor + static spurious +
    cell-texture motion; scripts/validate_detection_quality.py end-to-end
    PASS). pwc_v5 (real-photo textures + max_shift 128 curriculum,
    scripts/train_flow_v5.sh) additionally passes the real-imagery
    static/shift checks (tests/test_real_imagery.py), the magnitude-binned
    EPE gate ([24,64) px bin < 5), and the flow_input_scale=2 serving
    gates — see flow_checkpoint_scale2_gated. Older versions remain as
    explicit-path fallbacks only."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in ("pwc_v7.fp16.npz", "pwc_v6m3.fp16.npz", "pwc_v5.fp16.npz",
                 "pwc_v4e.fp16.npz", "pwc_v4.fp16.npz", "pwc_v2.fp16.npz"):
        path = os.path.join(root, "weights", name)
        if os.path.exists(path):
            return path
    return None


# Exact basenames of bundled weight archives that have passed BOTH
# flow_input_scale=2 serving gates (eval_flow_ckpt EPE floor at 384x896
# AND end-to-end validate_detection_quality at both scales). Add an entry
# ONLY when both gates pass on that exact exported file — substring or
# prefix matching would let ungated candidate exports (e.g.
# /tmp/pwc_v4e_candidate.fp16.npz) claim the gate and silently serve at
# half resolution.
_SCALE2_GATED_BASENAMES = frozenset({
    "pwc_v4e.fp16.npz",   # stage E, gates PASS 2026-08-19 (384x896)
    "pwc_v5.fp16.npz",    # train_flow_v5.sh, gates PASS 2026-08-19:
                          # 384x896 scale-2 EPE 2.06, detection 6/7,
                          # 0 phantoms, vel err 0.287
    "pwc_v6m3.fp16.npz",  # stage M3 (local-motion curriculum +
                          # boundary-symmetric motion-contrast 6,
                          # downsample-frac 0.5), gates PASS 2026-08-21
                          # measured on THIS exported file: 384x896
                          # scale-2 EPE 2.06 (gate <4.5); serving
                          # detection (flow2+sgm2) 7/7, 0 phantoms, vel
                          # err 0.263; scale-2 scene matrix vel 0.407/
                          # 0.496/0.551 on lateral/multi/occlusion (v5:
                          # 0.488/0.862/1.059). Caveat (documented in
                          # docs/performance.md): 1-4 single-frame
                          # background-depth phantom detections across
                          # the lateral/rotating matrix scenes that the
                          # tracker's correction_count_limit=3 filters
                          # from published tracks.
    "pwc_p1.fp16.npz",    # structured-pruned pwc_v6m3 (est 96,96,72,
                          # 48,24 / ctx 96,96,96,72,48,24 = 69.9%
                          # params, scripts/prune_finetune.sh) + 4000-
                          # step recovery finetune. Gates PASS
                          # 2026-08-21 on this exported file: 384x896
                          # scale-2 EPE 2.061 (<4.5); detection 9/9 vel
                          # 0.392 (scale 1) / 7/7 vel 0.494 (serving),
                          # 0 phantoms. Superseded as the speed option
                          # by pwc_p3 (faster AND more accurate); kept
                          # as an explicit-path fallback.
    "pwc_v7.fp16.npz",    # occlusion-cue architecture (stage O,
                          # scripts/train_flow_occ.sh): v6m3 upgraded
                          # exactly via augment_flow_occlusion.py
                          # (mean |f1 - warp(f2)| estimator-input
                          # channel per level) + 5000-step recovery/
                          # cue finetune. Gates 2026-08-22 on this
                          # exported file: 384x896 scale-2 EPE 2.069
                          # (v6m3 2.06); detection 9/9 vel 0.329
                          # (scale 1) / 7/7 vel 0.198 (serving — v6m3
                          # 0.263), 0 phantoms; scale-1 scene matrix
                          # lateral/multi/occl 0.184/0.259/0.309 ALL
                          # PASS with ZERO phantoms (v6m3: 0.319/
                          # 0.193/0.306 + 1 rotating-scene phantom);
                          # paste probe 1.03/1.44/1.70 px at shifts
                          # 6/10/16 (v6m3 1.25/1.43/1.85 — occluding
                          # half 1.38 -> 1.12 at 16; still over the
                          # 1.5 gate at 16, so the probe test stays
                          # xfail). THE DEFAULT since round 5.
    "pwc_p3.fp16.npz",    # deep-pruned pwc_v6m3 (est 64,64,48,32,16 /
                          # ctx 64,64,64,48,32,16 = 45.3% params,
                          # scripts/prune_finetune3.sh, stage P3) +
                          # 5000-step recovery finetune (the 48-width
                          # stage P2 failed its matrix gates — capacity
                          # loss). Gates 2026-08-21 on this exported
                          # file: 384x896 scale-2 EPE 2.548 (<4.5),
                          # static spurious 0.0%; detection 9/9 vel
                          # 0.350 (scale 1) / 7/7 vel 0.230 (serving —
                          # BETTER than v6m3's 0.263), 0 phantoms.
                          # Caveat (why it is NOT the default): the
                          # scale-1 scene matrix vel errs are ~2x v6m3
                          # (lateral/multi/occlusion 0.681/0.647/0.642
                          # vs 0.319/0.193/0.306, marginally over the
                          # 0.6 gate), and the paste probe regresses
                          # (2.15/1.93/2.21 px at shifts 6/10/16 vs
                          # v6m3's 1.25/1.43/1.85). The full-res speed
                          # option: see BENCH_MATRIX round-5 row.
})


def flow_checkpoint_scale2_gated(path: str | None) -> bool:
    """True iff these weights passed the serving quality gates AT
    flow_input_scale=2 (eval_flow_ckpt EPE floor + end-to-end
    validate_detection_quality, both scales) — the precondition for
    running the ~4x-cheaper half-res flow path by default. Keyed on an
    exact allowlist of gated bundled basenames, like the gate tests in
    tests/test_flow_quality.py."""
    if not path:
        return False
    return os.path.basename(path) in _SCALE2_GATED_BASENAMES


def resolve_flow_checkpoint(arg: str | None) -> str | None:
    """CLI convention: 'auto' (or None) -> bundled weights if present;
    'none' -> random init; anything else -> explicit path."""
    if arg in (None, "auto"):
        return default_flow_checkpoint()
    if arg == "none":
        return None
    return arg


def restore_flow_params(path: str, like: Any = None) -> Any:
    """Restore a flow-net checkpoint (orbax dir or .npz archive); ``like``
    provides the pytree structure (required for orbax; for npz it
    validates shapes and restores dtypes)."""
    if path.endswith(".npz"):
        assert like is not None, "npz restore needs a `like` pytree"
        data = np.load(path)
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for kpath, leaf in flat:
            key = "/".join(str(getattr(k, "key", k)) for k in kpath)
            arr = data[key]
            assert arr.shape == np.shape(leaf), (key, arr.shape)
            # leaf.dtype, not np.asarray(leaf).dtype: `like` leaves may be
            # device arrays, and materializing each one costs a device->
            # host fetch (~4 s/leaf over the tunneled backend).
            leaves.append(arr.astype(np.dtype(leaf.dtype)))
        return jax.tree_util.tree_unflatten(treedef, leaves)
    ocp = _ocp()

    def to_target(leaf):
        # Abstract leaves (ShapeDtypeStruct) pass straight through —
        # np.asarray on them makes dtype=object arrays that tensorstore
        # rejects; orbax StandardCheckpointer accepts abstract targets.
        if isinstance(leaf, jax.ShapeDtypeStruct):
            return leaf
        return np.asarray(leaf)

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = {"params": like}
            restored = ckptr.restore(
                os.path.abspath(path),
                target=jax.tree_util.tree_map(to_target, target),
            )
        else:
            restored = ckptr.restore(os.path.abspath(path))
    return restored["params"]


def load_flow_checkpoint(path: str, base_config: Any = None):
    """Restore a flow checkpoint AND its inferred FlowNetConfig.

    Returns ``(params, config)`` where the architecture fields of config
    are recovered from the checkpoint's kernel shapes
    (models.pwc_net.infer_flow_config) and the non-architecture fields
    (dtype, kernel backends) are taken from ``base_config``. Slim/wide
    decoder checkpoints therefore serve without any width flags.
    """
    from ..models.pwc_net import (
        PWCNet,
        infer_flow_config,
        init_pwc_params_abstract,
    )

    if path.endswith(".npz"):
        data = np.load(path)
        shapes = {k: data[k].shape for k in data.files}
        cfg = infer_flow_config(shapes, base_config)
        like = init_pwc_params_abstract(PWCNet(config=cfg))
        return restore_flow_params(path, like=like), cfg

    params = restore_flow_params(path)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # Flat keys already start with "params/" (the pytree's own top level),
    # matching the npz archive's key convention.
    shapes = {
        "/".join(str(getattr(k, "key", k)) for k in kp): np.shape(leaf)
        for kp, leaf in flat
    }
    # Raw orbax restore already yields correctly-shaped arrays; only the
    # config needs inferring.
    return params, infer_flow_config(shapes, base_config)


def save_pipeline_state(path: str, state: Any) -> None:
    """Snapshot a PipelineState (or any pytree) for deterministic resume."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def restore_pipeline_state(path: str, like: Any) -> Any:
    """Restore a PipelineState snapshot into the structure of ``like``."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(path),
            target=jax.tree_util.tree_map(np.asarray, like),
        )
