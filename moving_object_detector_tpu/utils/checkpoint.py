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
    """Save flow-net params (and optionally optimizer state) to ``path``."""
    ocp = _ocp()
    ckpt = {"params": params}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), ckpt, force=True)


def restore_flow_params(path: str, like: Any = None) -> Any:
    """Restore a flow-net checkpoint; ``like`` provides the pytree structure
    (required for exact dtype/shape restoration)."""
    ocp = _ocp()
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = {"params": like}
            restored = ckptr.restore(
                os.path.abspath(path),
                target=jax.tree_util.tree_map(np.asarray, target),
            )
        else:
            restored = ckptr.restore(os.path.abspath(path))
    return restored["params"]


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
