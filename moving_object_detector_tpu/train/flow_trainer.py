"""Flow-network training: multi-scale supervised EPE + photometric loss.

Replaces the reference's frozen ``pwc_net.caffemodel`` (dockerfile:108-111)
with an in-framework training loop: PWC-Net's standard multi-scale endpoint
-error objective, Adam(W), and a mesh-sharded train step (batch over the
``data`` axis, conv channels over ``model``) so training scales over ICI the
same way serving does.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.pwc_net import PWCNet
from ..ops import flow_ops
from ..parallel.mesh import flow_param_sharding


@struct.dataclass
class FlowTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: PWCNet, height: int, width: int, learning_rate: float = 1e-4,
    key=None, total_steps: int | None = None, warmup_steps: int = 500,
) -> tuple[FlowTrainState, optax.GradientTransformation]:
    """``total_steps`` switches the constant LR to linear-warmup + cosine
    decay (the schedule shape of the original PWC-Net training recipe)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    c = getattr(model.config, "in_channels", 1)
    dummy = jnp.zeros((1, height, width, c), jnp.float32)
    params = model.init(key, dummy, dummy)
    if total_steps is not None:
        lr = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, min(warmup_steps, total_steps // 10 + 1),
            total_steps, end_value=learning_rate * 0.02,
        )
    else:
        lr = learning_rate
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=4e-4),
    )
    return FlowTrainState(
        params=params, opt_state=tx.init(params), step=jnp.int32(0)
    ), tx


# Per-level supervision weights, finest (quarter-res) first — the standard
# PWC-Net schedule shape.
LEVEL_WEIGHTS = (0.32, 0.08, 0.02, 0.01, 0.005)


def motion_contrast_weights(gt_flow, strength: float, sat_px: float = 4.0,
                            dilate: int = 4):
    """Per-pixel loss weights emphasizing INDEPENDENTLY-moving regions.

    A uniform mean-EPE loss lets locally-moving objects plateau ~2 px
    under-tracked: an object covering ~7% of the frame with a 2 px
    residual costs only 0.14 px of mean EPE (measured pwc_v5/v6 paste
    probes, PLAN_NEXT 2026-08-20). Weight = 1 + strength *
    min(dev/sat_px, 1) where dev = distance of the pixel's GT flow from
    the per-image median flow (the background, since backgrounds dominate
    pixel count); normalized to mean 1 per image so the loss scale and LR
    tuning are unchanged.

    ``dilate``: max-pool radius applied to the raw weights so the
    BACKGROUND pixels bordering a mover carry the mover's weight too.
    Without it the weighting is asymmetric — over-extending object flow
    into the background costs 1x while under-tracking the object costs
    (1+strength)x — and the net learns to bleed motion outward (measured
    pwc_v6m: merged crossing-object clusters, center err 3.4 m, and
    boundary phantom detections in the scale-2 scene matrix).
    """
    bg = jnp.median(gt_flow, axis=(1, 2), keepdims=True)
    dev = jnp.sqrt(jnp.sum((gt_flow - bg) ** 2, axis=-1) + 1e-8)
    raw = 1.0 + strength * jnp.minimum(dev / sat_px, 1.0)
    if dilate > 0:
        k = 2 * dilate + 1
        raw = jax.lax.reduce_window(
            raw, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1), "SAME"
        )
    return raw / jnp.mean(raw, axis=(1, 2), keepdims=True)


def flow_loss(model: PWCNet, params, img1, img2, gt_flow,
              motion_contrast: float = 0.0):
    """Multi-scale endpoint error. gt_flow: (B, H, W, 2) full-res pixels.
    ``motion_contrast`` > 0 up-weights independently-moving pixels
    (motion_contrast_weights); 0 reproduces the uniform loss exactly."""
    full, levels = model.apply(params, img1, img2)
    wmap = (motion_contrast_weights(gt_flow, motion_contrast)
            if motion_contrast > 0 else None)
    total = jnp.float32(0.0)
    for i, lvl_flow in enumerate(levels):
        w = LEVEL_WEIGHTS[min(i, len(LEVEL_WEIGHTS) - 1)]
        lh, lw = lvl_flow.shape[1], lvl_flow.shape[2]
        scale = lw / gt_flow.shape[2]
        gt = flow_ops.resize_bilinear(gt_flow, (lh, lw)) * scale
        epe = jnp.sqrt(jnp.sum((lvl_flow - gt) ** 2, axis=-1) + 1e-8)
        if wmap is not None:
            lvl_w = flow_ops.resize_bilinear(wmap[..., None], (lh, lw))[..., 0]
            # Re-normalize to mean 1 per image after the resize: bilinear
            # downsampling drifts the mean near borders and at small
            # levels, which would silently rescale the per-level loss
            # terms (and thus the tuned loss/LR balance).
            lvl_w = lvl_w / jnp.mean(lvl_w, axis=(1, 2), keepdims=True)
            epe = epe * lvl_w
        total = total + w * jnp.mean(epe)
    full_epe_map = jnp.sqrt(jnp.sum((full - gt_flow) ** 2, axis=-1) + 1e-8)
    full_epe = jnp.mean(full_epe_map)
    full_term = (jnp.mean(full_epe_map * wmap) if wmap is not None
                 else full_epe)
    return total + 0.1 * full_term, full_epe


def train_step(model: PWCNet, tx, state: FlowTrainState, batch,
               motion_contrast: float = 0.0):
    """One SGD step. batch: dict(img1, img2, flow)."""

    def loss_fn(p):
        loss, epe = flow_loss(model, p, batch["img1"], batch["img2"],
                              batch["flow"], motion_contrast=motion_contrast)
        return loss, epe

    (loss, epe), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (
        FlowTrainState(params=params, opt_state=opt_state, step=state.step + 1),
        {"loss": loss, "epe": epe},
    )


def make_sharded_train_step(model: PWCNet, tx, mesh, state: FlowTrainState):
    """Jit the train step over a (data, model) mesh.

    Batch shards over ``data``; params/optimizer state shard conv output
    channels over ``model``; XLA inserts the gradient reductions over ICI.
    Returns (jitted_step, sharded_state).
    """
    param_sh = flow_param_sharding(mesh, state.params)
    opt_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state.opt_state
    )
    state_sh = FlowTrainState(
        params=param_sh,
        opt_state=opt_sh,
        step=NamedSharding(mesh, P()),
    )
    batch_sh = NamedSharding(mesh, P("data"))

    def step_fn(st, batch):
        return train_step(model, tx, st, batch)

    jitted = jax.jit(
        step_fn,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
    )
    sharded_state = jax.device_put(state, state_sh)
    return jitted, sharded_state


def make_chunked_train_step(
    model: PWCNet,
    tx,
    mesh,
    state: FlowTrainState,
    height: int,
    width: int,
    batch: int,
    chunk: int,
    n_objects: int = 4,
    max_shift: float = 24.0,
    bg_max_shift: float = 10.0,
    pool: int = 0,
    downsample_frac: float = 0.0,
    local_motion_frac: float = 0.0,
    real_frac: float = 0.0,
    motion_contrast: float = 0.0,
):
    """Jit ``chunk`` train steps into ONE dispatch, with the training data
    generated on device (train/data_synth.py layered affine scenes) inside
    the same program: ``(state, key) -> (state, mean-metrics)``.

    This is the only way to train efficiently over the tunneled TPU backend
    (~25-100 ms dispatch round trip per call — chaining amortizes it to
    nothing) and it also removes all host->device batch traffic: the host
    feeds one PRNG key per chunk. Batch shards over the mesh 'data' axis,
    params over 'model', as in make_sharded_train_step.

    ``pool`` > 0 draws scenes from a fixed pool of that many PRNG streams
    (cycled by step index) instead of fresh data every step — a
    bootstrap-curriculum trick: early memorization pressure on a finite
    scene set builds informative features far faster than infinite fresh
    data, after which training widens to pool=0.
    """
    from .data_synth import generate_batch

    param_sh = flow_param_sharding(mesh, state.params)
    opt_sh = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state.opt_state
    )
    state_sh = FlowTrainState(
        params=param_sh, opt_state=opt_sh, step=NamedSharding(mesh, P())
    )
    batch_sh = NamedSharding(mesh, P("data"))

    def body(st, k):
        if pool > 0:
            # Fixed scene pool: derive the key from the step index only.
            k = jax.random.fold_in(
                jax.random.PRNGKey(17), jnp.mod(st.step, pool)
            )
        data = generate_batch(
            k, batch, height, width, n_objects, max_shift, bg_max_shift,
            downsample_frac=downsample_frac, real_frac=real_frac,
            local_motion_frac=local_motion_frac,
            channels=getattr(model.config, "in_channels", 1),
        )
        data = jax.lax.with_sharding_constraint(
            data, {n: batch_sh for n in data}
        )
        return train_step(model, tx, st, data,
                          motion_contrast=motion_contrast)

    def chunk_fn(st, key):
        keys = jax.random.split(key, chunk)
        st, ms = jax.lax.scan(body, st, keys)
        return st, jax.tree_util.tree_map(jnp.mean, ms)

    jitted = jax.jit(
        chunk_fn,
        in_shardings=(state_sh, NamedSharding(mesh, P())),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
    )
    sharded_state = jax.device_put(state, state_sh)
    return jitted, sharded_state


def synthetic_flow_batch(rng: np.random.Generator, batch, height, width):
    """Random smooth-texture pairs with known constant per-sample flow — the
    self-contained data source for smoke training and the multichip dryrun."""
    img1 = rng.uniform(0, 1, (batch, height, width, 1)).astype(np.float32)
    flow = np.zeros((batch, height, width, 2), np.float32)
    img2 = np.empty_like(img1)
    for b in range(batch):
        du = int(rng.integers(-3, 4))
        dv = int(rng.integers(-2, 3))
        img2[b, ..., 0] = np.roll(
            np.roll(img1[b, ..., 0], -du, axis=1), -dv, axis=0
        )
        flow[b, ..., 0] = du
        flow[b, ..., 1] = dv
    return {
        "img1": jnp.asarray(img1),
        "img2": jnp.asarray(img2),
        "flow": jnp.asarray(flow),
    }
