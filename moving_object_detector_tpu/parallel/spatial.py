"""Spatial (row-stripe) sharding of the perception kernels over a mesh axis.

Scales ONE camera across several chips — the complement of the stream data
parallelism in parallel/streams.py. The image's row axis is sharded over the
mesh's ``model`` axis with `shard_map`; each device computes its stripe
extended by an exchanged halo (one `ppermute` per neighbor direction over
ICI), then crops the halo off. This is the TPU analog of the reference's
"crop the image so it fits the GPU" scaling story (image_crop,
detect_with_zed.launch:10-14) — except the resolution is kept and the
hardware is scaled instead.

Exactness contract:

* Optical flow (PWC-Net): convolutional with a finite receptive field, so a
  halo of 64 px (one full pyramid stride) makes interior pixels match the
  unsharded result up to boundary-bleed at the coarsest pyramid levels —
  approximate near stripe seams, identical elsewhere.
* SGM: horizontal DP paths, WTA, LR-check are row-local (exact under row
  sharding). The vertical DP paths are global recurrences; stripe processing
  warms them up over the halo rows, the standard "striped SGM" scheme of
  embedded/FPGA SGM implementations. The `- prev_min` normalization in the
  DP update (ops/sgm.py:_dp_step) makes a path's influence decay within a
  few dozen rows on textured input, so a 32-row halo bounds the seam error
  to a small fraction of pixels (asserted in tests/test_spatial.py).

Boundary stripes fill their missing outer halo by edge replication; the
filled rows are census/DP warm-up context only and are always cropped.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map_impl

    def _smap(mesh, in_specs, out_specs):
        return partial(
            _shard_map_impl, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_vma=False,
        )
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_impl

    def _smap(mesh, in_specs, out_specs):
        return partial(
            _shard_map_impl, mesh=mesh, in_specs=in_specs,
            out_specs=out_specs, check_rep=False,
        )

from ..config import SGMConfig
from ..ops.sgm import disparity_with_metadata, sgm_disparity_raw
from ..types import DisparityImage, StereoModel


def _neighbor_rows(x: jnp.ndarray, halo: int, axis_name: str, n: int):
    """(top_halo, bottom_halo) rows for the local stripe: the previous
    shard's last rows and the next shard's first rows, exchanged over ICI;
    edge-replicated where there is no neighbor (first/last stripe).

    The row axis is -2, so this works for a (H, W) stripe and for a
    (N, H, W) batch of stream stripes alike (one exchange moves every
    local stream's halo in a single ppermute)."""
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[..., :halo, :]
    bot_rows = x[..., -halo:, :]
    # My bottom rows become the next shard's top halo, and vice versa.
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    edge_top = jnp.broadcast_to(x[..., :1, :], from_prev.shape)
    edge_bot = jnp.broadcast_to(x[..., -1:, :], from_next.shape)
    top = jnp.where(idx == 0, edge_top, from_prev)
    bot = jnp.where(idx == n - 1, edge_bot, from_next)
    return top, bot


def _with_halo(x: jnp.ndarray, halo: int, axis_name: str, n: int):
    if halo == 0:  # no-halo operating point (seam-error baselines)
        return x
    top, bot = _neighbor_rows(x, halo, axis_name, n)
    return jnp.concatenate([top, x, bot], axis=-2)


def compute_disparity_spatial(
    left: jnp.ndarray,
    right: jnp.ndarray,
    stereo: StereoModel,
    cfg: SGMConfig,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 32,
) -> DisparityImage:
    """SGM with the row axis sharded over ``mesh.shape[axis]`` devices.

    left/right: (H, W) with H divisible by the axis size; halo must not
    exceed the stripe height.
    """
    n = mesh.shape[axis]
    h = left.shape[0]
    stripe = h // n
    assert h % n == 0, (h, n)
    assert 0 <= halo <= stripe, f"halo {halo} outside [0, {stripe}]"

    @_smap(mesh, (P(axis), P(axis)), P(axis))
    def run(l, r):
        le = _with_halo(l, halo, axis, n)
        re = _with_halo(r, halo, axis, n)
        disp = sgm_disparity_raw(le, re, cfg)
        return disp[halo:halo + stripe]

    disp = run(left, right)
    return disparity_with_metadata(disp, stereo, cfg)


def flow_forward_spatial(
    flow_params,
    flow_model,
    prev_img: jnp.ndarray,
    now_img: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    halo: int = 64,
    input_scale: int = 1,
) -> jnp.ndarray:
    """PWC-Net forward with the row axis sharded over ``axis``.

    ``input_scale`` is the pipeline's flow_input_scale serving knob
    (pipeline._flow_forward) — pass config.flow_input_scale so the
    sharded flow matches the unsharded operating point.

    prev_img/now_img: (H, W) f32; returns (H, W, 2) flow. Each stripe runs
    the full pyramid on its halo-extended rows (the net pads internally to
    the pyramid stride), then crops.
    """
    from ..pipeline import _flow_forward

    n = mesh.shape[axis]
    h = now_img.shape[0]
    stripe = h // n
    assert h % n == 0, (h, n)
    assert 0 <= halo <= stripe, f"halo {halo} outside [0, {stripe}]"

    param_specs = jax.tree_util.tree_map(lambda _: P(), flow_params)

    @_smap(mesh, (param_specs, P(axis), P(axis)), P(axis))
    def run(params, p, q):
        pe = _with_halo(p, halo, axis, n)
        qe = _with_halo(q, halo, axis, n)
        flow = _flow_forward(
            params, flow_model, pe, qe, input_scale=input_scale
        )
        return flow[halo:halo + stripe]

    return run(flow_params, prev_img, now_img)


def detect_step_streams_spatial(
    flow_params,
    states,
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    ts: jnp.ndarray,
    stereo: StereoModel,
    config,
    flow_model,
    mesh: Mesh,
    stream_axis: str = "data",
    row_axis: str = "model",
    sgm_halo: int = 32,
    flow_halo: int = 64,
):
    """Streams x spatial composition over a (data, model) mesh.

    The full production scaling story in one step (SURVEY.md §2.4 last
    row + the image_crop analog above): N camera streams are data-parallel
    over ``stream_axis`` while EACH stream's heavy perception (SGM + flow
    net — ~half the frame program) is row-stripe split over ``row_axis``.
    On a v5e-8 as (data=4, model=2), 4 streams each use 2 chips for the
    pixel-dense stages.

    The whole step is ONE shard_map (fully manual SPMD — no GSPMD pass
    ever sees the Pallas calls, which have no partitioning rules): images
    arrive replicated along ``row_axis``, each device slices its own
    stripe + halo locally (edge-replication padded at the image boundary,
    the same boundary semantics as the single-stream kernels above),
    computes its stripe of
    SGM + flow, and ONE tiled all_gather per product over ICI reassembles
    the full-height fields; the light remainder of the frame program
    (scene flow, clusterer, tracker) then runs replicated within each
    stream group, data-parallel across streams.

    Args mirror parallel.streams.detect_step_batched; lefts/rights are
    (N, H, W) with N divisible by the stream-axis size and H by the
    row-axis size.
    """
    from ..pipeline import _flow_forward, detect_step

    n_rows = mesh.shape[row_axis]
    n, h, w = lefts.shape
    assert n % mesh.shape[stream_axis] == 0, (n, mesh.shape[stream_axis])
    assert h % n_rows == 0, (h, n_rows)
    stripe = h // n_rows
    assert max(sgm_halo, flow_halo) <= h, (sgm_halo, flow_halo, h)

    param_specs = jax.tree_util.tree_map(lambda _: P(), flow_params)
    sspec = P(stream_axis)

    @_smap(
        mesh,
        (param_specs, sspec, sspec, sspec, sspec),
        (sspec, sspec),
    )
    def run(params, states_l, lefts_l, rights_l, ts_l):
        mp = jax.lax.axis_index(row_axis)

        def stripe_rows(x, halo):
            """This device's rows [mp*stripe - halo, ...+stripe+halo) of
            the edge-replication-padded image (same boundary semantics as
            the single-stream kernels above)."""
            top = jnp.broadcast_to(
                x[:, :1], (x.shape[0], halo) + x.shape[2:]
            )
            bot = jnp.broadcast_to(
                x[:, -1:], (x.shape[0], halo) + x.shape[2:]
            )
            xp = jnp.concatenate([top, x, bot], axis=1)
            return jax.lax.dynamic_slice_in_dim(
                xp, mp * stripe, stripe + 2 * halo, axis=1
            )

        le = stripe_rows(lefts_l, sgm_halo)
        re_ = stripe_rows(rights_l, sgm_halo)
        disp = jax.vmap(lambda a, b: sgm_disparity_raw(a, b, config.sgm))(
            le, re_
        )[:, sgm_halo:sgm_halo + stripe]

        pe = stripe_rows(states_l.prev_left, flow_halo)
        qe = stripe_rows(lefts_l, flow_halo)
        flow = jax.vmap(
            lambda a, b: _flow_forward(
                params, flow_model, a, b,
                input_scale=config.flow_input_scale,
            )
        )(pe, qe)[:, flow_halo:flow_halo + stripe]
        # Reassemble full-height fields within each stream group (ICI).
        disp = jax.lax.all_gather(disp, row_axis, axis=1, tiled=True)
        flow = jax.lax.all_gather(flow, row_axis, axis=1, tiled=True)

        def one(state, left, right, t, fl, dp):
            dimg = disparity_with_metadata(dp, stereo, config.sgm)
            return detect_step(
                params, state, left, right, t, stereo, config,
                flow_model=flow_model, flow_override=fl,
                disparity_override=dimg,
            )

        return jax.vmap(one)(
            states_l, lefts_l, rights_l, ts_l, flow, disp
        )

    lefts = lefts.astype(jnp.float32)
    rights = rights.astype(jnp.float32)
    return run(flow_params, states, lefts, rights, ts)
