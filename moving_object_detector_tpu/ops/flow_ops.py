"""Optical-flow building blocks: dense warping and local cost-volume
correlation.

These are the two custom layers the reference's Caffe fork adds for PWC-Net
(docker/dockerfile:73-74 patches a warp layer into flownet2-Caffe;
SURVEY.md §2.3). Here they are expressed as batched XLA programs:

* ``warp``: backward bilinear warping of a feature map by a flow field — a
  gather + lerp that XLA fuses; NCHW-free (we use NHWC, the TPU-friendly
  layout).
* ``correlation``: local cost volume over a (2r+1)^2 search window, i.e.
  per-displacement channel dot products. Implemented as shift-and-reduce so
  the inner op is a lane-wide multiply-add; the channel contraction is the
  MXU-shaped part and XLA lowers it accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp(features: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``features`` (B, H, W, C) by ``flow`` (B, H, W, 2).

    output(x) = features(x + flow(x)), bilinear, zero outside the image —
    matching the PWC-Net warping-layer semantics the reference's patched
    Caffe provides.
    """
    b, h, w, c = features.shape
    u = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    v = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    su = u + flow[..., 0]
    sv = v + flow[..., 1]

    inside = (su >= 0) & (su <= w - 1) & (sv >= 0) & (sv <= h - 1)
    su_c = jnp.clip(su, 0.0, w - 1.0)
    sv_c = jnp.clip(sv, 0.0, h - 1.0)
    u0 = jnp.floor(su_c)
    v0 = jnp.floor(sv_c)
    du = (su_c - u0)[..., None]
    dv = (sv_c - v0)[..., None]
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u1i = jnp.minimum(u0i + 1, w - 1)
    v1i = jnp.minimum(v0i + 1, h - 1)

    bidx = jnp.arange(b)[:, None, None]
    p00 = features[bidx, v0i, u0i]
    p01 = features[bidx, v0i, u1i]
    p10 = features[bidx, v1i, u0i]
    p11 = features[bidx, v1i, u1i]
    out = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    return jnp.where(inside[..., None], out, 0.0)


def warp_two_pass(
    features: jnp.ndarray,
    flow: jnp.ndarray,
    max_dy: int = 32,
    max_dx: int = 32,
) -> jnp.ndarray:
    """Approximate ``warp`` without gathers: two axis-separated passes of
    windowed shift-and-select accumulation (2R+1 weighted shifted slices —
    dense VPU work XLA fuses well, vs. arbitrary-pattern gathers that
    serialize on TPU).

    APPROXIMATION: pass 2 samples the vertically-warped intermediate at
    x + u(y, x), so the vertical coordinate it picks up was computed with
    v(y, x + u) rather than v(y, x) — the classic two-pass backward-warp
    error, O(|u| * |dv/dx|). Exact for flows constant along rows (and for
    all constant flows); small for the smooth upsampled inter-level flows
    of a PWC cascade; wrong-ish only near motion boundaries, where the
    correlation search absorbs it. Opt-in speed/quality tradeoff
    (FlowNetConfig.warp_backend) — train and serve with the same setting.

    Components beyond the +-(max-1) window are clamped; out-of-image
    samples are zero, matching ``warp``.
    """
    b, h, w, c = features.shape
    rv = min(max_dy, h)
    rh = min(max_dx, w)
    u = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    v = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    fu = jnp.clip(flow[..., 0], -(rh - 1), rh - 1)
    fv = jnp.clip(flow[..., 1], -(rv - 1), rv - 1)
    su = u + fu
    sv = v + fv
    inside = (su >= 0) & (su <= w - 1) & (sv >= 0) & (sv <= h - 1)

    # Vertical pass: g(y, x) = (1-b) f(v0, x) + b f(v0+1, x) as a sum of
    # row-shifted slices weighted by one-hot selects on dy = v0 - y.
    v0 = jnp.floor(sv)
    bw = (sv - v0)[..., None]
    dyk = (v0 - v).astype(jnp.int32)[..., None]
    fp = jnp.pad(features, ((0, 0), (rv, rv), (0, 0), (0, 0)))
    g = jnp.zeros_like(features)
    for dy in range(-rv, rv + 1):
        wgt = jnp.where(dyk == dy, 1.0 - bw, 0.0) + jnp.where(
            dyk == dy - 1, bw, 0.0
        )
        g = g + wgt * jax.lax.dynamic_slice_in_dim(fp, rv + dy, h, axis=1)

    u0 = jnp.floor(su)
    aw = (su - u0)[..., None]
    dxk = (u0 - u).astype(jnp.int32)[..., None]
    gp = jnp.pad(g, ((0, 0), (0, 0), (rh, rh), (0, 0)))
    out = jnp.zeros_like(features)
    for dx in range(-rh, rh + 1):
        wgt = jnp.where(dxk == dx, 1.0 - aw, 0.0) + jnp.where(
            dxk == dx - 1, aw, 0.0
        )
        out = out + wgt * jax.lax.dynamic_slice_in_dim(gp, rh + dx, w, axis=2)

    return jnp.where(inside[..., None], out, 0.0)


def correlation(
    f1: jnp.ndarray, f2: jnp.ndarray, search_range: int = 4
) -> jnp.ndarray:
    """Local cost volume: (B, H, W, (2r+1)^2) of mean channel dot products
    between f1(x) and f2(x + offset) for every offset in the window.

    The PWC-Net correlation layer (max displacement r, stride 1). The shift
    is realized by padding+slicing so each offset is one fused
    multiply-reduce over the channel (lane) dimension.
    """
    b, h, w, c = f1.shape
    r = search_range
    f2p = jnp.pad(f2, ((0, 0), (r, r), (r, r), (0, 0)))
    outputs = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = f2p[:, r + dy : r + dy + h, r + dx : r + dx + w, :]
            outputs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outputs, axis=-1)


def resize_bilinear(x: jnp.ndarray, size) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) to (B, size[0], size[1], C)."""
    import jax

    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear")


def upsample_flow_2x(flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsampling of a flow field, scaling the vectors by 2."""
    _, h, w, _ = flow.shape
    return resize_bilinear(flow, (h * 2, w * 2)) * 2.0


def space_to_batch(x: jnp.ndarray, d: int):
    """Split (B, H, W, C) into d*d phase-subsampled grids on the batch axis.

    A SAME 3x3 convolution with kernel dilation d over the original image
    equals a SAME 3x3 dense convolution over each of the d*d subgrids
    (output pixel (i, j) reads x[i + k*d, j + l*d], which within subgrid
    (i%d, j%d) is its dense 8-neighborhood; zero padding beyond the image
    matches the subgrid's SAME padding). Returns the (B*d*d, ceil(H/d),
    ceil(W/d), C) batch plus the original (H, W) for batch_to_space.
    """
    b, h, w, c = x.shape
    ph = (-h) % d
    pw = (-w) % d
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // d, d, wp // d, d, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b * d * d, hp // d, wp // d, c), (h, w)


def batch_to_space(x: jnp.ndarray, d: int, hw) -> jnp.ndarray:
    """Inverse of space_to_batch (crops the padding back off)."""
    h, w = hw
    bdd, hs, ws, c = x.shape
    b = bdd // (d * d)
    x = x.reshape(b, d, d, hs, ws, c)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, hs * d, ws * d, c)
    return x[:, :h, :w]
