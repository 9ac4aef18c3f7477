"""Integral-channel-features toolkit — kkl/cvk/* equivalent.

Channel extraction (HSV, LUV, oriented-gradient histograms), integral
images, and normalized box filters (the ICF building blocks of
icf_channel_extractor.hpp / icf_channel_bank.hpp / icf_integral_filter.hpp),
plus the cvutils.hpp palette/rect helpers.

TPU shape conventions: images are (H, W) or (H, W, 3) float32 in [0, 1];
extractors return (C, H, W) channel stacks (a fixed channel axis instead of
the reference's std::vector<cv::Mat>); box filters take fractional ROIs so
a feature definition is resolution-independent, exactly like
IntegralFilter (icf_integral_filter.hpp:13-27). Many ROIs evaluate in one
shot via vmap — the reference's per-filter virtual call loop becomes one
batched 4-corner gather.

The gradient channels keep float magnitudes instead of the reference's
8-bit quantization (icf_channel_extractor.hpp:128-148) — a precision
improvement, not a semantic change.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Color channel extractors (icf_channel_extractor.hpp)
# ---------------------------------------------------------------------------


def rgb_to_gray(rgb: jnp.ndarray) -> jnp.ndarray:
    """BT.601 luma, OpenCV's BGR2GRAY weights."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def extract_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) hue/sat/val channels (ChannelExtractorHSV,
    icf_channel_extractor.hpp:42-64) in OpenCV's 8-bit ranges:
    H in [0, 180), S and V in [0, 255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r,
        (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, jnp.mod(h * 60.0, 360.0), 0.0)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h / 2.0, s * 255.0, v * 255.0])


def extract_luv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(3, H, W) CIE L*u*v* channels (ChannelExtractorLUV,
    icf_channel_extractor.hpp:69-91), with OpenCV's 8-bit scaling
    (L*255/100, (u+134)*255/354, (v+140)*255/262)."""
    rgb_lin = jnp.where(
        rgb <= 0.04045, rgb / 12.92, ((rgb + 0.055) / 1.055) ** 2.4
    )
    r, g, b = rgb_lin[..., 0], rgb_lin[..., 1], rgb_lin[..., 2]
    x = 0.412453 * r + 0.357580 * g + 0.180423 * b
    y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    l = jnp.where(
        y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y
    )
    denom = x + 15.0 * y + 3.0 * z
    safe = jnp.where(denom > 0, denom, 1.0)
    u_p = jnp.where(denom > 0, 4.0 * x / safe, 0.0)
    v_p = jnp.where(denom > 0, 9.0 * y / safe, 0.0)
    # white point (D65): u'n = 0.19793943, v'n = 0.46831096
    u = 13.0 * l * (u_p - 0.19793943)
    v = 13.0 * l * (v_p - 0.46831096)
    return jnp.stack(
        [
            l * 255.0 / 100.0,
            (u + 134.0) * 255.0 / 354.0,
            (v + 140.0) * 255.0 / 262.0,
        ]
    )


def _sobel(gray: jnp.ndarray):
    """3x3 Sobel dx, dy (replicate-padded, OpenCV BORDER_REFLECT_101 is
    the reference's default; edge pixels rarely feed ICF features so the
    simpler 'edge' pad is used)."""
    g = jnp.pad(gray, 1, mode="edge")
    kx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]
    )
    ky = kx.T
    windows = jnp.stack(
        [
            g[dy : dy + gray.shape[0], dx : dx + gray.shape[1]]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=-1,
    )
    dx = windows @ kx.ravel()
    dy = windows @ ky.ravel()
    return dx, dy


def extract_grads(gray: jnp.ndarray, n_bins: int = 6) -> jnp.ndarray:
    """(n_bins + 1, H, W) oriented-gradient channels
    (ChannelExtractorGrads, icf_channel_extractor.hpp:96-153): channel k
    holds the gradient magnitude where the orientation falls in bin k of
    [0, pi) (the reference folds [pi, 2pi) onto [0, pi) via its subs
    table), and the last channel is the unbinned magnitude."""
    dx, dy = _sobel(gray)
    mag = jnp.sqrt(dx * dx + dy * dy)
    ang = jnp.mod(jnp.arctan2(dy, dx), 2.0 * jnp.pi)  # [0, 2pi)
    idx = jnp.mod(
        (ang * (n_bins / jnp.pi)).astype(jnp.int32), n_bins
    )
    binned = jax.nn.one_hot(idx, n_bins, axis=0) * mag[None]
    return jnp.concatenate([binned, mag[None]], axis=0)


def channel_bank(
    extractors: Sequence[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Compose extractors into one (C_total, H, W) stack (ChannelBank,
    icf_channel_bank.hpp:16-56). Each extractor takes (rgb, gray)."""

    def extract(rgb: jnp.ndarray) -> jnp.ndarray:
        gray = rgb_to_gray(rgb)
        return jnp.concatenate([e(rgb, gray) for e in extractors], axis=0)

    return extract


def default_channel_bank() -> Callable[[jnp.ndarray], jnp.ndarray]:
    """HSV + LUV + 6-bin gradients: the standard 13-channel ICF bank."""
    return channel_bank(
        [
            lambda rgb, gray: extract_hsv(rgb),
            lambda rgb, gray: extract_luv(rgb),
            lambda rgb, gray: extract_grads(gray),
        ]
    )


# ---------------------------------------------------------------------------
# Integral images and box filters (icf_integral_filter.hpp)
# ---------------------------------------------------------------------------


def integral_image(img: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 2D prefix sum over the LAST TWO axes (any leading channel
    axes vectorize for free)."""
    return jnp.cumsum(jnp.cumsum(img, axis=-2), axis=-1)


def box_filter(integral: jnp.ndarray, tl, size) -> jnp.ndarray:
    """Mean of pixel values in a fractional ROI via the 4-corner identity
    (IntegralFilter::filter, icf_integral_filter.hpp:35-49): ``tl`` and
    ``size`` in [0, 1] image fractions; pixel rects with width or height
    <= 2 return 0 exactly as the reference does. Works on (..., H, W)
    integral stacks; ``tl``/``size`` may be traced scalars."""
    h, w = integral.shape[-2], integral.shape[-1]
    tl = jnp.asarray(tl, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    x0 = (tl[0] * w).astype(jnp.int32)
    y0 = (tl[1] * h).astype(jnp.int32)
    rw = (size[0] * w).astype(jnp.int32)
    rh = (size[1] * h).astype(jnp.int32)

    def corner(y, x):
        ok = (y >= 0) & (x >= 0)
        yc = jnp.clip(y, 0, h - 1)
        xc = jnp.clip(x, 0, w - 1)
        return jnp.where(ok, integral[..., yc, xc], 0.0)

    a = corner(y0 - 1, x0 - 1)
    c = corner(y0 - 1, x0 - 1 + rw)
    b = corner(y0 - 1 + rh, x0 - 1)
    d = corner(y0 - 1 + rh, x0 - 1 + rw)
    mean = (d - b - c + a) / (rw * rh).astype(jnp.float32)
    return jnp.where((rw <= 2) | (rh <= 2), 0.0, mean)


def box_filter_bank(integral: jnp.ndarray, tls, sizes) -> jnp.ndarray:
    """Evaluate N fractional ROIs ((N, 2) each) over a (..., H, W)
    integral stack in one vmapped pass -> (N, ...) feature responses: the
    whole ICF feature vector of a window in one call."""
    return jax.vmap(lambda t, s: box_filter(integral, t, s))(
        jnp.asarray(tls, jnp.float32), jnp.asarray(sizes, jnp.float32)
    )


# ---------------------------------------------------------------------------
# cvutils.hpp helpers
# ---------------------------------------------------------------------------


def create_color_palette(n: int, scale: float = 255.0) -> np.ndarray:
    """(n, 3) RGB palette of evenly spread hues at s=v=220
    (cvutils.hpp:10-25); host-side helper for visualization."""
    h = (180.0 / (n + 1)) * np.arange(n) * 2.0  # OpenCV H*2 = degrees
    s = np.full(n, 220.0 / 255.0)
    v = np.full(n, 220.0 / 255.0)
    c = v * s
    hp = h / 60.0
    xcomp = c * (1.0 - np.abs(np.mod(hp, 2.0) - 1.0))
    zeros = np.zeros(n)
    sector = np.floor(hp).astype(int) % 6
    rgb_opts = np.stack(
        [
            np.stack([c, xcomp, zeros], 1),
            np.stack([xcomp, c, zeros], 1),
            np.stack([zeros, c, xcomp], 1),
            np.stack([zeros, xcomp, c], 1),
            np.stack([xcomp, zeros, c], 1),
            np.stack([c, zeros, xcomp], 1),
        ],
        axis=0,
    )
    rgb = rgb_opts[sector, np.arange(n)] + (v - c)[:, None]
    return rgb * scale


def clip_roi(rect, size):
    """Clamp (x, y, w, h) to (W, H) bounds (cvutils.hpp:27-33)."""
    x, y, w, h = rect
    width, height = size
    left, top = max(0, x), max(0, y)
    right, bottom = min(width, x + w), min(height, y + h)
    return (left, top, right - left, bottom - top)


def enlarge_rect(rect, scale: float):
    """Scale a rect about its center (cvutils.hpp:35-38)."""
    x, y, w, h = rect
    d = (scale - 1.0) / 2.0
    return (x - w * d, y - h * d, w * scale, h * scale)


def shift_rect(rect, pt):
    """Translate a rect (cvutils.hpp:40-42)."""
    x, y, w, h = rect
    return (x + pt[0], y + pt[1], w, h)
