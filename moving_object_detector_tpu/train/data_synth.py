"""On-device synthetic optical-flow training data (FlyingChairs-style).

The reference ships frozen PWC-Net Caffe weights (dockerfile:108-111); this
framework trains its own (SURVEY.md §7 step 7: "architecture parity +
retuned weights"). Since the build environment has no flow dataset, training
data is *generated on the TPU itself*: layered scenes — a textured
background under K textured ellipse "objects", every layer moving by its own
random affine map — rendered twice with the analytic ground-truth flow of
the topmost layer at each pixel. Everything (multi-octave value-noise
textures, affine inverse-warps, soft-edged masks, photometric jitter) is
pure JAX under jit/vmap, so batch generation fuses into the training step
and the host feeds nothing but PRNG keys.

Flow convention matches the model/pipeline: img1(x) ~ img2(x + flow(x))
(the PWC warp layer's backward-sampling contract, ops/flow_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import flow_ops


def _octave_texture(key, h: int, w: int, octaves: int = 5) -> jnp.ndarray:
    """Multi-octave value noise in [0, 1]: random coarse grids, bilinearly
    upsampled and summed with 1/2^k amplitudes.

    The coarsest octaves are randomly suppressed (~30% of textures keep
    only fine structure): fine-only textures — checkerboard-like dumps,
    Gazebo's tiled walls, the repo's own SyntheticStereoSequence — average
    to uniform gray at the top pyramid levels, and a net trained only on
    coarse-structured textures hallucinates multi-pixel flow there
    (measured: 36% of static pixels over the 5 px dynamic gate on the CLI
    synthetic scene). Suppression teaches "uninformative coarse level =>
    near-zero coarse flow"."""
    keys = jax.random.split(key, octaves + 1)
    out = jnp.zeros((h, w), jnp.float32)
    amp_total = 0.0
    # With p=0.3, zero the amplitudes of the `cut` coarsest octaves.
    drop_key, cut_key = jax.random.split(keys[octaves])
    do_drop = jax.random.uniform(drop_key, ()) < 0.3
    cut = jax.random.randint(cut_key, (), 1, max(2, octaves - 1))
    for k in range(octaves):
        gh = max(2, h // (2 ** (octaves - k + 1)))
        gw = max(2, w // (2 ** (octaves - k + 1)))
        grid = jax.random.uniform(keys[k], (gh, gw), jnp.float32)
        amp = jnp.float32(1.0 / (2**k))
        amp = jnp.where(do_drop & (k < cut), 0.0, amp)
        out = out + amp * jax.image.resize(grid, (h, w), "bilinear")
        amp_total = amp_total + amp
    return out / jnp.maximum(amp_total, 1e-6)


def _smooth3(t: jnp.ndarray) -> jnp.ndarray:
    """Separable 3-tap [0.25, 0.5, 0.25] blur with edge padding."""
    p = jnp.pad(t, ((1, 1), (0, 0)), mode="edge")
    t = 0.25 * p[:-2] + 0.5 * p[1:-1] + 0.25 * p[2:]
    p = jnp.pad(t, ((0, 0), (1, 1)), mode="edge")
    return 0.25 * p[:, :-2] + 0.5 * p[:, 1:-1] + 0.25 * p[:, 2:]


def _cell_texture(key, h: int, w: int) -> jnp.ndarray:
    """Cell-quantized "blocky" texture: random values nearest-neighbor
    upsampled by a per-sample integer cell size (2-8 px), then blended a
    random amount toward a 3-tap blur.

    This family covers sharp, piecewise-constant, man-made imagery (tiles,
    checkerboards, brick, screens) that octave value-noise cannot: its
    gradients are ~10x stronger and concentrated on cell boundaries.
    Measured gap it closes: a net trained on octave noise alone recovers a
    6 px block motion on octave textures exactly (median u 6.19) but is
    blind to the SAME motion on cell textures (median u 1.13) — the
    end-to-end detection-quality gate failure of the pwc_v3 retrain."""
    kg, kc, ks = jax.random.split(key, 3)
    grid = jax.random.uniform(
        kg, (h // 2 + 1, w // 2 + 1), jnp.float32, 0.05, 0.95
    )
    cell = jax.random.randint(kc, (), 2, 9)
    tex = grid[jnp.arange(h) // cell][:, jnp.arange(w) // cell]
    s = jax.random.uniform(ks, ())
    return (1.0 - s) * tex + s * _smooth3(tex)


# ---------------------------------------------------------------------------
# Real-photo texture bank
# ---------------------------------------------------------------------------
# Procedural textures (octave noise + cell quantization) cover synthetic
# imagery but NOT natural photographs: weights trained on them alone
# hallucinate flow on real photos (measured 2026-08-19 on pwc_v4e: 60.9% of
# static pixels over the 5 px gate / median 6.0 px on a real photograph,
# tests/test_real_imagery.py). The bank holds real grayscale photos
# (tests/fixtures/real_textures.npz — foliage, architecture, skin), tiled to
# a fixed canvas so jit-static random crops/zooms sample natural image
# statistics at several scales.

_REAL_BANK = None
_REAL_BANK_HW = (1024, 1920)


def _real_bank():
    """(N, 1024, 1920) f32 photo canvas as a HOST numpy array (a device
    array cached at trace time would leak a tracer into the module global);
    lazily loaded; None if the fixture is unavailable."""
    global _REAL_BANK
    if _REAL_BANK is None:
        import os

        import numpy as np

        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            "tests", "fixtures", "real_textures.npz",
        )
        if not os.path.exists(path):
            _REAL_BANK = False
            return None
        data = np.load(path)
        bh, bw = _REAL_BANK_HW
        canvases = []
        for k in data.files:
            if k.startswith("heldout_"):
                # Held-out photos back the NON-circular real-imagery
                # tests (tests/test_real_imagery.py); training never
                # sees them.
                continue
            img = data[k].astype(np.float32) / 255.0
            ry = -(-bh // img.shape[0])
            rx = -(-bw // img.shape[1])
            canvases.append(np.tile(img, (ry, rx))[:bh, :bw])
        _REAL_BANK = np.stack(canvases)
    return None if _REAL_BANK is False else _REAL_BANK


def _real_texture(key, h: int, w: int) -> jnp.ndarray:
    """Random crop of a random real photo, with random 2x zoom-out (when the
    canvas allows), flips and photometric jitter. Requires h/w to fit the
    bank canvas."""
    bank = jnp.asarray(_real_bank())
    n, bh, bw = bank.shape
    ki, ky, kx, kz, kfl, kfu, kg, kv = jax.random.split(key, 8)
    photo = bank[jax.random.randint(ki, (), 0, n)]
    can_zoom = 2 * h <= bh and 2 * w <= bw
    ch, cw = (2 * h, 2 * w) if can_zoom else (h, w)
    y0 = jax.random.randint(ky, (), 0, bh - ch + 1)
    x0 = jax.random.randint(kx, (), 0, bw - cw + 1)
    crop = jax.lax.dynamic_slice(photo, (y0, x0), (ch, cw))
    if can_zoom:
        # 50% zoomed-out view (downsampled 2x crop): natural statistics at
        # two scales, including the scale-2 serving regime.
        tex = jnp.where(
            jax.random.uniform(kz, ()) < 0.5,
            jax.image.resize(crop, (h, w), "bilinear"),
            crop[:h, :w],
        )
    else:
        tex = crop
    tex = jnp.where(jax.random.uniform(kfl, ()) < 0.5, tex[:, ::-1], tex)
    tex = jnp.where(jax.random.uniform(kfu, ()) < 0.5, tex[::-1], tex)
    # Photometric: random gamma + 15% value inversion.
    gamma = jnp.exp(jax.random.uniform(kg, (), minval=-0.4, maxval=0.4))
    tex = jnp.clip(tex, 1e-4, 1.0) ** gamma
    return jnp.where(jax.random.uniform(kv, ()) < 0.15, 1.0 - tex, tex)


def _any_texture(key, h: int, w: int, real_frac: float = 0.0) -> jnp.ndarray:
    """Texture sampler: multi-octave value noise (smooth, synthetic) /
    cell-quantized (sharp, man-made) / real photographs (natural,
    ``real_frac`` of samples when the bank is available). Branch-free for
    jit/vmap. ``real_frac`` is STATIC: the default 0 keeps the historical
    distribution (the held-out gate batches in tests/test_flow_quality.py
    stay fixed); training recipes opt in (scripts/finetune_flow_real.sh).
    The non-real remainder splits 65/35 octave/cell."""
    kp, ko, kc, kr = jax.random.split(key, 4)
    u = jax.random.uniform(kp, ())
    base = jnp.where(
        u < 0.35 * (1.0 - real_frac),
        _cell_texture(kc, h, w),
        _octave_texture(ko, h, w),
    )
    if real_frac <= 0.0 or _real_bank() is None or min(h, w) < 8:
        return base
    return jnp.where(u >= 1.0 - real_frac, _real_texture(kr, h, w), base)


def _rand_affine(key, h, w, max_shift, max_rot, max_log_scale):
    """Random similarity map phi: img1 coords -> img2 coords, about the
    image center. Returns the 2x2 linear part and translation (as (2,)
    arrays) of phi."""
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (), minval=-max_rot, maxval=max_rot)
    s = jnp.exp(
        jax.random.uniform(k2, (), minval=-max_log_scale, maxval=max_log_scale)
    )
    t = jax.random.uniform(k3, (2,), minval=-max_shift, maxval=max_shift)
    c, sn = jnp.cos(theta), jnp.sin(theta)
    lin = s * jnp.array([[c, -sn], [sn, c]], jnp.float32)  # (2, 2) on (x, y)
    center = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0], jnp.float32)
    # phi(p) = lin @ (p - center) + center + t
    trans = center + t - lin @ center
    return lin, trans


def _apply_affine(lin, trans, xy):
    """xy: (..., 2) as (x, y). Returns phi(xy)."""
    return xy @ lin.T + trans


def _grid_xy(h, w):
    x = jnp.arange(w, dtype=jnp.float32)[None, :, None]
    y = jnp.arange(h, dtype=jnp.float32)[:, None, None]
    return jnp.concatenate(
        [jnp.broadcast_to(x, (h, w, 1)), jnp.broadcast_to(y, (h, w, 1))],
        axis=-1,
    )  # (h, w, 2)


def _invert_affine(lin, trans):
    inv = jnp.linalg.inv(lin)
    return inv, -inv @ trans


def _ellipse_mask(xy, center, radii, angle, soft: float = 1.0):
    """Soft ellipse indicator evaluated at xy (..., 2)."""
    c, sn = jnp.cos(angle), jnp.sin(angle)
    rel = xy - center
    u = (rel[..., 0] * c + rel[..., 1] * sn) / radii[0]
    v = (-rel[..., 0] * sn + rel[..., 1] * c) / radii[1]
    d = jnp.sqrt(u * u + v * v + 1e-9)
    return jax.nn.sigmoid((1.0 - d) * radii.min() / soft)


def _rect_mask(xy, center, radii, angle, soft: float = 1.0):
    """Soft rotated-rectangle indicator (Chebyshev-norm analog of
    _ellipse_mask): real moving objects — and the serving scenes' planar
    blocks — have straight, hard silhouette edges that the ellipse-only
    mask family under-trains."""
    c, sn = jnp.cos(angle), jnp.sin(angle)
    rel = xy - center
    u = (rel[..., 0] * c + rel[..., 1] * sn) / radii[0]
    v = (-rel[..., 0] * sn + rel[..., 1] * c) / radii[1]
    d = jnp.maximum(jnp.abs(u), jnp.abs(v))
    return jax.nn.sigmoid((1.0 - d) * radii.min() / soft)


def _colorize(key, gray):
    """(h, w) gray -> (h, w, 3) RGB: a random global tint plus two smooth
    spatial chroma fields. The committed texture banks are grayscale-only,
    so RGB training data carries SYNTHETIC chroma — enough to teach the
    net to exploit chroma contrast for matching (two same-luma regions
    become distinguishable), though real-color validation remains blocked
    on real RGB imagery."""
    h, w = gray.shape
    kt, ks1, ks2 = jax.random.split(key, 3)
    tint = jax.random.uniform(kt, (3,), minval=0.75, maxval=1.25)
    m_r = _octave_texture(ks1, h, w, octaves=3)
    m_b = _octave_texture(ks2, h, w, octaves=3)
    mod = jnp.stack(
        [1.0 + 0.3 * (m_r - 0.5), jnp.ones_like(gray),
         1.0 + 0.3 * (m_b - 0.5)],
        axis=-1,
    )
    return jnp.clip(gray[..., None] * tint * mod, 0.0, 1.0)


@partial(jax.jit, static_argnames=(
    "h", "w", "n_objects", "real_frac", "local_motion_frac", "channels"))
def generate_pair(
    key,
    h: int,
    w: int,
    n_objects: int = 4,
    max_shift: float = 24.0,
    bg_max_shift: float = 10.0,
    real_frac: float = 0.0,
    local_motion_frac: float = 0.0,
    channels: int = 1,
):
    """One (img1, img2, flow) training example, all on device.

    img*: (h, w, channels) f32 in [0, 1]; flow: (h, w, 2) forward flow in
    pixels. channels=3 colorizes every texture with synthetic chroma
    (_colorize) for RGB flow-net training (FlowNetConfig.in_channels=3).

    ``local_motion_frac``: fraction of samples drawn from the LOCAL-MOTION
    regime — a near-static background with guaranteed-moving objects, half
    of them hard-edged rectangles under pure translation. This is the
    serving distribution of the detection task itself (a mostly-stationary
    camera watching an independently moving object,
    scene_flow_constructor.cpp:196-209's dynamic test), and the measured
    blind spot of the v5 curriculum: on real-photo paste probes the net
    under-tracked a locally-moving 100x64 px rectangle by ~2 px at every
    shift (2026-08-20, /tmp/probe_paste), costing ~0.4 m/s of end-to-end
    velocity accuracy. 0.0 reproduces the v5 stream bit-for-bit.
    """
    keys = jax.random.split(key, 5 + 3 * n_objects)
    xy = _grid_xy(h, w)

    # --- per-sample global magnitude mixture ---
    # Scaling every motion bound by mag ~ U[0,1] (with a 10% exactly-static
    # floor) keeps small AND zero motion in-distribution at every curriculum
    # stage. Without it, a large-max_shift stage teaches a large-flow prior
    # that resurfaces as hallucinated flow wherever the image is
    # uninformative (measured: the stage-B shift-48 retrain regressed the
    # static fine-texture spurious rate from 0.0% back to 43.4%).
    if local_motion_frac > 0:
        kmag, kstat, klm, kbg2 = jax.random.split(keys[4], 4)
        is_local = jax.random.uniform(klm, ()) < local_motion_frac
        # Local-motion samples: background barely moves (scale U[0,0.2]),
        # objects are guaranteed non-static.
        bg_scale = jnp.where(
            is_local, jax.random.uniform(kbg2, ()) * 0.2, 1.0
        )
    else:
        kmag, kstat = jax.random.split(keys[4])
        is_local = jnp.bool_(False)
        bg_scale = jnp.float32(1.0)
    mag = jax.random.uniform(kmag, ())
    mag = jnp.where(jax.random.uniform(kstat, ()) < 0.1, 0.0, mag)
    # Local-regime object magnitude: LOG-uniform over [0.04, 1.0] of
    # max_shift (e.g. 4.5..112 px at max_shift=112, ~40% below 20 px).
    # The earlier floor max(mag, 0.4) never generated object shifts
    # below 0.4*max_shift, so the small-local-motion serving regime (a
    # 1-3 m/s object at 5-10 m is 5-20 px/frame) was entirely absent
    # from the local samples — the paste-probe band where pwc_v6m still
    # missed the gate (0.99/1.63/1.75 px at shifts 6/10/16).
    kobj = jax.random.fold_in(kmag, 1)
    log_mag = jax.random.uniform(
        kobj, (), minval=jnp.log(0.04), maxval=0.0
    )
    obj_mag = jnp.where(is_local, jnp.exp(log_mag), mag)
    bg_mag = mag * bg_scale

    # --- background layer ---
    bg_tex = _any_texture(keys[0], h, w, real_frac)
    bg_tex = (
        _colorize(jax.random.fold_in(keys[0], 17), bg_tex)
        if channels == 3 else bg_tex[..., None]
    )
    bg_lin, bg_trans = _rand_affine(
        keys[1], h, w, bg_mag * bg_max_shift, bg_mag * 0.05, bg_mag * 0.05
    )

    img1 = bg_tex
    # Flow of the background at every pixel (overwritten by objects on top).
    flow = _apply_affine(bg_lin, bg_trans, xy) - xy

    # img2 background: img2(y) = img1(phi^-1(y)) -> backward warp by
    # (phi^-1(y) - y), which is exactly the warp layer's contract.
    inv_lin, inv_trans = _invert_affine(bg_lin, bg_trans)
    bg_back = _apply_affine(inv_lin, inv_trans, xy) - xy
    img2 = flow_ops.warp(bg_tex[None], bg_back[None])[0]

    # --- object layers (later objects composite on top) ---
    min_dim = min(h, w)
    for i in range(n_objects):
        kt, kp, km = keys[5 + 3 * i : 8 + 3 * i]
        tex = _any_texture(kt, h, w, real_frac)
        tex = (
            _colorize(jax.random.fold_in(kt, 17), tex)
            if channels == 3 else tex[..., None]
        )
        lin, trans = _rand_affine(
            kp, h, w, obj_mag * max_shift, obj_mag * 0.3, obj_mag * 0.15
        )

        if local_motion_frac > 0:
            pk = jax.random.split(km, 7)
            # Half the local-regime objects move by PURE TRANSLATION (the
            # fronto-parallel planar-object serving case: img2's object is
            # an exactly shifted copy of img1's).
            pure = is_local & (jax.random.uniform(pk[4], ()) < 0.5)
            t_pure = jax.random.uniform(
                pk[5], (2,),
                minval=-obj_mag * max_shift, maxval=obj_mag * max_shift,
            )
            lin = jnp.where(pure, jnp.eye(2, dtype=jnp.float32), lin)
            trans = jnp.where(pure, t_pure, trans)
            # Half are hard-edged rectangles instead of ellipses.
            use_rect = is_local & (jax.random.uniform(pk[6], ()) < 0.5)
        else:
            pk = jax.random.split(km, 4)
            use_rect = jnp.bool_(False)
        center = jax.random.uniform(
            pk[0], (2,),
            minval=jnp.array([0.15 * w, 0.15 * h]),
            maxval=jnp.array([0.85 * w, 0.85 * h]),
        )
        radii = jax.random.uniform(
            pk[1], (2,), minval=0.06 * min_dim, maxval=0.22 * min_dim
        )
        angle = jax.random.uniform(pk[2], (), minval=0.0, maxval=3.14159)
        # Randomize boundary sharpness: real objects (and the synthetic
        # scene's block) have hard edges; soft-only masks under-train the
        # motion-boundary response.
        soft = jax.random.uniform(pk[3], (), minval=0.25, maxval=1.5)

        def _mask(at):
            ell = _ellipse_mask(at, center, radii, angle, soft)
            if local_motion_frac <= 0:
                return ell
            rect = _rect_mask(at, center, radii, angle, soft)
            return jnp.where(use_rect, rect, ell)

        m1 = _mask(xy)  # mask in img1
        obj_flow = _apply_affine(lin, trans, xy) - xy

        img1 = m1[..., None] * tex + (1.0 - m1[..., None]) * img1
        flow = m1[..., None] * obj_flow + (1.0 - m1[..., None]) * flow

        # In img2 the object (texture AND mask) lives at phi(object):
        # evaluate both at phi^-1(y).
        ilin, itrans = _invert_affine(lin, trans)
        src = _apply_affine(ilin, itrans, xy)
        m2 = _mask(src)
        tex2 = flow_ops.warp(tex[None], (src - xy)[None])[0]
        img2 = m2[..., None] * tex2 + (1.0 - m2[..., None]) * img2

    # --- photometric jitter + sensor noise (robustness) ---
    jk1, jk2 = jax.random.split(keys[2])
    gain = jax.random.uniform(jk1, (), minval=0.85, maxval=1.15)
    bias = jax.random.uniform(jk2, (), minval=-0.08, maxval=0.08)
    if channels == 1:
        # Shape kept exactly as the v5-era generator: same key -> same
        # noise bits (training streams stay reproducible across versions).
        noise = 0.015 * jax.random.normal(keys[3], (h, w, 2))[..., None]
    else:
        noise = 0.015 * jax.random.normal(keys[3], (h, w, 2, channels))
    img2 = jnp.clip(img2 * gain + bias + noise[..., 1, :], 0.0, 1.0)
    img1 = jnp.clip(img1 + noise[..., 0, :], 0.0, 1.0)

    return img1, img2, flow


@partial(jax.jit, static_argnames=(
    "h", "w", "n_objects", "real_frac", "local_motion_frac", "channels"))
def generate_pair_scale2(
    key,
    h: int,
    w: int,
    n_objects: int = 4,
    max_shift: float = 24.0,
    bg_max_shift: float = 10.0,
    real_frac: float = 0.0,
    local_motion_frac: float = 0.0,
    channels: int = 1,
):
    """One example matching the ``flow_input_scale=2`` SERVING distribution
    (pipeline._flow_forward): generate the scene at (2h, 2w) with doubled
    motion bounds, then push images through the exact serving downsample
    (antialiased ``jax.image.resize`` bilinear) and halve the flow.

    At serving scale 2 the net sees ``resize(full_res_frame, 1/2)`` and must
    predict ``flow_full(2x)/2``; nets trained only on natively generated
    (h, w) scenes fail that distribution (pwc_v4 measured: EPE 1.06 at
    scale 1 but 19.4 at scale 2 on the held-out batch) because downsampled
    texture statistics — antialiased cells, halved gradients — are out of
    distribution. ``max_shift`` bounds are in OUTPUT (half-res) pixels, so
    curricula compose unchanged with generate_pair."""
    img1, img2, flow = generate_pair(
        key, 2 * h, 2 * w, n_objects, 2.0 * max_shift, 2.0 * bg_max_shift,
        real_frac, local_motion_frac, channels,
    )
    img1 = jax.image.resize(img1, (h, w, channels), "bilinear")
    img2 = jax.image.resize(img2, (h, w, channels), "bilinear")
    flow = jax.image.resize(flow, (h, w, 2), "bilinear") * 0.5
    return img1, img2, flow


@partial(
    jax.jit,
    static_argnames=(
        "batch", "h", "w", "n_objects", "downsample_frac", "real_frac",
        "local_motion_frac", "channels",
    ),
)
def generate_batch(
    key,
    batch: int,
    h: int,
    w: int,
    n_objects: int = 4,
    max_shift: float = 24.0,
    bg_max_shift: float = 10.0,
    downsample_frac: float = 0.0,
    real_frac: float = 0.0,
    local_motion_frac: float = 0.0,
    channels: int = 1,
):
    """dict(img1, img2, flow) with a leading batch axis, generated on
    device — drop-in for the training loop's batch source. ``max_shift`` /
    ``bg_max_shift`` bound the object/background translations (curriculum
    knob: train small motions first). ``downsample_frac`` of the batch
    (rounded, static) is drawn from the scale-2 serving distribution
    (generate_pair_scale2) so the ``flow_input_scale=2`` knob stays in
    distribution."""
    n_ds = int(round(batch * float(downsample_frac)))
    keys = jax.random.split(key, batch)
    parts = []
    if batch - n_ds > 0:
        parts.append(
            jax.vmap(
                lambda k: generate_pair(
                    k, h, w, n_objects, max_shift, bg_max_shift, real_frac,
                    local_motion_frac, channels,
                )
            )(keys[: batch - n_ds])
        )
    if n_ds > 0:
        parts.append(
            jax.vmap(
                lambda k: generate_pair_scale2(
                    k, h, w, n_objects, max_shift, bg_max_shift, real_frac,
                    local_motion_frac, channels,
                )
            )(keys[batch - n_ds:])
        )
    img1, img2, flow = (
        parts[0]
        if len(parts) == 1
        else tuple(
            jnp.concatenate([a, b], axis=0) for a, b in zip(*parts)
        )
    )
    return {"img1": img1, "img2": img2, "flow": flow}
