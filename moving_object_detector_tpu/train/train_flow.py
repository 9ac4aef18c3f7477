"""Flow-network training CLI.

The training story the reference lacks (its PWC-Net weights are a frozen
caffemodel symlink, dockerfile:108-111): train/finetune the Flax PWC-Net on
synthetic warped pairs (self-contained) or on .npz datasets with
ground-truth flow, with dp(+tp) mesh sharding and orbax checkpoints.

Example:
    python -m moving_object_detector_tpu.train.train_flow \
        --steps 200 --batch 8 --height 192 --width 448 \
        --checkpoint /tmp/pwc_ckpt
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint directory to save params")
    p.add_argument("--resume", default=None,
                   help="checkpoint to resume params from")
    p.add_argument("--dataset", default=None,
                   help=".npz with img1/img2/flow arrays; default: on-device"
                        " layered-scene generator (train/data_synth.py)")
    p.add_argument("--roll-data", action="store_true",
                   help="use the trivial host-side random-roll pairs instead"
                        " of the on-device generator")
    p.add_argument("--chunk", type=int, default=50,
                   help="train steps fused into one dispatch (on-device data"
                        " only); amortizes the tunnel round trip")
    p.add_argument("--n-objects", type=int, default=4,
                   help="moving objects per generated scene")
    p.add_argument("--max-shift", type=float, default=24.0,
                   help="max object translation (px) in generated scenes")
    p.add_argument("--bg-max-shift", type=float, default=10.0,
                   help="max background translation (px)")
    p.add_argument("--real-frac", type=float, default=0.0,
                   help="fraction of texture draws taken from the real-"
                        "photo bank (tests/fixtures/real_textures.npz) — "
                        "natural image statistics; 0 keeps the historical "
                        "procedural-only distribution")
    p.add_argument("--downsample-frac", type=float, default=0.0,
                   help="fraction of each batch drawn from the scale-2 "
                        "serving distribution (generate_pair_scale2): "
                        "scenes rendered at 2x and pushed through the "
                        "flow_input_scale=2 downsample")
    p.add_argument("--local-motion-frac", type=float, default=0.0,
                   help="fraction of samples from the LOCAL-MOTION regime "
                        "(near-static background + guaranteed-moving "
                        "objects, half hard-edged rectangles under pure "
                        "translation) — the measured pwc_v5 blind spot: "
                        "~2 px under-tracking of locally moving objects "
                        "on real textures (data_synth.generate_pair)")
    p.add_argument("--motion-contrast", type=float, default=0.0,
                   help="loss up-weighting of independently-moving pixels "
                        "(flow_trainer.motion_contrast_weights): 0 = "
                        "uniform mean EPE; N weights a saturated moving "
                        "pixel (1+N)x a background pixel. Counters the "
                        "~2 px local-motion plateau: an object at ~7%% "
                        "of frame area contributes ~0.14 px to uniform "
                        "mean EPE")
    p.add_argument("--pool", type=int, default=0,
                   help="fixed scene pool size (0 = fresh data each step);"
                        " bootstrap curriculum for from-scratch training")
    p.add_argument("--warmup", type=int, default=500,
                   help="linear LR warmup steps (cosine decay afterwards)")
    p.add_argument("--constant-lr", action="store_true",
                   help="disable the warmup+cosine schedule")
    p.add_argument("--save-every", type=int, default=0,
                   help="also checkpoint every N steps (0 = only at the end)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--estimator-channels", default=None,
                   help="comma ints: FlowEstimator decoder widths "
                        "(slim variants, PLAN_NEXT item 2)")
    p.add_argument("--context-channels", default=None,
                   help="comma ints: ContextNetwork widths")
    p.add_argument("--color", action="store_true",
                   help="train a 3-channel (RGB) net on colorized "
                        "synthetic data (FlowNetConfig.in_channels=3; "
                        "PipelineConfig.color serving path)")
    p.add_argument("--tiny", action="store_true",
                   help="small network for smoke runs")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import numpy as np

    from ..config import FlowNetConfig
    from ..models.pwc_net import PWCNet
    from ..parallel.mesh import create_mesh
    from .flow_trainer import (
        create_train_state,
        make_chunked_train_step,
        make_sharded_train_step,
        synthetic_flow_batch,
    )

    cfg = (
        FlowNetConfig(feature_channels=(8, 16, 32), search_range=2,
                      use_context_net=False, dtype="float32")
        if args.tiny
        else FlowNetConfig()
    )
    if args.color:
        import dataclasses

        cfg = dataclasses.replace(cfg, in_channels=3)
    if args.estimator_channels:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            estimator_channels=tuple(
                int(c) for c in args.estimator_channels.split(",")
            ),
        )
    if args.context_channels:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            context_channels=tuple(
                int(c) for c in args.context_channels.split(",")
            ),
        )
    if args.resume:
        # The checkpoint's kernel shapes define the architecture; width
        # flags must agree (a mismatched resume fails shape asserts below).
        from ..utils.checkpoint import load_flow_checkpoint

        _, cfg = load_flow_checkpoint(args.resume, base_config=cfg)
    model = PWCNet(config=cfg)
    state, tx = create_train_state(
        model, args.height, args.width, learning_rate=args.lr,
        key=jax.random.PRNGKey(args.seed),
        total_steps=None if args.constant_lr else args.steps,
        warmup_steps=args.warmup,
    )
    if args.resume:
        from ..utils.checkpoint import restore_flow_params

        state = state.replace(
            params=restore_flow_params(args.resume, like=state.params)
        )

    n_dev = jax.device_count()
    mesh = create_mesh(n_dev, model_parallel=args.model_parallel)

    def save(st, tag=""):
        if not args.checkpoint:
            return
        from ..utils.checkpoint import save_flow_params

        save_flow_params(args.checkpoint + tag, jax.device_get(st.params))
        print(f"saved params to {args.checkpoint}{tag}", file=sys.stderr)

    t0 = time.time()
    if args.dataset is None and not args.roll_data:
        # On-device data + chunked steps: one dispatch per `chunk` steps.
        chunk = max(1, min(args.chunk, args.steps))
        step_fn, state = make_chunked_train_step(
            model, tx, mesh, state, args.height, args.width, args.batch,
            chunk, n_objects=args.n_objects, max_shift=args.max_shift,
            bg_max_shift=args.bg_max_shift, pool=args.pool,
            downsample_frac=args.downsample_frac, real_frac=args.real_frac,
            local_motion_frac=args.local_motion_frac,
            motion_contrast=args.motion_contrast,
        )
        key = jax.random.PRNGKey(args.seed + 1)
        with mesh:
            done = 0
            while done < args.steps:
                key, sub = jax.random.split(key)
                state, metrics = step_fn(state, sub)
                done += chunk
                print(
                    f"step {done:6d} loss {float(metrics['loss']):.4f} "
                    f"epe {float(metrics['epe']):.3f} "
                    f"({(time.time() - t0):.1f}s)",
                    flush=True,
                )
                if args.save_every and done % args.save_every < chunk:
                    save(state, tag=f".step{done}")
        save(state)
        return 0

    step_fn, state = make_sharded_train_step(model, tx, mesh, state)

    rng = np.random.default_rng(args.seed)
    data = np.load(args.dataset) if args.dataset else None

    def next_batch():
        if data is None:
            return synthetic_flow_batch(rng, args.batch, args.height, args.width)
        import jax.numpy as jnp

        n = data["img1"].shape[0]
        idx = rng.integers(0, n, args.batch)
        return {
            "img1": jnp.asarray(data["img1"][idx]),
            "img2": jnp.asarray(data["img2"][idx]),
            "flow": jnp.asarray(data["flow"][idx]),
        }

    with mesh:
        for k in range(args.steps):
            state, metrics = step_fn(state, next_batch())
            if k % args.log_every == 0 or k == args.steps - 1:
                print(
                    f"step {k:5d} loss {float(metrics['loss']):.4f} "
                    f"epe {float(metrics['epe']):.3f} "
                    f"({(time.time() - t0):.1f}s)",
                    flush=True,
                )

    save(state)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
