"""Validate the Pallas whole-image CC kernel on the REAL chip.

Interpret-mode equality is already covered by tests/test_clustering_pallas.py;
this script checks the Mosaic-compiled kernel (dynamic rotates, packed bit
planes) against the XLA oracle with EXACT label equality, then chain-times
both backends (see utils/profiling.chain_slope_ms for why single dispatches
cannot be timed over the tunnel).

Usage: python scripts/validate_cc.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from moving_object_detector_tpu.ops.clustering import connected_components
from moving_object_detector_tpu.ops.clustering_pallas import (
    connected_components_pallas,
)
from moving_object_detector_tpu.utils.profiling import chain_slope_ms

DD = 0.15
K = 4
ITERS = 64


def random_scene(seed, h, w, p_dyn=0.3, n_planes=3):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    dynamic = jax.random.uniform(k1, (h, w)) < p_dyn
    depth = jnp.round(jax.random.uniform(k2, (h, w)) * n_planes) * 1.0 + 2.0
    return dynamic, depth


def blob_scene(h, w):
    """Busy-but-plausible frame: a few rectangular objects + speckle."""
    rng = np.random.default_rng(7)
    dynamic = rng.uniform(size=(h, w)) < 0.02
    depth = np.full((h, w), np.nan, np.float32)
    depth[dynamic] = rng.uniform(2, 20, dynamic.sum()).astype(np.float32)
    for _ in range(12):
        v = rng.integers(0, h - 40)
        u = rng.integers(0, w - 80)
        bh = rng.integers(20, 90)
        bw = rng.integers(30, 160)
        z = rng.uniform(2, 20)
        dynamic[v : v + bh, u : u + bw] = True
        depth[v : v + bh, u : u + bw] = z + rng.uniform(
            -0.05, 0.05, (min(bh, h - v), min(bw, w - u))
        ).astype(np.float32)
    return jnp.asarray(dynamic), jnp.asarray(depth)


def check(name, dynamic, depth):
    ref = np.asarray(
        connected_components(dynamic, depth, jnp.float32(DD), K, ITERS)
    )
    out = np.asarray(
        connected_components_pallas(dynamic, depth, jnp.float32(DD), K, ITERS)
    )
    ok = np.array_equal(out, ref)
    ncomp = len(np.unique(ref)) - 1
    print(f"{name:32s} equal={ok}  components={ncomp}", flush=True)
    if not ok:
        bad = np.argwhere(out != ref)
        print(f"  MISMATCH at {bad.shape[0]} px, first {bad[:5].tolist()}")
        print(f"  ref {ref[tuple(bad[0])]}, pallas {out[tuple(bad[0])]}")
    return ok


def time_backend(name, fn, dynamic, depth):
    # Carry the label image back into the depth so the chain is data-
    # dependent and nothing is DCE'd.
    def step(carry):
        dyn, z = carry
        lab = fn(dyn, z, jnp.float32(DD), K, ITERS)
        return dyn, z + 1e-20 * lab.astype(jnp.float32)

    ms = chain_slope_ms(step, (dynamic, depth), 6, 30)
    print(f"{name:32s} {ms:8.3f} ms/frame", flush=True)
    return ms


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    ok = True
    for seed in (0, 1):
        d, z = random_scene(seed, 376, 1242)
        ok &= check(f"random 376x1242 seed={seed}", d, z)
    d, z = random_scene(2, 250, 700)
    ok &= check("random 250x700 (odd pad)", d, z)
    bd, bz = blob_scene(376, 1242)
    ok &= check("blobs 376x1242", bd, bz)
    if not ok:
        print("FAILED: pallas CC does not match the XLA oracle")
        sys.exit(1)

    time_backend("xla CC (busy blobs)", connected_components, bd, bz)
    time_backend("pallas CC (busy blobs)", connected_components_pallas, bd, bz)
    rd, rz = random_scene(0, 376, 1242)
    time_backend("xla CC (random 30%)", connected_components, rd, rz)
    time_backend("pallas CC (random 30%)", connected_components_pallas, rd, rz)
    print("OK")


if __name__ == "__main__":
    main()
