"""Build tests/fixtures/real_textures.npz from real photographs shipped
with system packages (sklearn's china/flower, matplotlib's grace_hopper).

The reference pipeline ran on live ZED imagery (README.md:9,
detect_with_zed.launch:4-5); this repo's flow/SGM quality numbers were
historically scored only on the train/data_synth.py generator family. These
REAL photographic textures (natural gradients, foliage, skin, architecture
— none of it from any synthetic generator) back the regression tests in
tests/test_real_imagery.py: static-scene spurious flow, known-shift flow
recovery, constant-disparity stereo, and end-to-end detection on real
textures.

Run once to (re)generate the committed fixture:
    python scripts/make_real_fixtures.py
"""
import os
import sys

import numpy as np

SOURCES = {
    "china": "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/"
             "images/china.jpg",
    "flower": "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/"
              "images/flower.jpg",
    "hopper": "/opt/venv/lib/python3.12/site-packages/matplotlib/"
              "mpl-data/sample_data/grace_hopper.jpg",
    # HELD-OUT real photos (pygame docs/examples: a webcam indoor scene
    # and two outdoor photographs). The ``heldout_`` prefix EXCLUDES them
    # from the training texture bank (train/data_synth._real_bank), so
    # the real-imagery tests that use them score texture statistics the
    # net never trained on — non-circular real-data validation.
    "heldout_camera": "/opt/venv/lib/python3.12/site-packages/pygame/"
                      "docs/generated/_images/camera_rgb.jpg",
    "heldout_blade": "/opt/venv/lib/python3.12/site-packages/pygame/"
                     "docs/generated/_images/intro_blade.jpg",
    "heldout_freedom": "/opt/venv/lib/python3.12/site-packages/pygame/"
                       "docs/generated/_images/intro_freedom.jpg",
}


def main():
    from PIL import Image

    out = {}
    for name, path in SOURCES.items():
        if not os.path.exists(path):
            print(f"missing {path}; skipping {name}", file=sys.stderr)
            continue
        rgb = np.asarray(Image.open(path), dtype=np.float32) / 255.0
        gray = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                + 0.114 * rgb[..., 2])
        out[name] = np.round(gray * 255.0).astype(np.uint8)
        print(f"{name}: {out[name].shape}")
    dest = os.path.join(os.path.dirname(__file__), "..", "tests",
                        "fixtures", "real_textures.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {os.path.abspath(dest)} "
          f"({os.path.getsize(dest) / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
