#!/usr/bin/env python
"""Generate a synthetic FSD-format stereo dataset for throughput/training
runs without real data.

Layout (reference contract, train/dataloader.py:51-64 + Utils.py:137-140):
  <out>/left/rgb/*.jpg  <out>/right/rgb/*.jpg  <out>/left/disparity/*.png
with 3-channel base-255 uint8 disparity encoding. Images are textured noise
(Gaussian blobs + gradients) so JPEG/aug paths see non-degenerate content;
the right view is the left warped by the disparity (nearest), so the data is
geometrically self-consistent enough for loss curves to move.

Usage: python scripts/make_synth_data.py --out /tmp/fsd_synth --n 32 \
         --height 512 --width 960 --max_disp 160
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from foundationstereo_tpu.utils.misc import depth_uint8_encoding  # noqa: E402


def make_pair(rng, h, w, max_disp):
    # Textured left image: low-frequency blobs + per-pixel noise.
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(12):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        s = rng.uniform(h / 12, h / 3)
        blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
        img += blob[..., None] * rng.uniform(40, 160, 3)
    img += rng.normal(0, 12, (h, w, 3))
    img += (xx / w * rng.uniform(-40, 40))[..., None]
    img = np.clip(img, 0, 255)

    # Smooth disparity field: plane + blobs, positive, < max_disp.
    disp = rng.uniform(4, max_disp * 0.3) + (1 - yy / h) * rng.uniform(0, max_disp * 0.3)
    for _ in range(4):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        s = rng.uniform(h / 8, h / 2)
        disp = disp + np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)) \
            * rng.uniform(0, max_disp * 0.4)
    disp = np.clip(disp, 0.5, max_disp - 1).astype(np.float32)

    # Right view: left warped by disparity (nearest; occlusions ignored).
    xs = np.clip((xx - disp).round().astype(np.int64), 0, w - 1)
    right = img[np.arange(h)[:, None], xs]
    return img.astype(np.uint8), right.astype(np.uint8), disp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--max_disp", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    for sub in ("left/rgb", "right/rgb", "left/disparity"):
        (out / sub).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        left, right, disp = make_pair(rng, args.height, args.width, args.max_disp)
        Image.fromarray(left).save(out / "left/rgb" / f"{i:05d}.jpg", quality=92)
        Image.fromarray(right).save(out / "right/rgb" / f"{i:05d}.jpg", quality=92)
        Image.fromarray(depth_uint8_encoding(disp)).save(
            out / "left/disparity" / f"{i:05d}.png")
    print(f"wrote {args.n} pairs to {out}")


if __name__ == "__main__":
    main()
