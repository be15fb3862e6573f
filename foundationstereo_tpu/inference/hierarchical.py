"""Hierarchical (coarse-to-fine two-pass) inference
(core/foundation_stereo.py:257-274).

For >1K-px inputs: run the full pipeline at ``small_ratio`` resolution,
upsample the disparity, and feed it (at 1/4 grid, /4 value scale, with the
left-pad offset) as ``init_disp`` into a full-resolution pass — skipping the
soft-argmin initialization there.

Runs as two separately jitted programs (different shapes), host-composed.
"""

from __future__ import annotations

import jax.numpy as jnp

from foundationstereo_tpu.ops.pad import InputPadder
from foundationstereo_tpu.ops.resize import resize2d


def run_hierarchical(apply_fn, left, right, iters: int = 32,
                     small_ratio: float = 0.5):
    """apply_fn(left, right, iters, init_disp) -> (B, H, W) disparity.

    left/right: (B, H, W, 3) float RGB 0-255 (any size; padded internally).
    """
    B, H, W, _ = left.shape
    h_s, w_s = int(H * small_ratio), int(W * small_ratio)
    left_small = resize2d(left, (h_s, w_s), "bilinear", align_corners=False)
    right_small = resize2d(right, (h_s, w_s), "bilinear", align_corners=False)

    padder_s = InputPadder(left_small.shape, divis_by=32)
    ls, rs = padder_s.pad(left_small, right_small)
    disp_small = apply_fn(ls, rs, iters, None)                      # (B, h', w')
    disp_small = padder_s.unpad(disp_small[..., None])[..., 0]
    disp_up = resize2d(disp_small[..., None], (H, W), "bilinear",
                       align_corners=True)[..., 0] / small_ratio
    disp_up = jnp.clip(disp_up, 0.0, None)

    padder = InputPadder(left.shape, divis_by=32)
    lf, rf, disp_up = padder.pad(left, right, disp_up[..., None])
    disp_up = disp_up[..., 0] + padder.pad_left
    hp, wp = lf.shape[1], lf.shape[2]
    init_disp = resize2d(disp_up[..., None], (hp // 4, wp // 4), "bilinear",
                         align_corners=True)[..., 0] * 0.25
    disp = apply_fn(lf, rf, iters, init_disp)
    return padder.unpad(disp[..., None])[..., 0]
