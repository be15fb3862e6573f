"""Disparity regression, convex upsampling, and pooling primitives.

Channel-last equivalents of the reference's ``disparity_regression``
(core/submodule.py:431-435), ``context_upsample`` (core/submodule.py:456-468)
and ``pool2x`` (core/update.py:72-73).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def disparity_regression(prob: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Soft-argmin: (B, D, H, W) probabilities -> (B, H, W) expected disparity."""
    d = jnp.arange(maxdisp, dtype=prob.dtype).reshape(1, maxdisp, 1, 1)
    return jnp.sum(prob * d, axis=1)


def unfold3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 zero-padded patch extraction: (B, H, W) -> (B, H, W, 9).

    Tap order is row-major over (dy, dx) in {-1,0,1}^2, matching
    ``F.unfold(x, 3, padding=1)`` channel ordering for a 1-channel input.
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    h, w = x.shape[1], x.shape[2]
    taps = [xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]
    return jnp.stack(taps, axis=-1)


def nearest_up4(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 4x nearest upsampling of (B, H, W, C) -> (B, 4H, 4W, C)."""
    x = jnp.repeat(x, 4, axis=1)
    return jnp.repeat(x, 4, axis=2)


def context_upsample(disp_low: jnp.ndarray, up_weights: jnp.ndarray) -> jnp.ndarray:
    """Convex 1/4 -> full-res upsampling.

    Args:
      disp_low: (B, H, W) disparity at 1/4 resolution (already scaled by 4).
      up_weights: (B, 4H, 4W, 9) softmax weights.

    Returns:
      (B, 4H, 4W) upsampled disparity.

    Accumulates tap-by-tap instead of materializing the (B, 4H, 4W, 9)
    nearest-upsampled patch stack: XLA tiles the minor axis to 128 lanes, so
    a full-res 9-minor tensor occupies ~14x its logical bytes in HBM — that
    stack was the difference between ViT-L training fitting and OOM.
    """
    b, h, w = disp_low.shape
    xp = jnp.pad(disp_low, ((0, 0), (1, 1), (1, 1)))
    acc = jnp.zeros((b, 4 * h, 4 * w), disp_low.dtype)
    k = 0
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy : dy + h, dx : dx + w]          # (B,H,W)
            tap_up = jnp.repeat(jnp.repeat(tap, 4, axis=1), 4, axis=2)
            acc = acc + tap_up * up_weights[..., k]
            k += 1
    return acc


def context_upsample_phased(disp_low: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Convex upsampling from phase-decomposed weights (no 9-minor tensors).

    Args:
      disp_low: (B, h, w) disparity at 1/4 resolution (already scaled by 4).
      weights: (B, 4, 9, 2h, 2w) softmax weights — the spx deconv's output
        phases p=(a,b) at the half-res grid, where the full-res weight at
        pixel (2Y+a, 2X+b) is ``weights[:, 2a+b, :, Y, X]``.

    Returns:
      (B, 4h, 4w) upsampled disparity, equal to :func:`context_upsample` on
      the interleaved weights.

    Rationale: the interleaved formulation materializes (B, 4h, 4w, 9)
    tensors whose 9-lane minor axis pads ~14x in TPU tiled layouts; here
    every tensor keeps spatial axes minor. Since (2Y+a)//4 == Y//2 for
    a in {0,1}, all four phases of a half-res pixel read the SAME 3x3
    disparity taps, so one repeat-2x tap grid serves every phase.
    """
    b, h, w = disp_low.shape
    xp = jnp.pad(disp_low, ((0, 0), (1, 1), (1, 1)))
    # Per-phase accumulators: every tensor inside the tap loop is a plain
    # (B, 2h, 2w) array. The earlier `tap2[:, None] * weights[:, :, k]`
    # broadcast form made the chipless AOT compiler (round-5 environment)
    # materialize the backward cotangent as f32[B,4,1,2h,2w] with the SIZE-1
    # axis minormost — a 139x tile-padding expansion, 2.7 GB per buffer, and
    # a train-step compile OOM. No broadcast (size-1) dims -> no such layout.
    accs = [jnp.zeros((b, 2 * h, 2 * w), disp_low.dtype) for _ in range(4)]
    k = 0
    for dy in range(3):
        for dx in range(3):
            tap = xp[:, dy : dy + h, dx : dx + w]             # (B,h,w)
            tap2 = jnp.repeat(jnp.repeat(tap, 2, axis=1), 2, axis=2)
            for p in range(4):
                accs[p] = accs[p] + tap2 * weights[:, p, k]
            k += 1
    # Interleave phases: out[2Y+a, 2X+b] = acc[b, 2a+b, Y, X].
    acc = jnp.stack(accs, axis=1).reshape(b, 2, 2, 2 * h, 2 * w)
    return acc.transpose(0, 3, 1, 4, 2).reshape(b, 4 * h, 4 * w)


def avg_pool2d(x: jnp.ndarray, kernel: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """``F.avg_pool2d`` with count_include_pad=True on (B, H, W, C).

    Implemented as a sum of k*k strided slices (differentiable, fuses into a
    single XLA kernel; avoids reduce_window's autodiff limitations).
    """
    h, w = x.shape[1], x.shape[2]
    oh = (h + 2 * padding - kernel) // stride + 1
    ow = (w + 2 * padding - kernel) // stride + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    out = None
    for dy in range(kernel):
        for dx in range(kernel):
            tap = xp[:, dy : dy + stride * (oh - 1) + 1 : stride,
                     dx : dx + stride * (ow - 1) + 1 : stride]
            out = tap if out is None else out + tap
    return out / (kernel * kernel)
