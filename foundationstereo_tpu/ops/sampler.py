"""1D bilinear disparity lookup (the reference's grid_sample replacement).

The reference samples its filtered cost volume and all-pairs correlation with
``F.grid_sample`` over degenerate (H==1) grids (core/utils/utils.py:44-55,
core/geometry.py:43-65). On TPU a general 2D grid_sample is wasteful — the
access pattern is a pure 1D gather + lerp along the disparity/width axis, so we
implement exactly that: per-pixel fractional coordinates, two taps, zero for
out-of-range taps (torch ``padding_mode='zeros'`` with ``align_corners=True``
over pixel coordinates is an identity mapping, so no renormalization needed).

Differentiable w.r.t. both the volume and the coordinates.
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_1d_lerp(vol: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample ``vol`` at fractional positions ``x`` along its last axis.

    Args:
      vol: (..., L) values.
      x:   (..., K) fractional sample positions in pixel units [0, L-1]; the
           leading axes must broadcast against ``vol``'s leading axes.

    Returns:
      broadcast(..., K) sampled values; taps outside [0, L-1] contribute zero
      (matching grid_sample's zero padding_mode).
    """
    L = vol.shape[-1]
    lead = jnp.broadcast_shapes(vol.shape[:-1], x.shape[:-1])
    vol = jnp.broadcast_to(vol, lead + vol.shape[-1:])
    x = jnp.broadcast_to(x, lead + x.shape[-1:])

    x0f = jnp.floor(x)
    w1 = (x - x0f).astype(vol.dtype)
    x0 = x0f.astype(jnp.int32)

    def tap(idx):
        valid = (idx >= 0) & (idx <= L - 1)
        idxc = jnp.clip(idx, 0, L - 1)
        v = jnp.take_along_axis(vol, idxc, axis=-1)
        return jnp.where(valid, v, jnp.zeros_like(v))

    return tap(x0) * (1.0 - w1) + tap(x0 + 1) * w1


def disparity_lookup(
    geo_pyramid: list[jnp.ndarray],
    corr_pyramid: list[jnp.ndarray],
    disp: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Gather geometry-encoding + all-pairs-correlation features at ``disp``.

    TPU-native equivalent of ``Combined_Geo_Encoding_Volume.__call__``
    (core/geometry.py:43-65), channel-last.

    Args:
      geo_pyramid: list over levels of (B, H, W, C, D_l) filtered-volume
        pyramids (disparity axis last, pre-pooled by 2**level).
      corr_pyramid: list over levels of (B, H, W, W_l) all-pairs correlation
        pyramids (right-image x axis last, pre-pooled by 2**level).
      disp: (B, H, W) current disparity at 1/4 resolution.
      radius: lookup radius r (2r+1 taps per level).

    Returns:
      (B, H, W, num_levels * (2r+1) * (C+1)) lookup features, fp32, ordered
      [geo_l0, corr_l0, geo_l1, corr_l1, ...] with geo channels C-major /
      taps-fastest — matching the reference's concatenation order.
    """
    num_levels = len(geo_pyramid)
    b, h, w = disp.shape
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)  # (2r+1,)
    coords = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1,1,W) left-x
    disp = disp.astype(jnp.float32)

    out = []
    for i in range(num_levels):
        scale = 1.0 / (2.0 ** i)
        # Volume lookup: positions disp/2^i + dx along the disparity axis.
        x_geo = disp[..., None] * scale + dx            # (B,H,W,K)
        g = gather_1d_lerp(geo_pyramid[i], x_geo[..., None, :])  # (B,H,W,C,K)
        g = g.reshape(b, h, w, -1)
        # Correlation lookup: right-image x = (x_left - disp)/2^i + dx.
        x_corr = (coords - disp) * scale
        x_corr = x_corr[..., None] + dx                 # (B,H,W,K)
        c = gather_1d_lerp(corr_pyramid[i], x_corr)
        out.append(g.astype(jnp.float32))
        out.append(c.astype(jnp.float32))
    return jnp.concatenate(out, axis=-1)


def pool_last_axis(x: jnp.ndarray, times: int) -> list[jnp.ndarray]:
    """Average-pool the last axis by 2, ``times`` times; returns all levels.

    Matches ``F.avg_pool2d(x, [1,2], stride=[1,2])`` applied repeatedly
    (core/geometry.py:34-40): floor semantics, trailing odd element dropped.
    """
    levels = [x]
    for _ in range(times):
        L = x.shape[-1] // 2
        x = x[..., : 2 * L].reshape(x.shape[:-1] + (L, 2)).mean(axis=-1)
        levels.append(x)
    return levels
