"""1D bilinear disparity lookup (the reference's grid_sample replacement).

The reference samples its filtered cost volume and all-pairs correlation with
``F.grid_sample`` over degenerate (H==1) grids (core/utils/utils.py:44-55,
core/geometry.py:43-65). On TPU a general grid_sample — or any per-element
gather along a minor axis — is pathologically slow, so the lookup is
expressed gather-free as a **tent-weight contraction**:

    sample(vol, x) = sum_d vol[d] * max(0, 1 - |x - d|)

The tent kernel reproduces bilinear interpolation with zero padding exactly
(out-of-range taps contribute nothing, matching torch padding_mode='zeros'
with align_corners=True over pixel coordinates), turns the lookup into a
dense einsum that XLA fuses onto the vector/matrix units, and is trivially
differentiable w.r.t. both the volume and the coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tent_weights(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Bilinear interpolation weights as a dense (..., length, K) tensor.

    x: (..., K) fractional sample positions. weight[..., d, k] =
    max(0, 1 - |x_k - d|): exactly the two-tap lerp with zero out-of-range.
    """
    d = jnp.arange(length, dtype=x.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None, :] - d[:, None]))


def gather_1d_lerp(vol: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample ``vol`` at fractional positions ``x`` along its last axis.

    Args:
      vol: (..., L) values.
      x:   (..., K) fractional sample positions in pixel units [0, L-1]; the
           leading axes must broadcast against ``vol``'s leading axes.

    Returns:
      broadcast(..., K) sampled values; positions outside [0, L-1] blend
      with zero (grid_sample zero padding_mode semantics).
    """
    L = vol.shape[-1]
    w = tent_weights(x.astype(jnp.float32), L).astype(vol.dtype)  # (..., L, K)
    # Broadcast-multiply-reduce (NOT einsum/dot_general: XLA would pad these
    # tiny batched matmuls to full MXU tiles). This fuses into one VPU pass
    # that reads `vol` once and keeps the tent weights unmaterialized.
    return jnp.sum(vol[..., :, None] * w, axis=-2)


def disparity_lookup(
    geo_pyramid: list[jnp.ndarray],
    corr_pyramid: list[jnp.ndarray],
    disp: jnp.ndarray,
    radius: int,
) -> jnp.ndarray:
    """Gather geometry-encoding + all-pairs-correlation features at ``disp``.

    TPU-native equivalent of ``Combined_Geo_Encoding_Volume.__call__``
    (core/geometry.py:43-65), channel-last and gather-free: per level, one
    tent-weight tensor (B,H,W,D_l,K) contracts both the C-channel filtered
    volume and the 1-channel correlation.

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
    coords = jnp.arange(w, dtype=jnp.float32)[None, None, :]  # (1,1,W) left-x
    disp = disp.astype(jnp.float32)

    r = radius
    K = 2 * r + 1

    def level_lookup(vol, x):
        """vol (..., D), x (...,) base positions -> (..., K) tap samples.

        Per-tap static shifts of one extended tent row: tap k's weights are
        Text[d + r - k], so each tap is a fused multiply-reduce over D with
        no >5D intermediate (keeps XLA from materializing a (…, D, K) or
        (…, C, D, K) tensor).
        """
        D = vol.shape[-1]
        dgrid = jnp.arange(-r, D + r, dtype=jnp.float32)        # (D+2r,)
        text = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - dgrid))
        volf = vol.astype(jnp.float32)
        taps = []
        for k in range(-r, r + 1):
            t_k = jax.lax.slice_in_dim(text, r - k, r - k + D, axis=-1)
            taps.append(jnp.sum(volf * t_k, axis=-1))
        return jnp.stack(taps, axis=-1)                          # (..., K)

    out = []
    for i in range(num_levels):
        scale = 1.0 / (2.0 ** i)
        geo = geo_pyramid[i]          # (B,H,W,C,D)
        corr = corr_pyramid[i]        # (B,H,W,W2)
        g = level_lookup(geo, (disp * scale)[..., None])         # (B,H,W,C,K)
        out.append(g.reshape(b, h, w, -1))
        c = level_lookup(corr, (coords - disp) * scale)          # (B,H,W,K)
        out.append(c)
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
