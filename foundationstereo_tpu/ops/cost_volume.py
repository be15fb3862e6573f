"""Cost-volume construction, TPU-first.

Replaces the reference's Python-loop-over-disparity builders
(core/submodule.py:388-427) with banded block-matmul formulations that keep
the MXU busy and avoid ragged per-shift slices:

* group-wise correlation: per-pixel-row banded matmul between L2-normalized
  left/right feature blocks, then a static band gather;
* concat volume: width-shifted gather of the projected right feature;
* all-pairs correlation: one einsum (core/geometry.py:68-77).

All functions are channel-last. Volumes come out as (B, D, H, W, C) — NDHWC —
with correlation performed in fp32 regardless of input dtype (the reference
forces fp32 here too: core/submodule.py:394, core/geometry.py:74).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def group_normalize(feat: jnp.ndarray, num_groups: int, eps: float = 1e-12) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W,G,C/G), L2-normalized within each group (fp32)."""
    b, h, w, c = feat.shape
    assert c % num_groups == 0, f"C={c} not divisible by groups={num_groups}"
    x = feat.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _shifted_right(right: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """(B,H,W,C) -> (D,B,H,W,C) where out[d,...,w,:] = right[...,w-d,:] (0 if w<d).

    Implemented as a lax.scan of dynamic width-slices over a zero-padded
    buffer — TPU gathers on the width axis are pathologically slow, while
    dynamic slices of contiguous rows are fast and the scan body compiles
    once regardless of D.
    """
    b, h, w, c = right.shape
    rp = jnp.pad(right, ((0, 0), (0, 0), (maxdisp, 0), (0, 0)))

    def body(_, d):
        sl = jax.lax.dynamic_slice_in_dim(rp, maxdisp - d, w, axis=2)
        return None, sl

    _, out = jax.lax.scan(body, None, jnp.arange(maxdisp))
    return out  # (D,B,H,W,C)


def build_gwc_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    maxdisp: int,
    num_groups: int,
) -> jnp.ndarray:
    """Group-wise correlation volume.

    gwc[b, d, h, w, g] = <Ln[b,h,w,g,:], Rn[b,h,w-d,g,:]>, 0 where w < d —
    identical semantics to ``build_gwc_volume`` (core/submodule.py:399-412)
    modulo layout (theirs: (B, G, D, H, W)).

    The disparity sweep is a lax.scan whose body multiplies the normalized
    left features with a width-shifted right slice and reduces per group —
    no gathers, one compiled body. (A Pallas kernel that keeps feature tiles
    in VMEM across the sweep is the SoL version of this op.)

    Args:
      left/right: (B, H, W, C) features.

    Returns:
      (B, D, H, W, G) fp32 volume.
    """
    b, h, w, c = left.shape
    cg = c // num_groups
    ln = group_normalize(left, num_groups)    # (B,H,W,G,Cg) fp32
    rn = group_normalize(right, num_groups)
    rp = jnp.pad(rn.reshape(b, h, w, c), ((0, 0), (0, 0), (maxdisp, 0), (0, 0)))

    def body(_, d):
        sl = jax.lax.dynamic_slice_in_dim(rp, maxdisp - d, w, axis=2)
        sl = sl.reshape(b, h, w, num_groups, cg)
        return None, jnp.sum(ln * sl, axis=-1)  # (B,H,W,G)

    _, vol = jax.lax.scan(body, None, jnp.arange(maxdisp))
    return vol.transpose(1, 0, 2, 3, 4)  # (B,D,H,W,G)


def build_concat_volume(left: jnp.ndarray, right: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Concatenation volume (core/submodule.py:416-427), channel-last.

    out[b,d,h,w,:C] = left[b,h,w]; out[b,d,h,w,C:] = right[b,h,w-d] (0 if w<d).

    Returns (B, D, H, W, 2C) in the input dtype.
    """
    b, h, w, c = left.shape
    shifted = _shifted_right(right, maxdisp).transpose(1, 0, 2, 3, 4)  # (B,D,H,W,C)
    left_b = jnp.broadcast_to(left[:, None], (b, maxdisp, h, w, c))
    return jnp.concatenate([left_b, shifted], axis=-1)


def all_pairs_correlation(left: jnp.ndarray, right: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """All-pairs width correlation of channel-normalized features (fp32).

    Equivalent to ``Combined_Geo_Encoding_Volume.corr`` (core/geometry.py:68-77):
    corr[b,h,w1,w2] = <Ln[b,h,w1,:], Rn[b,h,w2,:]> with full-channel L2 norm.

    Returns (B, H, W1, W2).
    """
    ln = group_normalize(left, 1, eps)[..., 0, :]   # (B,H,W,C) fp32
    rn = group_normalize(right, 1, eps)[..., 0, :]
    return jnp.einsum("bhwc,bhvc->bhwv", ln, rn, preferred_element_type=jnp.float32)
