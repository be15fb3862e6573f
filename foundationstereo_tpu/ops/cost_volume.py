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

import jax.numpy as jnp
import numpy as np


def group_normalize(feat: jnp.ndarray, num_groups: int, eps: float = 1e-12) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H,W,G,C/G), L2-normalized within each group (fp32)."""
    b, h, w, c = feat.shape
    assert c % num_groups == 0, f"C={c} not divisible by groups={num_groups}"
    x = feat.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _band_gather_index(block: int, maxdisp: int, num_right_blocks: int) -> jnp.ndarray:
    """(T, D) index into the (nr+1)*T right-window axis: j = nr*T + t - d."""
    t = np.arange(block)[:, None]
    d = np.arange(maxdisp)[None, :]
    return jnp.asarray((num_right_blocks - 1) * block + t - d, dtype=jnp.int32)


def build_gwc_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    maxdisp: int,
    num_groups: int,
    block: int = 128,
) -> jnp.ndarray:
    """Group-wise correlation volume.

    gwc[b, d, h, w, g] = <Ln[b,h,w,g,:], Rn[b,h,w-d,g,:]>, 0 where w < d —
    identical semantics to ``build_gwc_volume`` (core/submodule.py:399-412)
    modulo layout (theirs: (B, G, D, H, W)).

    Args:
      left/right: (B, H, W, C) features.
      maxdisp: D (disparity bins at this resolution).
      num_groups: G.
      block: width tile size for the banded matmul.

    Returns:
      (B, D, H, W, G) fp32 volume.
    """
    b, h, w, c = left.shape
    t = min(block, w)
    nb = -(-w // t)                      # ceil: number of width blocks
    nr = max(1, -(-(maxdisp - 1) // t))  # right-context blocks (>=1)
    wp = nb * t

    ln = group_normalize(left, num_groups)    # (B,H,W,G,Cg)
    rn = group_normalize(right, num_groups)
    cg = c // num_groups

    pad_w = wp - w
    ln = jnp.pad(ln, ((0, 0), (0, 0), (0, pad_w), (0, 0), (0, 0)))
    # Right features need nr*T zero context on the left (w-d < 0 -> 0).
    rn = jnp.pad(rn, ((0, 0), (0, 0), (nr * t, pad_w), (0, 0), (0, 0)))

    lb = ln.reshape(b, h, nb, t, num_groups, cg)
    rblk = rn.reshape(b, h, nb + nr, t, num_groups, cg)
    # Window of nr+1 consecutive right blocks per left block.
    rwin = jnp.concatenate(
        [rblk[:, :, k : k + nb].reshape(b, h, nb, 1, t, num_groups, cg)
         for k in range(nr + 1)],
        axis=3,
    )  # (B,H,nb,nr+1,T,G,Cg)
    rwin = rwin.reshape(b, h, nb, (nr + 1) * t, num_groups, cg)

    # Banded matmul on the MXU: contract Cg per (batch,row,block,group).
    corr = jnp.einsum("bhntgc,bhnugc->bhngtu", lb, rwin,
                      preferred_element_type=jnp.float32)  # (B,H,nb,G,T,U)

    j = _band_gather_index(t, maxdisp, nr + 1)  # (T,D)
    band = jnp.take_along_axis(
        corr, j[None, None, None, None, :, :], axis=-1
    )  # (B,H,nb,G,T,D)
    vol = band.transpose(0, 5, 1, 2, 4, 3).reshape(b, maxdisp, h, wp, num_groups)
    return vol[:, :, :, :w, :]


def build_concat_volume(left: jnp.ndarray, right: jnp.ndarray, maxdisp: int) -> jnp.ndarray:
    """Concatenation volume (core/submodule.py:416-427), channel-last.

    out[b,d,h,w,:C] = left[b,h,w]; out[b,d,h,w,C:] = right[b,h,w-d] (0 if w<d).

    Returns (B, D, H, W, 2C) in the input dtype.
    """
    b, h, w, c = left.shape
    wi = jnp.arange(w)[None, :]               # (1, W)
    di = jnp.arange(maxdisp)[:, None]         # (D, 1)
    idx = wi - di                             # (D, W)
    valid = (idx >= 0)
    idxc = jnp.clip(idx, 0, w - 1)
    shifted = jnp.take_along_axis(
        right[:, None],                       # (B,1,H,W,C)
        idxc[None, :, None, :, None],         # (1,D,1,W,1)
        axis=3,
    )                                         # (B,D,H,W,C)
    shifted = jnp.where(valid[None, :, None, :, None], shifted, jnp.zeros_like(shifted))
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
