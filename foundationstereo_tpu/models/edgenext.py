"""EdgeNeXt-S CNN pyramid (flax, NHWC) — the trainable unary trunk.

The reference takes ``timm.create_model('edgenext_small', pretrained=True)``
and uses only ``stem`` + ``stages`` (core/extractor.py:327-329, 358-362).
This is a from-scratch TPU implementation of that trunk following the
EdgeNeXt architecture (ConvNeXt-style conv encoders + split-depthwise
transpose-attention "SDTA" global blocks with cross-covariance attention):

* stem: 4x4/4 conv + LayerNorm
* stages: dims (48, 96, 160, 304), depths (3, 3, 9, 3), 2x2/2 downsampling
  between stages; the last block of stages 2-4 is an SDTA encoder
* per-stage depthwise kernel sizes (3, 5, 7, 9), Res2Net-style d2 scales
  (2, 2, 3, 4), 8 attention heads, Fourier positional encoding on the first
  global block

Structural constants are chosen to mirror timm's `edgenext_small`; the
pretrained-weight importer maps timm names onto this tree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from foundationstereo_tpu.models.layers import Conv, LayerNorm2d, gelu

Dtype = Any

DIMS = (48, 96, 160, 304)
DEPTHS = (3, 3, 9, 3)
KERNEL_SIZES = (3, 5, 7, 9)
D2_SCALES = (2, 2, 3, 4)
GLOBAL_BLOCKS = (0, 1, 1, 1)
USE_POS_EMB = (False, True, False, False)
HEADS = 8
EXPAN_RATIO = 4
LAYER_SCALE_INIT = 1e-6


class ConvEncoder(nn.Module):
    """ConvNeXt-style block: depthwise conv + LN + pointwise MLP + layer scale."""

    dim: int
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = Conv(self.dim, self.kernel_size, 1, self.kernel_size // 2,
                 groups=self.dim, dtype=self.dtype)(x)
        x = LayerNorm2d()(x)
        x = nn.Dense(EXPAN_RATIO * self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        gamma = self.param("gamma", nn.initializers.constant(LAYER_SCALE_INIT),
                           (self.dim,), jnp.float32)
        return inp + gamma.astype(x.dtype) * x


def fourier_pos_embedding(h: int, w: int, hidden: int = 32) -> np.ndarray:
    """2D sine/cosine features (h, w, 2*hidden) for the SDTA pos encoding."""
    temperature = 10000.0
    scale = 2 * np.pi
    eps = 1e-6
    y = np.arange(1, h + 1, dtype=np.float64)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float64)[None, :].repeat(h, 0)
    y = y / (y[-1:, :] + eps) * scale
    x = x / (x[:, -1:] + eps) * scale
    dim_t = temperature ** (2 * (np.arange(hidden) // 2) / hidden)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


class XCA(nn.Module):
    """Cross-covariance attention: softmax over the channel-covariance matrix
    with a learnable per-head temperature."""

    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1), jnp.float32)
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, h, hd, N)
        qn = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", qn, kn) * temperature
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn.astype(v.dtype), v)
        out = out.transpose(0, 3, 1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class SDTAEncoder(nn.Module):
    """Split-depthwise transpose-attention block (EdgeNeXt global block)."""

    dim: int
    scales: int = 2
    num_heads: int = HEADS
    use_pos_emb: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        shortcut = x

        # Res2Net-style cascaded depthwise 3x3 over channel splits: the first
        # scales-1 equal-width splits cascade through dw convs; the (possibly
        # narrower) last split passes through unchanged.
        width = int(np.ceil(C / self.scales))
        splits = [x[..., i * width : min((i + 1) * width, C)] for i in range(self.scales)
                  if i * width < C]
        nums = 1 if len(splits) == 1 else len(splits) - 1
        outs, sp = [], None
        for i in range(nums):
            sp = splits[i] if i == 0 else sp + splits[i]
            sp = Conv(sp.shape[-1], 3, 1, 1, groups=sp.shape[-1],
                      dtype=self.dtype, name=f"dwconv{i}")(sp)
            outs.append(sp)
        if len(splits) > 1:
            outs.append(splits[-1])
        x = jnp.concatenate(outs, axis=-1)

        tokens = x.reshape(B, H * W, C)
        if self.use_pos_emb:
            pe = jnp.asarray(fourier_pos_embedding(H, W)).reshape(1, H * W, -1)
            pe = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                          name="pos_proj")(pe)
            tokens = tokens + pe.astype(tokens.dtype)

        gamma_xca = self.param("gamma_xca", nn.initializers.constant(LAYER_SCALE_INIT),
                               (C,), jnp.float32)
        t = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm_xca")(tokens)
        tokens = tokens + gamma_xca.astype(t.dtype) * XCA(
            C, self.num_heads, dtype=self.dtype, name="xca")(t)

        # Inverted MLP on the transformed path; residual from the block input.
        x = tokens.reshape(B, H, W, C)
        h = LayerNorm2d(name="norm")(x)
        h = nn.Dense(EXPAN_RATIO * C, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = gelu(h)
        h = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32)(h)
        gamma = self.param("gamma", nn.initializers.constant(LAYER_SCALE_INIT),
                           (C,), jnp.float32)
        return shortcut + gamma.astype(h.dtype) * h


class EdgeNeXt(nn.Module):
    """EdgeNeXt-S trunk producing the (1/4, 1/8, 1/16, 1/32) pyramid."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # Stem: 4x4/4 conv + LN (biased convs, matching timm's edgenext).
        x = Conv(DIMS[0], 4, 4, 0, dtype=self.dtype, name="stem_conv")(x)
        x = LayerNorm2d(name="stem_norm")(x)

        feats = []
        for si in range(4):
            if si > 0:
                x = LayerNorm2d(name=f"down{si}_norm")(x)
                x = Conv(DIMS[si], 2, 2, 0, dtype=self.dtype,
                         name=f"down{si}_conv")(x)
            n_global = GLOBAL_BLOCKS[si]
            n_local = DEPTHS[si] - n_global
            for bi in range(n_local):
                x = ConvEncoder(DIMS[si], KERNEL_SIZES[si], dtype=self.dtype,
                                name=f"stage{si}_block{bi}")(x)
            for gi in range(n_global):
                x = SDTAEncoder(DIMS[si], scales=D2_SCALES[si],
                                use_pos_emb=USE_POS_EMB[si] and gi == 0,
                                dtype=self.dtype,
                                name=f"stage{si}_sdta{gi}")(x)
            feats.append(x)
        return feats  # [x4 (48), x8 (96), x16 (160), x32 (304)]
