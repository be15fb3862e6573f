"""Feature extraction: STA (side-tuning adapter) trunk + context network.

Channel-last re-design of core/extractor.py:192-369:

* :class:`Feature` — EdgeNeXt-S pyramid fused top-down with Conv2x_IN
  deconvs; a frozen DepthAnything monocular feature is concatenated at 1/4
  resolution and refined (paper §3.1 design (c)). Returns
  [x4, x8, x16, x32], vit_feat with channel contract
  d_out = [2*48+vit_dim, 2*96, 2*160, 304].
* :class:`ContextNetDino` — residual trunk that fuses the same vit feature at
  1/4 and emits (hidden, context) head pairs at 1/4, 1/8, 1/16.

The frozen backbone runs under ``stop_gradient``; its params additionally get
zero learning rate via the optimizer mask (train/optim.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.models.dpt import DepthAnythingFeature
from foundationstereo_tpu.models.edgenext import EdgeNeXt
from foundationstereo_tpu.models.layers import (
    BasicConv,
    BasicConvIN,
    Conv,
    Conv2xIN,
    InstanceNorm,
    ResidualBlock,
    apply_norm,
    make_norm,
)
from foundationstereo_tpu.ops.resize import resize2d
from foundationstereo_tpu.utils.misc import get_resize_keep_aspect_ratio

Dtype = Any

EDGENEXT_CHANS = (48, 96, 160, 304)


def feature_dims(cfg: ModelConfig) -> list[int]:
    """d_out contract of the STA extractor (core/extractor.py:346)."""
    c = EDGENEXT_CHANS
    return [c[0] * 2 + cfg.vit_feat_dim, c[1] * 2, c[2] * 2, c[3]]


class Feature(nn.Module):
    """STA unary feature extractor (core/extractor.py:323-369)."""

    cfg: ModelConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, _ = x.shape
        # Frozen monocular prior at a 112-divisible (lcm(14,16)) resolution.
        H_r, W_r = get_resize_keep_aspect_ratio(H, W, divider=112,
                                                max_H=1344, max_W=1344)
        x_vit = resize2d(x, (H_r, W_r), "bicubic", align_corners=False)
        # The frozen prior's 'out' tap is delivered directly at H/4 x W/4
        # through a composed interpolation matrix (DPTHead.out_hw): the
        # reference's full-ViT-resolution intermediate (core/extractor.py:357)
        # never materializes.
        dino = DepthAnythingFeature(self.cfg.vit_size,
                                    attention=self.cfg.vit_attention,
                                    out_hw=(H // 4, W // 4),
                                    dtype=self.dtype, name="dino")
        vit_feat = jax.lax.stop_gradient(dino(x_vit)["out"])

        x4, x8, x16, x32 = EdgeNeXt(dtype=self.dtype, name="edgenext")(x)

        c = EDGENEXT_CHANS
        x16 = Conv2xIN(c[2], dtype=self.dtype, name="deconv32_16")(x32, x16, train)
        x8 = Conv2xIN(c[1], dtype=self.dtype, name="deconv16_8")(x16, x8, train)
        x4 = Conv2xIN(c[0], dtype=self.dtype, name="deconv8_4")(x8, x4, train)
        x4 = jnp.concatenate([x4, vit_feat.astype(x4.dtype)], axis=-1)

        c4 = c[0] * 2 + self.cfg.vit_feat_dim
        x4 = BasicConv(c4, 3, 1, 1, norm="instance", dtype=self.dtype,
                       name="conv4_0")(x4, train)
        x4 = ResidualBlock(c4, norm="instance", dtype=self.dtype, name="conv4_1")(x4, train)
        x4 = ResidualBlock(c4, norm="instance", dtype=self.dtype, name="conv4_2")(x4, train)
        return [x4, x8, x16, x32], vit_feat


class _HeadPair(nn.Module):
    """One (hidden, context) output-head pair at a pyramid level."""

    dims: tuple[int, int]   # (hidden_dim, context_dim)
    with_resblock: bool = True
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for j, d in enumerate(self.dims):
            y = x
            if self.with_resblock:
                y = ResidualBlock(128, norm=self.norm, dtype=self.dtype,
                                  name=f"res{j}")(y, train)
            y = Conv(d, 3, 1, 1, dtype=self.dtype, name=f"out{j}")(y)
            outs.append(y)
        return tuple(outs)


class ContextNetDino(nn.Module):
    """Context network with monocular-prior fusion (core/extractor.py:192-283).

    Returns ((h04, c04), (h08, c08), (h16, c16)).
    """

    cfg: ModelConfig
    norm: str = "batch"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, vit_feat, train: bool = False):
        down = self.cfg.n_downsample
        norm = self.norm

        x = Conv(64, 7, 1 + (down > 2), 3, dtype=self.dtype, name="conv1")(x)
        x = apply_norm(make_norm(norm, 64, name="norm1"), x, train)
        x = nn.relu(x)

        def layer(x, dim, stride, name):
            x = ResidualBlock(dim, norm=norm, strides=stride, dtype=self.dtype,
                              name=f"{name}a")(x, train)
            x = ResidualBlock(dim, norm=norm, strides=1, dtype=self.dtype,
                              name=f"{name}b")(x, train)
            return x

        x = layer(x, 64, 1, "layer1")
        x = layer(x, 96, 1 + (down > 1), "layer2")
        x = layer(x, 128, 1 + (down > 0), "layer3")

        x = jnp.concatenate([x, vit_feat.astype(x.dtype)], axis=-1)
        x = BasicConv(128, 3, 1, 1, dtype=self.dtype, name="conv2")(x, train)

        hd = tuple(self.cfg.hidden_dims)
        out04 = _HeadPair((hd[2], hd[2]), True, norm, self.dtype, name="heads04")(x, train)
        y = layer(x, 128, 2, "layer4")
        out08 = _HeadPair((hd[1], hd[1]), True, norm, self.dtype, name="heads08")(y, train)
        z = layer(y, 128, 2, "layer5")
        out16 = _HeadPair((hd[0], hd[0]), False, norm, self.dtype, name="heads16")(z, train)
        return (out04, out08, out16)


class Stem2(nn.Module):
    """Half-resolution image stem used by convex upsampling
    (core/foundation_stereo.py:146-150)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BasicConvIN(32, 3, 2, 1, dtype=self.dtype)(x, train)
        x = Conv(32, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)
