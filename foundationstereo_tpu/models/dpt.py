"""DPT decoder head + DepthAnything feature wrapper (flax, NHWC).

Re-implements the forward path of depth_anything/dpt.py:24-146 and
depth_anything/blocks.py:4-153 — per-level 1x1 projections, resize layers,
3x3 "rn" convs, four RefineNet-style fusion blocks, and the intermediate
feature tap ``out`` (post output_conv1, bilinearly upsampled to the ViT input
resolution with align_corners=True) that FoundationStereo consumes
(core/extractor.py:308-320,356-357).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from foundationstereo_tpu.config import VIT_CONFIGS
from foundationstereo_tpu.models.dinov2 import make_vit
from foundationstereo_tpu.models.layers import Conv, ConvTranspose
from foundationstereo_tpu.ops.resize import resize2d, resize2d_via

Dtype = Any


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv residual unit (depth_anything/blocks.py:37-92)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype)(out)
        out = nn.relu(out)
        out = Conv(self.features, 3, 1, 1, dtype=self.dtype)(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """RefineNet-style fusion (depth_anything/blocks.py:95-153):
    add skip (through RCU1), RCU2, bilinear x2 or to `size`, 1x1 out conv."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, size=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype)(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype)(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = resize2d(x, size, "bilinear", align_corners=True)
        return Conv(self.features, 1, 1, 0, dtype=self.dtype)(x)


class DPTHead(nn.Module):
    """DPT head over 4 ViT taps; returns the intermediate ``out`` feature and
    the normalized inverse relative depth (depth_anything/dpt.py:105-146)."""

    features: int
    out_channels: Sequence[int]
    patch_size: int = 14
    # When set, the 'out' tap is delivered directly at this (H, W) through a
    # composed up->down interpolation matrix — numerically the bilinear
    # upsample to (patch_h*14, patch_w*14) followed by a bilinear resize to
    # out_hw, without materializing the full-resolution intermediate.
    out_hw: tuple | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, vit_outputs, patch_h: int, patch_w: int,
                 return_disp: bool = False):
        # vit_outputs: list of 4 (B, N, C) patch-token tensors (cls unused:
        # use_clstoken=False in the reference config).
        feats = []
        for i, tokens in enumerate(vit_outputs):
            b, n, c = tokens.shape
            x = tokens.reshape(b, patch_h, patch_w, c)
            x = Conv(self.out_channels[i], 1, 1, 0, dtype=self.dtype,
                     name=f"project{i}")(x)
            if i == 0:
                x = ConvTranspose(self.out_channels[0], 4, 4, 0, dtype=self.dtype,
                                  name="resize0")(x)
            elif i == 1:
                x = ConvTranspose(self.out_channels[1], 2, 2, 0, dtype=self.dtype,
                                  name="resize1")(x)
            elif i == 3:
                x = Conv(self.out_channels[3], 3, 2, 1, dtype=self.dtype,
                         name="resize3")(x)
            feats.append(x)

        rn = [Conv(self.features, 3, 1, 1, use_bias=False, dtype=self.dtype,
                   name=f"layer{i+1}_rn")(feats[i]) for i in range(4)]

        path4 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        path3 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet3")(
            path4, rn[2], size=rn[1].shape[1:3])
        path2 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet2")(
            path3, rn[1], size=rn[0].shape[1:3])
        path1 = FeatureFusionBlock(self.features, dtype=self.dtype, name="refinenet1")(
            path2, rn[0])

        out = Conv(self.features // 2, 3, 1, 1, dtype=self.dtype, name="output_conv1")(path1)
        full_hw = (patch_h * self.patch_size, patch_w * self.patch_size)
        if self.out_hw is not None and not return_disp:
            out = resize2d_via(out, full_hw, tuple(self.out_hw),
                               "bilinear", align_corners=True)
            return out, None
        out = resize2d(out, full_hw, "bilinear", align_corners=True)
        if not return_disp:
            return out, None
        d = Conv(32, 3, 1, 1, dtype=self.dtype, name="output_conv2_0")(out)
        d = nn.relu(d)
        d = Conv(1, 1, 1, 0, dtype=self.dtype, name="output_conv2_2")(d)
        depth = nn.relu(nn.relu(d))
        disp = jnp.where(depth == 0, 0.0, 1.0 / jnp.maximum(depth, 1e-20))
        disp = disp / jnp.maximum(jnp.max(disp), 1e-20)
        return out, disp


class DepthAnythingFeature(nn.Module):
    """Frozen DINOv2 + DPT head; returns the monocular prior feature
    (core/extractor.py:286-320). Input (B, H, W, 3) normalized RGB."""

    vit_size: str = "vitl"
    attention: str = "auto"
    out_hw: tuple | None = None  # deliver 'out' directly at this resolution
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_disp: bool = False):
        cfg = VIT_CONFIGS[self.vit_size]
        b, h, w, _ = x.shape
        vit = make_vit(self.vit_size, dtype=self.dtype, attention=self.attention)
        outputs = vit.copy(name="pretrained")(x, cfg["intermediate_layers"])
        patch_tokens = [t for (t, _cls) in outputs]
        head = DPTHead(cfg["dpt_features"], cfg["dpt_out_channels"],
                       out_hw=self.out_hw, dtype=self.dtype, name="depth_head")
        out, disp = head(patch_tokens, h // 14, w // 14, return_disp=return_disp)
        return {"out": out, "disp": disp}
