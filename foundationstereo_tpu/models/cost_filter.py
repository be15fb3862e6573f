"""AHCF cost filtering: 3D hourglass with APC convs + disparity transformer.

NDHWC re-design of core/foundation_stereo.py:45-123 (hourglass) and
:164-176 (corr_stem/classifier assembly): a 3-level 3D encoder-decoder over
(D, H, W) with axial-planar factorized convolutions, FeatureAtt gating from
the image pyramid at each scale, and a parallel disparity-axis transformer
branch (conv_patch 4^3/4 -> attention over D/16 tokens -> trilinear x4) summed
into the decoder output.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from foundationstereo_tpu.models.layers import (
    BasicConv,
    BatchNorm,
    Conv,
    Conv3dNormActReduced,
    CostVolumeDisparityAttention,
    FeatureAtt,
    ResnetBasicBlock,
)
from foundationstereo_tpu.ops.resize import resize_dhw

Dtype = Any


class Hourglass(nn.Module):
    """(B, D, H, W, C) -> same shape; features = [x4, x8, x16, x32]."""

    in_channels: int          # 28
    max_disp: int             # full-res max disparity (cfg.max_disp)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, features, train: bool = False):
        c = self.in_channels
        dt = self.dtype

        def down_block(inp, ch, name):
            y = BasicConv(ch, 3, 2, 1, dtype=dt, name=f"{name}_conv")(inp, train)
            y = Conv3dNormActReduced(ch, kernel_size=3, kernel_disp=17, dtype=dt,
                                     name=f"{name}_apc")(y, train)
            return y

        conv1 = down_block(x, c * 2, "conv1")
        conv1 = FeatureAtt(c * 2, dtype=dt, name="feature_att_8")(conv1, features[1], train)
        conv2 = down_block(conv1, c * 4, "conv2")
        conv2 = FeatureAtt(c * 4, dtype=dt, name="feature_att_16")(conv2, features[2], train)
        conv3 = down_block(conv2, c * 6, "conv3")
        conv3 = FeatureAtt(c * 6, dtype=dt, name="feature_att_32")(conv3, features[3], train)

        def agg(inp, ch, name):
            y = BasicConv(ch, 1, 1, 0, dtype=dt, name=f"{name}_proj")(inp, train)
            y = Conv3dNormActReduced(ch, kernel_size=3, kernel_disp=17, dtype=dt,
                                     name=f"{name}_apc0")(y, train)
            y = Conv3dNormActReduced(ch, kernel_size=3, kernel_disp=17, dtype=dt,
                                     name=f"{name}_apc1")(y, train)
            return y

        conv3_up = BasicConv(c * 4, (4, 4, 4), 2, 1, deconv=True, dtype=dt,
                             name="conv3_up")(conv3, train)
        conv2 = jnp.concatenate([conv3_up, conv2], axis=-1)
        conv2 = agg(conv2, c * 4, "agg_0")
        conv2 = FeatureAtt(c * 4, dtype=dt, name="feature_att_up_16")(conv2, features[2], train)

        conv2_up = BasicConv(c * 2, (4, 4, 4), 2, 1, deconv=True, dtype=dt,
                             name="conv2_up")(conv2, train)
        conv1 = jnp.concatenate([conv2_up, conv1], axis=-1)
        conv1 = agg(conv1, c * 2, "agg_1")
        conv1 = FeatureAtt(c * 2, dtype=dt, name="feature_att_up_8")(conv1, features[1], train)

        conv = BasicConv(c, (4, 4, 4), 2, 1, deconv=True, dtype=dt,
                         name="conv1_up")(conv1, train)

        # Disparity transformer branch (DT): depthwise 4^3/4 patching, then
        # attention along the disparity-token axis at 1/16 volume resolution.
        p = Conv(c, (4, 4, 4), 4, 0, groups=c, dtype=dt, name="conv_patch")(x)
        p = BatchNorm(name="conv_patch_bn")(p, train=train)
        p = CostVolumeDisparityAttention(
            d_model=c, nhead=4, dim_feedforward=c, num_transformer=4,
            max_len=self.max_disp // 16, dtype=dt, name="dt")(p, train)
        p = resize_dhw(p, (p.shape[1] * 4, p.shape[2] * 4, p.shape[3] * 4),
                       "trilinear", align_corners=False)
        conv = conv + p

        conv = Conv3dNormActReduced(c, kernel_size=3, kernel_disp=17, dtype=dt,
                                    name="conv_out_apc0")(conv, train)
        conv = Conv3dNormActReduced(c, kernel_size=3, kernel_disp=17, dtype=dt,
                                    name="conv_out_apc1")(conv, train)
        return conv


class _Proj1x1Params(nn.Module):
    """Parameter shell matching ``Conv(features, 1, name=...)`` on a 5D input:
    the param path is ``<name>/Conv_0/{kernel,bias}`` with a (1,1,1,Cin,F)
    kernel, so checkpoints are interchangeable between the dense and the
    fused (parts) projection paths."""

    features: int
    in_dim: int

    @nn.compact
    def __call__(self):
        from foundationstereo_tpu.models.layers import _ConvParams

        return _ConvParams((1, 1, 1, self.in_dim, self.features),
                           use_bias=True, name="Conv_0")()


class CorrStem(nn.Module):
    """Project the raw 32-ch (gwc+concat) volume into the 28-ch filtered space
    (core/foundation_stereo.py:164-169).

    ``x`` is either the materialized (B, D, H, W, 32) volume, or the
    consumer-fusion parts tuple ``(gwc, rps, left_proj)`` from
    ``build_cost_volume_pallas(..., return_parts=True)`` — gwc (B, D, H, G, W),
    rps (B, D, H, P, W), left_proj (B, H, W, P). The parts path applies the
    SAME 1x1 projection as three channel-slice contractions (concat order
    [gwc, left, right] — ops/cost_volume.py), so the ~0.5 GB 32-ch volume is
    never materialized: the kernel parts are read once and the 28-ch output
    is written once, already in NDHWC.
    """

    volume_dim: int = 28
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if isinstance(x, (tuple, list)):
            gwc, rps, lp = x
            g, p = gwc.shape[3], rps.shape[3]
            kernel, bias = _Proj1x1Params(self.volume_dim, g + 2 * p,
                                          name="proj")()
            k = kernel[0, 0, 0].astype(dt)        # (G+2P, F)
            kg, kl, kr = k[:g], k[g:g + p], k[g + p:]
            # One MXU pass per part, output written directly as
            # (B, D, H, W, F); the d-invariant left term adds per (B, H, W).
            x = (jnp.einsum("bdhgw,gf->bdhwf", gwc.astype(dt), kg)
                 + jnp.einsum("bdhpw,pf->bdhwf", rps.astype(dt), kr))
            lterm = (jnp.einsum("bhwp,pf->bhwf", lp.astype(dt), kl)
                     + bias.astype(dt))
            x = x + lterm[:, None]
        else:
            x = Conv(self.volume_dim, 1, dtype=dt, name="proj")(x)
        x = BasicConv(self.volume_dim, 3, 1, 1, dtype=dt, name="conv")(x, train)
        x = ResnetBasicBlock(self.volume_dim, dtype=dt, name="res0")(x, train)
        x = ResnetBasicBlock(self.volume_dim, dtype=dt, name="res1")(x, train)
        return x


class Classifier(nn.Module):
    """Initial-disparity head over the filtered volume
    (core/foundation_stereo.py:172-176): -> (B, D, H, W) logits."""

    volume_dim: int = 28
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = BasicConv(self.volume_dim // 2, 3, 1, 1, dtype=dt, name="conv")(x, train)
        x = ResnetBasicBlock(self.volume_dim // 2, dtype=dt, name="res")(x, train)
        x = Conv(1, 7, 1, 3, dtype=dt, name="out")(x)
        return x[..., 0]
