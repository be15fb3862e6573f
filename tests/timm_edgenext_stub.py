"""Torch EdgeNeXt-S mirroring timm's ``edgenext_small`` module/parameter
structure, used as a stand-in ``timm`` module for the stitched full-forward
parity test (timm itself is not installed in this environment).

Structure and naming follow timm's ``timm/models/edgenext.py`` (stem.0/1,
stages.N.downsample.{0 norm,1 conv}, stages.N.blocks.M with ConvBlock
{conv_dw, norm, mlp.fc1/fc2, gamma} and SplitTransposeBlock {convs.j,
pos_embd.token_projection, norm_xca, gamma_xca, xca.{qkv,temperature,proj},
norm, mlp, gamma}), which the original EdgeNeXt repo also uses. This is a
re-implementation from the documented architecture, NOT a copy of timm —
it exists so convert/torch_import.py's EdgeNeXt name map (flagged
``uncertain`` because timm is absent) gets exercised against real torch
modules with timm's exact state_dict keys.

edgenext_small config: dims (48, 96, 160, 304), depths (3, 3, 9, 3),
per-stage depthwise kernels (3, 5, 7, 9), Res2Net d2 scales (2, 2, 3, 4),
8 XCA heads, one SDTA global block at the END of stages 2-4, Fourier
positional encoding on stage 2's SDTA only, expansion ratio 4, layer scale
1e-6 (reference consumption: /root/reference/core/extractor.py:327-329).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

DIMS = (48, 96, 160, 304)
DEPTHS = (3, 3, 9, 3)
KERNEL_SIZES = (3, 5, 7, 9)
D2_SCALES = (2, 2, 3, 4)
GLOBAL_BLOCKS = (0, 1, 1, 1)
USE_POS_EMB = (False, True, False, False)
HEADS = 8
EXPAN_RATIO = 4
LS_INIT = 1e-6


class LayerNorm2d(nn.LayerNorm):
    """LayerNorm over C of NCHW tensors (timm's LayerNorm2d semantics)."""

    def forward(self, x):  # (B, C, H, W)
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class ConvBlock(nn.Module):
    """ConvNeXt-style local block: depthwise conv + LN + MLP + layer scale."""

    def __init__(self, dim, kernel_size):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, kernel_size,
                                 padding=kernel_size // 2, groups=dim,
                                 bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, EXPAN_RATIO * dim)
        self.gamma = nn.Parameter(LS_INIT * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.mlp(x)
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return shortcut + x


class PositionalEncodingFourier(nn.Module):
    def __init__(self, hidden_dim=32, dim=768, temperature=10000.0):
        super().__init__()
        self.token_projection = nn.Conv2d(hidden_dim * 2, dim, kernel_size=1)
        self.scale = 2 * math.pi
        self.temperature = temperature
        self.hidden_dim = hidden_dim

    def forward(self, B, H, W):
        dev = self.token_projection.weight.device
        y = torch.arange(1, H + 1, dtype=torch.float32, device=dev)
        x = torch.arange(1, W + 1, dtype=torch.float32, device=dev)
        y_embed = y[None, :, None].repeat(B, 1, W)
        x_embed = x[None, None, :].repeat(B, H, 1)
        eps = 1e-6
        y_embed = y_embed / (y_embed[:, -1:, :] + eps) * self.scale
        x_embed = x_embed / (x_embed[:, :, -1:] + eps) * self.scale
        dim_t = torch.arange(self.hidden_dim, dtype=torch.float32, device=dev)
        dim_t = self.temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                                     / self.hidden_dim)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(),
                             pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
        pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(),
                             pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
        pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
        return self.token_projection(pos)


class CrossCovarianceAttn(nn.Module):
    def __init__(self, dim, num_heads=8):
        super().__init__()
        self.num_heads = num_heads
        self.temperature = nn.Parameter(torch.ones(num_heads, 1, 1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 4, 1)
        q, k, v = qkv.unbind(0)           # (B, h, hd, N)
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        x = (attn @ v).permute(0, 3, 1, 2).reshape(B, N, C)
        return self.proj(x)


class SplitTransposeBlock(nn.Module):
    """SDTA global block: Res2Net split depthwise cascade + XCA + MLP."""

    def __init__(self, dim, num_scales, use_pos_emb):
        super().__init__()
        width = max(int(math.ceil(dim / num_scales)),
                    int(math.floor(dim // num_scales)))
        self.width = width
        self.convs = nn.ModuleList(
            nn.Conv2d(width, width, 3, padding=1, groups=width, bias=True)
            for _ in range(max(1, num_scales - 1)))
        self.pos_embd = (PositionalEncodingFourier(dim=dim)
                         if use_pos_emb else None)
        self.norm_xca = nn.LayerNorm(dim, eps=1e-6)
        self.gamma_xca = nn.Parameter(LS_INIT * torch.ones(dim))
        self.xca = CrossCovarianceAttn(dim, HEADS)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, EXPAN_RATIO * dim)
        self.gamma = nn.Parameter(LS_INIT * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        spx = x.split(self.width, 1)
        spo, sp = [], None
        for i, conv in enumerate(self.convs):
            sp = spx[i] if i == 0 else sp + spx[i]
            sp = conv(sp)
            spo.append(sp)
        if len(spx) > 1:
            spo.append(spx[-1])
        x = torch.cat(spo, 1)

        B, C, H, W = x.shape
        x = x.reshape(B, C, H * W).permute(0, 2, 1)
        if self.pos_embd is not None:
            pos = self.pos_embd(B, H, W).reshape(B, -1, H * W).permute(0, 2, 1)
            x = x + pos
        x = x + self.gamma_xca * self.xca(self.norm_xca(x))
        x = x.reshape(B, H, W, C)
        x = self.norm(x)
        x = self.mlp(x)
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return shortcut + x


class EdgeNeXtStage(nn.Module):
    def __init__(self, in_dim, dim, depth, kernel_size, num_scales,
                 num_global, use_pos_emb, downsample):
        super().__init__()
        if downsample:
            self.downsample = nn.Sequential(
                LayerNorm2d(in_dim, eps=1e-6),
                nn.Conv2d(in_dim, dim, kernel_size=2, stride=2, bias=True))
        else:
            self.downsample = nn.Identity()
        blocks = []
        for _ in range(depth - num_global):
            blocks.append(ConvBlock(dim, kernel_size))
        for g in range(num_global):
            blocks.append(SplitTransposeBlock(dim, num_scales,
                                              use_pos_emb and g == 0))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(self.downsample(x))


class EdgeNeXt(nn.Module):
    """edgenext_small trunk (stem + stages only — all the reference uses)."""

    def __init__(self):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, DIMS[0], kernel_size=4, stride=4, bias=True),
            LayerNorm2d(DIMS[0], eps=1e-6))
        stages = []
        for i in range(4):
            stages.append(EdgeNeXtStage(
                DIMS[i - 1] if i > 0 else DIMS[0], DIMS[i], DEPTHS[i],
                KERNEL_SIZES[i], D2_SCALES[i], GLOBAL_BLOCKS[i],
                USE_POS_EMB[i], downsample=i > 0))
        self.stages = nn.Sequential(*stages)

    def forward(self, x):
        return self.stages(self.stem(x))


def create_model(name, pretrained=False, **kwargs):
    """timm.create_model stand-in: only edgenext_small, never pretrained."""
    assert name == "edgenext_small", name
    return EdgeNeXt()
