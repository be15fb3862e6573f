"""DINOv2 Vision Transformer (flax, NHWC) — the frozen monocular backbone.

Re-implements the forward path of the reference's vendored ViT
(dinov2/dinov2/models/vision_transformer.py:45-330, layers/{attention,block,
mlp,patch_embed}.py) as used by DepthAnything: patch embed, cls token,
bicubic pos-embed interpolation with the historical +0.1 scale-factor kludge
(vision_transformer.py:195-209), pre-norm blocks with LayerScale (hub models
use init_values=1.0, dinov2/hub/backbones.py:26), and
``get_intermediate_layers`` returning normalized patch tokens + cls tokens.

The attention here is the #1 FLOPs consumer of the whole pipeline (up to
~9k tokens at dim 1024); it runs as a fused XLA softmax attention in bf16,
batched over both stereo views.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from foundationstereo_tpu.config import VIT_CONFIGS
from foundationstereo_tpu.ops.resize import resize1d_matrix

Dtype = Any


def chunked_attention(q, k, v, scale: float, chunk: int = 512):
    """Flash-style attention: scan over KV chunks with an online softmax.

    q/k/v: (B, N, H, D). Avoids materializing the (B, H, N, N) logits —
    at 9k ViT tokens that tensor dominates HBM traffic. fp32 accumulators.
    """
    B, N, H, D = q.shape
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    neg = jnp.float32(-1e30)
    valid = (jnp.arange(n_chunks * chunk) < N).reshape(n_chunks, chunk)

    ks = kp.reshape(B, n_chunks, chunk, H, D).transpose(1, 0, 2, 3, 4)
    vs = vp.reshape(B, n_chunks, chunk, H, D).transpose(1, 0, 2, 3, 4)

    def body(carry, inp):
        m, l, acc = carry                       # (B,H,N), (B,H,N), (B,H,N,D)
        kc, vc, mask = inp                      # (B,chunk,H,D), ..., (chunk,)
        s = jnp.einsum("bnhd,bmhd->bhnm", q, kc,
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask[None, None, None, :], s, neg)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])
        l_new = l * alpha + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhnm,bmhd->bhnd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    init = (jnp.full((B, H, N), neg, jnp.float32),
            jnp.zeros((B, H, N), jnp.float32),
            jnp.zeros((B, H, N, D), jnp.float32))
    (m, l, acc), _ = jax.lax.scan(body, init, (ks, vs, valid))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3)            # (B, N, H, D)


def flash_vit_attention(q, k, v, scale: float, block: int = 512):
    """TPU Pallas flash attention over ViT tokens (q/k/v: (B, N, H, D)).

    Pads N (= hp*wp + 1 cls token, rarely block-aligned) up to a multiple of
    `block` and masks the padding with segment ids: valid tokens get id 1,
    pad tokens id 0, so valid queries never attend to padding and pad queries
    stay finite (they attend to each other and are sliced off).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, N, H, D = q.shape
    Np = -(-N // block) * block
    pad = Np - N

    def to_bhnd(t):
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return t.transpose(0, 2, 1, 3)  # (B, H, Np, D)

    qp, kp, vp = to_bhnd(q), to_bhnd(k), to_bhnd(v)
    seg = (jnp.arange(Np) < N).astype(jnp.int32)[None].repeat(B, axis=0)
    sizes = BlockSizes(block_q=block, block_k_major=block, block_k=block,
                       block_b=1,
                       block_q_major_dkv=block, block_k_major_dkv=block,
                       block_k_dkv=block, block_q_dkv=block,
                       block_k_major_dq=block, block_k_dq=block,
                       block_q_dq=block)
    out = flash_attention(qp, kp, vp, segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=scale, block_sizes=sizes)
    return out.transpose(0, 2, 1, 3)[:, :N]  # (B, N, H, D)


def flash_vit_attention_sharded(q, k, v, scale: float, mesh,
                                attn_fn=flash_vit_attention):
    """Keep the flash kernel active under a multi-device mesh.

    pallas_call has no GSPMD partitioning rule, so inside a plain jit the
    partitioner would replicate it; ViT self-attention is embarrassingly
    parallel over (batch, heads), so a shard_map over the mesh — batch on
    'data', heads on 'spatial' (when divisible) — runs the unmodified kernel
    per shard with ZERO collectives. Axes that don't divide stay replicated
    (still correct; shard_map then recomputes redundantly on that axis).

    ``attn_fn`` is injectable so the wrapper's sharding logic is testable on
    a CPU mesh with the dense/chunked implementations (the TPU flash kernel
    has no CPU interpret path here).
    """
    from jax.sharding import PartitionSpec as P

    B, N, H, D = q.shape
    db = ("data" if "data" in mesh.axis_names and mesh.shape["data"] > 1
          and B % mesh.shape["data"] == 0 else None)
    hs = ("spatial" if "spatial" in mesh.axis_names
          and mesh.shape["spatial"] > 1
          and H % mesh.shape["spatial"] == 0 else None)
    spec = P(db, None, hs, None)
    f = jax.shard_map(lambda a, b_, c: attn_fn(a, b_, c, scale),
                      mesh=mesh, in_specs=(spec, spec, spec),
                      out_specs=spec, check_vma=False)
    return f(q, k, v)


_VIT_ATTENTION_IMPLS = ("auto", "dense", "chunked", "flash", "flash_sharded")


def resolve_vit_attention(impl: str) -> str:
    """Resolve the "auto" attention choice at trace time: the Pallas flash
    kernel on TPU (shard_map'd over batch/heads under a multi-device mesh),
    the dense einsum elsewhere (CPU tests, tiny inputs).

    Unknown values raise (a typo would otherwise silently take the dense
    O(N^2) path).
    """
    if impl not in _VIT_ATTENTION_IMPLS:
        raise ValueError(
            f"vit_attention={impl!r} not in {_VIT_ATTENTION_IMPLS}")
    if impl != "auto":
        return impl
    if jax.default_backend() != "tpu":
        return "dense"
    from foundationstereo_tpu.parallel.mesh import current_mesh

    mesh = current_mesh()
    if mesh is not None and mesh.size > 1:
        return "flash_sharded"
    return "flash"


class ViTAttention(nn.Module):
    """Joint-QKV multi-head self-attention (dinov2 layers/attention.py:36-99).

    `attention` picks the softmax-attention implementation for large token
    counts (N > 1024): "flash" = the Pallas TPU kernel (no materialized
    N x N logits, VMEM-resident tiles), "chunked" = lax.scan online-softmax
    (any backend), "dense" = plain einsum. Small N always uses dense."""

    dim: int
    num_heads: int
    attention: str = "dense"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / np.sqrt(hd)
        impl = resolve_vit_attention(self.attention) if N > 1024 else "dense"
        if impl == "flash_sharded":
            from foundationstereo_tpu.parallel.mesh import current_mesh

            out = flash_vit_attention_sharded(
                q, k, v, scale, current_mesh()).astype(v.dtype).reshape(B, N, C)
        elif impl == "flash":
            out = flash_vit_attention(q, k, v, scale).astype(v.dtype).reshape(B, N, C)
        elif impl == "chunked":
            out = chunked_attention(q, k, v, scale).astype(v.dtype).reshape(B, N, C)
        else:
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
            out = jnp.einsum("bhnm,bmhd->bnhd", w, v).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm block with LayerScale (dinov2 layers/block.py:43-116)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    attention: str = "dense"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ls1 = self.param("ls1_gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        ls2 = self.param("ls2_gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm1")(x)
        h = ViTAttention(self.dim, self.num_heads, attention=self.attention,
                         dtype=self.dtype, name="attn")(h)
        x = x + ls1.astype(h.dtype) * h
        h = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        h = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(h)
        x = x + ls2.astype(h.dtype) * h
        return x


def interpolate_pos_embed(pos_embed: jnp.ndarray, hp: int, wp: int,
                          offset: float = 0.1) -> jnp.ndarray:
    """Bicubic pos-embed interpolation with the +offset scale kludge.

    pos_embed: (1, 1+M*M, C) [cls + M*M patch embeddings].
    Returns (1, 1+hp*wp, C).
    """
    n = pos_embed.shape[1] - 1
    m = int(np.sqrt(n))
    assert m * m == n
    if hp == m and wp == m:
        return pos_embed
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:].reshape(1, m, m, -1).astype(jnp.float32)
    sh = float(hp + offset) / m
    sw = float(wp + offset) / m
    mh = resize1d_matrix(m, hp, "cubic", False, scale_factor=sh)
    mw = resize1d_matrix(m, wp, "cubic", False, scale_factor=sw)
    patch_pe = jnp.einsum("oh,bhwc->bowc", mh, patch_pe)
    patch_pe = jnp.einsum("ow,bhwc->bhoc", mw, patch_pe)
    patch_pe = patch_pe.reshape(1, hp * wp, -1)
    return jnp.concatenate([cls_pe.astype(jnp.float32), patch_pe], axis=1).astype(pos_embed.dtype)


class DinoVisionTransformer(nn.Module):
    """DINOv2 ViT forward path with intermediate-layer taps.

    Input: (B, H, W, 3), H and W divisible by patch_size.
    """

    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int = 14
    pretrain_img_size: int = 518
    mlp_ratio: float = 4.0
    attention: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, intermediate_layers: Sequence[int]):
        B, H, W, _ = x.shape
        hp, wp = H // self.patch_size, W // self.patch_size
        num_pretrain_patches = (self.pretrain_img_size // self.patch_size) ** 2

        patches = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                          strides=(self.patch_size, self.patch_size),
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="patch_embed")(x)
        tokens = patches.reshape(B, hp * wp, self.embed_dim)

        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed",
                               nn.initializers.normal(0.02),
                               (1, num_pretrain_patches + 1, self.embed_dim), jnp.float32)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, self.embed_dim)), tokens],
            axis=1)
        pe = interpolate_pos_embed(pos_embed, hp, wp)
        tokens = tokens + pe.astype(tokens.dtype)

        taps = {}
        want = set(intermediate_layers)
        for i in range(self.depth):
            tokens = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                              attention=self.attention, dtype=self.dtype,
                              name=f"block{i}")(tokens)
            if i in want:
                taps[i] = tokens

        norm = nn.LayerNorm(epsilon=1e-6, param_dtype=jnp.float32, name="norm")
        outputs = []
        for i in intermediate_layers:
            t = norm(taps[i])
            outputs.append((t[:, 1:], t[:, 0]))  # (patch tokens, cls token)
        return outputs


def make_vit(vit_size: str, dtype=jnp.float32,
             attention: str = "auto") -> DinoVisionTransformer:
    cfg = VIT_CONFIGS[vit_size]
    return DinoVisionTransformer(
        embed_dim=cfg["embed_dim"], depth=cfg["depth"], num_heads=cfg["num_heads"],
        attention=attention, dtype=dtype)
