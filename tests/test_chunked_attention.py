"""Chunked (flash-style) attention equals full softmax attention."""

import numpy as np

import jax
import jax.numpy as jnp

from foundationstereo_tpu.models.dinov2 import chunked_attention


def test_chunked_matches_full(rng):
    B, N, H, D = 2, 1337, 4, 16
    q = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
    scale = 1.0 / np.sqrt(D)

    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    w = jax.nn.softmax(logits, axis=-1)
    ref = jnp.einsum("bhnm,bmhd->bnhd", w, v)

    got = chunked_attention(q, k, v, scale, chunk=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_sharded_wrapper_matches_unsharded(rng):
    """The shard_map wrapper that keeps the flash ViT kernel active under a
    multi-device mesh (batch on 'data', heads on 'spatial') must be a pure
    re-partitioning: with the same attention fn injected, sharded == plain.
    Covers divisible and non-divisible batch/head counts (non-divisible axes
    stay replicated)."""
    from foundationstereo_tpu.models.dinov2 import (
        chunked_attention,
        flash_vit_attention_sharded,
    )
    from foundationstereo_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(len(jax.devices()))  # (data, spatial) over 8 CPU devices
    scale = 0.125
    for (B, N, H, D) in ((2, 65, 4, 16),   # B%data==0, H%spatial==0
                         (1, 33, 3, 8)):   # nothing divides: replicated path
        q = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((B, N, H, D)).astype(np.float32))
        ref = np.asarray(chunked_attention(q, k, v, scale, chunk=32))
        got = np.asarray(flash_vit_attention_sharded(
            q, k, v, scale, mesh,
            attn_fn=lambda a, b, c, s: chunked_attention(a, b, c, s, chunk=32)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
