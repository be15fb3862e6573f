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
