"""Pallas kernels (interpret mode on CPU) vs the XLA reference ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from foundationstereo_tpu.ops.cost_volume import build_concat_volume, build_gwc_volume
from foundationstereo_tpu.ops.pallas_kernels import (
    build_cost_volume_pallas,
    disparity_lookup_pallas,
)
from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis


def test_lookup_kernel_matches_xla(rng):
    b, h, w, c, d, levels, radius = 1, 4, 32, 6, 16, 3, 3
    geo = jnp.asarray(rng.standard_normal((b, h, w, c, d)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((b, h, w, w)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(-2, d + 2, (b, h, w)).astype(np.float32))
    gp = pool_last_axis(geo, levels - 1)
    cp = pool_last_axis(corr, levels - 1)

    ref = np.asarray(disparity_lookup(gp, cp, disp, radius))
    got = np.asarray(disparity_lookup_pallas(gp, cp, disp, radius, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sharded_lookup_matches_unsharded(rng):
    """shard_map'd lookup over an 8-device 'spatial' width sharding equals
    the plain lookup (incl. the global x-offset for the correlation axis)."""
    import jax
    from foundationstereo_tpu.ops.pallas_kernels import (
        disparity_lookup_pallas_sharded,
        to_kernel_layout,
    )
    from foundationstereo_tpu.parallel.mesh import make_mesh

    b, h, w, c, d, levels, radius = 1, 4, 64, 6, 16, 3, 3
    geo = jnp.asarray(rng.standard_normal((b, h, w, c, d)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((b, h, w, w)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(-2, d + 2, (b, h, w)).astype(np.float32))
    gp = pool_last_axis(geo, levels - 1)
    cp = pool_last_axis(corr, levels - 1)
    ref = np.asarray(disparity_lookup(gp, cp, disp, radius))

    mesh = make_mesh(len(jax.devices()))  # (data, spatial)
    gk, ck = to_kernel_layout(gp, cp)
    got = np.asarray(disparity_lookup_pallas_sharded(
        gk, ck, disp, radius, mesh=mesh, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_fused_lookup_matches_xla(rng):
    """Single-dispatch all-levels kernel == reference lookup (fp32 exact,
    bf16 within quantization)."""
    from foundationstereo_tpu.ops.pallas_kernels import (
        disparity_lookup_pallas_fused,
        to_kernel_layout,
    )

    b, h, w, c, d, levels, radius = 1, 4, 32, 6, 16, 3, 3
    geo = jnp.asarray(rng.standard_normal((b, h, w, c, d)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((b, h, w, w)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(-2, d + 2, (b, h, w)).astype(np.float32))
    gp = pool_last_axis(geo, levels - 1)
    cp = pool_last_axis(corr, levels - 1)
    ref = np.asarray(disparity_lookup(gp, cp, disp, radius))

    gk, ck = to_kernel_layout(gp, cp)
    got = np.asarray(disparity_lookup_pallas_fused(gk, ck, disp, radius,
                                                   interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    gk16, ck16 = to_kernel_layout(gp, cp, dtype=jnp.bfloat16)
    got16 = np.asarray(disparity_lookup_pallas_fused(gk16, ck16, disp, radius,
                                                     interpret=True))
    np.testing.assert_allclose(got16, ref, rtol=2e-2, atol=5e-2)


def test_cost_volume_kernel_matches_xla(rng):
    b, h, w, c, p, d, g = 1, 3, 24, 16, 4, 10, 4
    l = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    lp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))
    rp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))

    gwc = build_gwc_volume(l, r, d, g)
    cat = build_concat_volume(lp, rp, d)
    ref = np.asarray(jnp.concatenate([gwc, cat], axis=-1))
    got = np.asarray(build_cost_volume_pallas(l, r, lp, rp, d, g, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
