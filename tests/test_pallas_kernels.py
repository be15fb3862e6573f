"""Pallas kernels (interpret mode on CPU) vs the XLA reference ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from foundationstereo_tpu.ops.cost_volume import build_concat_volume, build_gwc_volume
from foundationstereo_tpu.ops.pallas_kernels import (
    build_cost_volume_pallas,
    disparity_lookup_pallas,
    disparity_lookup_pallas_fused,
    disparity_lookup_pallas_pre,
    to_kernel_layout,
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


def test_gather_lookup_matches_xla(rng):
    """Sublane-gather lookup (pre-blend + dynamic_gather) == the tent
    contraction, including far-out-of-range coordinates (zero padding),
    boundary-straddling taps, and exact-integer positions (frac == 0)."""
    b, h, w, c, d, levels, radius = 1, 4, 32, 6, 16, 3, 4
    geo = jnp.asarray(rng.standard_normal((b, h, w, c, d)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((b, h, w, w)).astype(np.float32))
    disp = rng.uniform(-d, 2 * d, (b, h, w)).astype(np.float32)
    disp[0, 0, :8] = np.arange(8, dtype=np.float32)   # exact integers
    disp[0, 1, :4] = [-100.0, 1e4, -0.5, d - 0.5]     # extremes + straddles
    disp = jnp.asarray(disp)
    gp = pool_last_axis(geo, levels - 1)
    cp = pool_last_axis(corr, levels - 1)

    ref = np.asarray(disparity_lookup(gp, cp, disp, radius))
    gk, ck = to_kernel_layout(gp, cp)
    got = np.asarray(disparity_lookup_pallas_pre(
        gk, ck, disp, radius, interpret=True, gather=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    gk16, ck16 = to_kernel_layout(gp, cp, dtype=jnp.bfloat16)
    got16 = np.asarray(disparity_lookup_pallas_fused(
        gk16, ck16, disp, radius, interpret=True, gather=True))
    np.testing.assert_allclose(got16, ref, rtol=0.02, atol=0.05)


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


def test_cost_volume_parts_mode_matches_dense_corrstem(rng):
    """Consumer fusion: build_cost_volume_pallas(return_parts=True) feeding
    CorrStem's sliced 1x1 projection equals CorrStem on the materialized
    concat volume with the SAME parameters (checkpoint-compatible paths)."""
    import jax
    from foundationstereo_tpu.models.cost_filter import CorrStem

    b, h, w, c, p, d, g = 1, 3, 24, 16, 4, 10, 4
    l = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    lp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))
    rp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))

    dense = build_cost_volume_pallas(l, r, lp, rp, d, g, interpret=True)
    gwc, rps = build_cost_volume_pallas(l, r, lp, rp, d, g, interpret=True,
                                        return_parts=True)
    # Parts layout is (B, D, H, C', W) straight from the kernel's index map.
    np.testing.assert_allclose(
        np.asarray(gwc), np.asarray(dense[..., :g].transpose(0, 1, 2, 4, 3)),
        rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rps),
        np.asarray(dense[..., g + p:].transpose(0, 1, 2, 4, 3)),
        rtol=1e-6, atol=1e-6)

    stem = CorrStem(volume_dim=8)
    params = stem.init(jax.random.PRNGKey(0), dense)
    ref = np.asarray(stem.apply(params, dense))
    got = np.asarray(stem.apply(params, (gwc, rps, lp)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sharded_cost_volume_matches_unsharded(rng):
    """shard_map'd cost volume (explicit right-feature halo over 'spatial')
    equals the single-device build — including maxdisp > W/shards, where the
    halo spans multiple left neighbors."""
    import jax
    from foundationstereo_tpu.ops.pallas_kernels import (
        build_cost_volume_pallas_sharded,
    )
    from foundationstereo_tpu.parallel.mesh import make_mesh

    b, h, w, c, p, g = 1, 3, 32, 16, 4, 4
    l = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    lp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))
    rp = jnp.asarray(rng.standard_normal((b, h, w, p)).astype(np.float32))

    mesh = make_mesh(len(jax.devices()))  # (data, spatial)
    for d in (6, 16):  # 16 > 32/spatial_shards: halo crosses >1 neighbor
        ref = np.asarray(jnp.concatenate(
            [build_gwc_volume(l, r, d, g), build_concat_volume(lp, rp, d)],
            axis=-1))
        got = np.asarray(build_cost_volume_pallas_sharded(
            l, r, lp, rp, d, g, mesh=mesh, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_lookup_parts_mode_feeds_motion_encoder(rng):
    """return_parts skips the concat+transpose epilogue; the motion encoder
    contracting the parts against convc1 kernel slices must equal the dense
    path (shared parameters)."""
    import jax
    from foundationstereo_tpu.models.update import BasicMotionEncoder

    b, h, w, c, d, r = 1, 4, 32, 6, 16, 4
    geo = jnp.asarray(rng.standard_normal((b, h, w, c, d)).astype(np.float32))
    corr = jnp.asarray(rng.standard_normal((b, h, w, w)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0, d - 1, (b, h, w)).astype(np.float32))
    gp = pool_last_axis(geo, 3)
    cp = pool_last_axis(corr, 3)

    dense = disparity_lookup(gp, cp, disp, r)
    gk, ck = to_kernel_layout(gp, cp)
    for fused in (False, True):
        fn = disparity_lookup_pallas_fused if fused else disparity_lookup_pallas_pre
        parts = fn(gk, ck, disp, r, interpret=True, return_parts=True)
        feat = jnp.concatenate(list(parts), axis=1).transpose(0, 2, 1).reshape(b, h, w, -1)
        np.testing.assert_allclose(np.asarray(feat), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    enc = BasicMotionEncoder()
    dd = disp[..., None]
    v = enc.init(jax.random.PRNGKey(0), dd, dense)
    ref = enc.apply(v, dd, dense)
    got = enc.apply(v, dd, list(parts))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
