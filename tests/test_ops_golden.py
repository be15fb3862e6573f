"""Golden tests: core ops vs torch reference semantics (torch CPU).

Each test reconstructs the exact torch computation the reference performs
(interpolation, grid_sample lookup, cost-volume loops, unfold upsampling,
pooling) and checks our channel-last JAX ops against it.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from foundationstereo_tpu.ops import (
    InputPadder,
    all_pairs_correlation,
    avg_pool2d,
    build_concat_volume,
    build_gwc_volume,
    context_upsample,
    disparity_regression,
    gather_1d_lerp,
    resize2d,
)
from foundationstereo_tpu.ops.resize import resize_dhw
from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis


def to_nchw(x):
    return np.moveaxis(x, -1, 1)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


@pytest.mark.parametrize("mode,align", [
    ("bilinear", False), ("bilinear", True),
    ("bicubic", False), ("bicubic", True),
    ("nearest", None),
])
@pytest.mark.parametrize("shape_out", [(17, 29), (64, 48), (7, 5)])
def test_resize2d_matches_torch(rng, mode, align, shape_out):
    x = rng.standard_normal((2, 13, 21, 3)).astype(np.float32)
    t = torch.from_numpy(to_nchw(x))
    kwargs = {} if align is None else {"align_corners": align}
    ref = F.interpolate(t, size=shape_out, mode=mode, **kwargs).numpy()
    got = np.asarray(resize2d(jnp.asarray(x), shape_out, mode, bool(align)))
    np.testing.assert_allclose(got, to_nhwc(ref), rtol=1e-5, atol=1e-5)


def test_resize2d_via_matches_two_step(rng):
    """Composed up->down interpolation == the two explicit resizes (the DPT
    'out' tap fast path; linear maps compose exactly)."""
    from foundationstereo_tpu.ops.resize import resize2d_via

    x = jnp.asarray(rng.standard_normal((2, 16, 24, 5)).astype(np.float32))
    for mid, out in (((56, 96), (13, 20)), ((64, 64), (64, 64)), ((8, 12), (32, 48))):
        two = resize2d(resize2d(x, mid, "bilinear", True), out, "bilinear", True)
        one = resize2d_via(x, mid, out, "bilinear", True)
        np.testing.assert_allclose(np.asarray(one), np.asarray(two),
                                   rtol=1e-5, atol=1e-5)


def test_resize_trilinear_matches_torch(rng):
    x = rng.standard_normal((1, 6, 8, 10, 4)).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(x, -1, 1))  # (B,C,D,H,W)
    ref = F.interpolate(t, scale_factor=4, mode="trilinear", align_corners=False).numpy()
    got = np.asarray(resize_dhw(jnp.asarray(x), (24, 32, 40), "trilinear", False))
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-5, atol=1e-5)


def test_input_padder_matches_torch(rng):
    x = rng.standard_normal((1, 37, 53, 3)).astype(np.float32)
    t = torch.from_numpy(to_nchw(x))
    # reference InputPadder semantics (core/utils/utils.py:17-41)
    ht, wd = 37, 53
    pad_ht = (((ht // 32) + 1) * 32 - ht) % 32
    pad_wd = (((wd // 32) + 1) * 32 - wd) % 32
    pad = [pad_wd // 2, pad_wd - pad_wd // 2, pad_ht // 2, pad_ht - pad_ht // 2]
    ref = F.pad(t, pad, mode="replicate").numpy()

    padder = InputPadder(x.shape, divis_by=32)
    got = np.asarray(padder.pad(jnp.asarray(x)))
    np.testing.assert_allclose(got, to_nhwc(ref), atol=0)
    back = np.asarray(padder.unpad(jnp.asarray(got)))
    np.testing.assert_allclose(back, x, atol=0)


def test_gather_1d_lerp_matches_grid_sample(rng):
    # the reference bilinear_sampler: (N,C,1,L) volume, pixel coords, zeros pad
    n, c, L, k = 6, 5, 23, 9
    vol = rng.standard_normal((n, c, 1, L)).astype(np.float32)
    x = (rng.uniform(-3, L + 2, size=(n, 1, k, 1))).astype(np.float32)
    xg = 2 * x / (L - 1) - 1
    grid = torch.from_numpy(np.concatenate([xg, np.zeros_like(xg)], axis=-1))
    ref = F.grid_sample(torch.from_numpy(vol), grid, align_corners=True).numpy()  # (n,c,1,k)

    got = np.asarray(gather_1d_lerp(jnp.asarray(vol[:, :, 0, :]), jnp.asarray(x[:, 0, :, 0])[:, None, :]))
    np.testing.assert_allclose(got, ref[:, :, 0, :], rtol=1e-5, atol=1e-5)


def _torch_group_corr(fea1, fea2, num_groups):
    B, C, H, W = fea1.shape
    cpg = C // num_groups
    f1 = fea1.reshape(B, num_groups, cpg, H, W)
    f2 = fea2.reshape(B, num_groups, cpg, H, W)
    return (F.normalize(f1, dim=2) * F.normalize(f2, dim=2)).sum(dim=2)


def _torch_gwc_volume(l, r, maxdisp, groups):
    B, C, H, W = l.shape
    vol = torch.zeros(B, groups, maxdisp, H, W)
    for i in range(maxdisp):
        if i > 0:
            vol[:, :, i, :, i:] = _torch_group_corr(l[:, :, :, i:], r[:, :, :, :-i], groups)
        else:
            vol[:, :, i] = _torch_group_corr(l, r, groups)
    return vol


@pytest.mark.parametrize("w,maxdisp", [(40, 12), (37, 20), (64, 48)])
def test_build_gwc_volume_matches_torch(rng, w, maxdisp):
    b, h, c, g = 2, 6, 16, 4
    l = rng.standard_normal((b, h, w, c)).astype(np.float32)
    r = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ref = _torch_gwc_volume(torch.from_numpy(to_nchw(l)), torch.from_numpy(to_nchw(r)),
                            maxdisp, g).numpy()  # (B,G,D,H,W)
    got = np.asarray(build_gwc_volume(jnp.asarray(l), jnp.asarray(r), maxdisp, g))
    # ours: (B,D,H,W,G)
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 4, 1), rtol=1e-4, atol=1e-5)


def test_build_concat_volume_matches_torch(rng):
    b, h, w, c, maxdisp = 2, 5, 19, 6, 9
    l = rng.standard_normal((b, h, w, c)).astype(np.float32)
    r = rng.standard_normal((b, h, w, c)).astype(np.float32)
    lt, rt = torch.from_numpy(to_nchw(l)), torch.from_numpy(to_nchw(r))
    ref = torch.zeros(b, 2 * c, maxdisp, h, w)
    for i in range(maxdisp):
        ref[:, :c, i] = lt
        if i > 0:
            ref[:, c:, i, :, i:] = rt[:, :, :, :-i]
        else:
            ref[:, c:, i] = rt
    ref = ref.numpy()
    got = np.asarray(build_concat_volume(jnp.asarray(l), jnp.asarray(r), maxdisp))
    np.testing.assert_allclose(got, ref.transpose(0, 2, 3, 4, 1), rtol=1e-6, atol=1e-6)


def test_all_pairs_correlation_matches_torch(rng):
    b, c, h, w = 2, 12, 5, 17
    l = rng.standard_normal((b, h, w, c)).astype(np.float32)
    r = rng.standard_normal((b, h, w, c)).astype(np.float32)
    lt, rt = torch.from_numpy(to_nchw(l)), torch.from_numpy(to_nchw(r))
    ref = torch.einsum("aijk,aijh->ajkh", F.normalize(lt, dim=1), F.normalize(rt, dim=1)).numpy()
    got = np.asarray(all_pairs_correlation(jnp.asarray(l), jnp.asarray(r)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_disparity_regression(rng):
    b, d, h, w = 2, 16, 5, 7
    logits = rng.standard_normal((b, d, h, w)).astype(np.float32)
    prob = torch.softmax(torch.from_numpy(logits), dim=1)
    dv = torch.arange(d, dtype=torch.float32).reshape(1, d, 1, 1)
    ref = torch.sum(prob * dv, 1).numpy()
    got = np.asarray(disparity_regression(jnp.asarray(np.asarray(prob)), d))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_context_upsample_matches_torch(rng):
    b, h, w = 2, 6, 9
    disp = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    weights = rng.standard_normal((b, 9, 4 * h, 4 * w)).astype(np.float32)
    weights = torch.softmax(torch.from_numpy(weights), 1)
    dt = torch.from_numpy(disp)
    unfolded = F.unfold(dt, 3, 1, 1).reshape(b, -1, h, w)
    unfolded = F.interpolate(unfolded, (h * 4, w * 4), mode="nearest").reshape(b, 9, h * 4, w * 4)
    ref = (unfolded * weights).sum(1).numpy()

    got = np.asarray(context_upsample(
        jnp.asarray(disp[:, 0]), jnp.asarray(np.moveaxis(np.asarray(weights), 1, -1))))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_spx_phased_upsample_matches_interleaved(rng):
    """_SpxGruPhases + context_upsample_phased == ConvTranspose + softmax +
    context_upsample, with SHARED parameters (the phased path is a pure
    layout re-arrangement of the spx convex-upsample head)."""
    import jax
    from foundationstereo_tpu.models.foundation_stereo import _SpxGruPhases
    from foundationstereo_tpu.models.layers import ConvTranspose
    from foundationstereo_tpu.ops.upsample import context_upsample_phased

    b, h, w, c = 2, 6, 8, 5
    x = jnp.asarray(rng.standard_normal((b, 2 * h, 2 * w, c)).astype(np.float32))
    disp = jnp.asarray(rng.uniform(0, 10, (b, h, w)).astype(np.float32))

    old = ConvTranspose(9, 4, 2, 1)
    v = old.init(jax.random.PRNGKey(0), x)
    ref = context_upsample(disp * 4.0, jax.nn.softmax(old.apply(v, x), axis=-1))

    logits = _SpxGruPhases().apply(v, x)           # (B, 4, 9, 2h, 2w)
    got = context_upsample_phased(disp * 4.0, jax.nn.softmax(logits, axis=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_avg_pool2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 12, 5)).astype(np.float32)
    ref = F.avg_pool2d(torch.from_numpy(to_nchw(x)), 3, stride=2, padding=1).numpy()
    got = np.asarray(avg_pool2d(jnp.asarray(x)))
    np.testing.assert_allclose(got, to_nhwc(ref), rtol=1e-5, atol=1e-6)


def test_disparity_lookup_matches_reference(rng):
    """End-to-end check of the geometry pyramid + lookup vs the reference math."""
    b, h, w, c, d, levels, radius = 1, 4, 24, 3, 16, 3, 2
    geo = rng.standard_normal((b, h, w, c, d)).astype(np.float32)
    corr = rng.standard_normal((b, h, w, w)).astype(np.float32)
    disp = (rng.uniform(0, d - 1, size=(b, h, w))).astype(np.float32)

    # Reference: build pyramids with avg_pool2d [1,2], then grid_sample lookups.
    geo_t = torch.from_numpy(geo.reshape(b * h * w, c, 1, d))
    corr_t = torch.from_numpy(corr.reshape(b * h * w, 1, 1, w))
    geo_pyr, corr_pyr = [geo_t], [corr_t]
    for _ in range(levels - 1):
        geo_pyr.append(F.avg_pool2d(geo_pyr[-1], [1, 2], stride=[1, 2]))
        corr_pyr.append(F.avg_pool2d(corr_pyr[-1], [1, 2], stride=[1, 2]))

    dx = torch.linspace(-radius, radius, 2 * radius + 1).reshape(1, 1, 2 * radius + 1, 1)
    disp_t = torch.from_numpy(disp)
    coords = torch.arange(w, dtype=torch.float32).reshape(1, 1, w, 1).repeat(b, h, 1, 1)
    out_parts = []
    for i in range(levels):
        gv = geo_pyr[i]
        x0 = dx + disp_t.reshape(b * h * w, 1, 1, 1) / 2 ** i
        y0 = torch.zeros_like(x0)
        L = gv.shape[-1]
        xg = 2 * x0 / (L - 1) - 1
        grid = torch.cat([xg, y0], dim=-1)
        sampled = F.grid_sample(gv, grid, align_corners=True)
        out_parts.append(sampled.reshape(b, h, w, -1))
        cv = corr_pyr[i]
        Lc = cv.shape[-1]
        init_x0 = coords.reshape(b * h * w, 1, 1, 1) / 2 ** i - disp_t.reshape(b * h * w, 1, 1, 1) / 2 ** i + dx
        xg = 2 * init_x0 / (Lc - 1) - 1
        grid = torch.cat([xg, y0], dim=-1)
        sampled = F.grid_sample(cv, grid, align_corners=True)
        out_parts.append(sampled.reshape(b, h, w, -1))
    ref = torch.cat(out_parts, dim=-1).numpy()

    geo_pyramid = pool_last_axis(jnp.asarray(geo), levels - 1)
    corr_pyramid = pool_last_axis(jnp.asarray(corr), levels - 1)
    got = np.asarray(disparity_lookup(geo_pyramid, corr_pyramid, jnp.asarray(disp), radius))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_resize2d_bf16_policy(rng):
    """2-byte float inputs interpolate at their own width (fp32 accumulation):
    the result must stay close to the fp32 reference (bf16 weight rounding
    only) and keep the input dtype — the mixed-precision fast path added in
    round 4 (ops/resize.py _apply_axis)."""
    x = rng.standard_normal((2, 13, 21, 8)).astype(np.float32)
    ref = np.asarray(resize2d(jnp.asarray(x), (26, 42), "bilinear", True))
    got = resize2d(jnp.asarray(x, jnp.bfloat16), (26, 42), "bilinear", True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=0.03, atol=0.05)
