"""Pallas TPU kernels for the hot ops (SOL targets from BASELINE.json).

k1 — fused cost-volume build: one pass per image row keeps the normalized
     left/right feature rows in VMEM and sweeps the disparity axis with
     in-VMEM dynamic slices, emitting the combined (gwc + concat) volume.
     HBM traffic ~= read features once + write the volume once (the XLA
     fallback re-reads the feature maps once per disparity step).

k2 — disparity lookup: one pass per image row keeps the (W, C, D) geometry
     slab in VMEM, builds an extended tent row per pixel, and accumulates
     the 2r+1 taps via static shifts — HBM traffic == read the pyramid once
     per GRU iteration, the bandwidth lower bound for this access pattern.

Both kernels are inference-path implementations; training uses the
differentiable XLA formulations in ops/cost_volume.py and ops/sampler.py
(numerically identical — verified by tests against them).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foundationstereo_tpu.ops.cost_volume import group_normalize


# ---------------------------------------------------------------------------
# k2: disparity lookup
# ---------------------------------------------------------------------------


def _lookup_row_kernel(disp_ref, vol_ref, out_ref, *, radius: int, scale: float):
    """One image row: vol (1, W, C, D), disp (1, 1, W) -> out (1, W, C, K)."""
    W, C, D = vol_ref.shape[1], vol_ref.shape[2], vol_ref.shape[3]
    r = radius
    K = 2 * r + 1
    x = disp_ref[0, 0, :].astype(jnp.float32) * scale     # (W,)

    # Extended tent row: Text[w, j] = relu(1 - |x[w] - (j - r)|), j in [0, D+2r)
    j = jax.lax.broadcasted_iota(jnp.int32, (W, D + 2 * r), 1).astype(jnp.float32) - float(r)
    text = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - j))  # (W, D+2r)

    vol = vol_ref[0].astype(jnp.float32)                   # (W, C, D)
    for k in range(-r, r + 1):
        t_k = text[:, r - k : r - k + D]                   # (W, D)
        acc = jnp.sum(vol * t_k[:, None, :], axis=-1)      # (W, C)
        out_ref[0, :, :, k + r] = acc


def lookup_level_pallas(vol: jnp.ndarray, disp: jnp.ndarray, radius: int,
                        scale: float, interpret: bool = False) -> jnp.ndarray:
    """Sample ``vol`` (R, W, C, D) at disp*scale + [-r..r] -> (R, W, C, K)."""
    R, W, C, D = vol.shape
    K = 2 * radius + 1
    kernel = functools.partial(_lookup_row_kernel, radius=radius, scale=scale)
    disp = disp.reshape(R, 1, W)  # trailing (1, W) satisfies block tiling rules
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, C, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, W, C, K), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, W, C, K), jnp.float32),
        interpret=interpret,
    )(disp, vol)


def disparity_lookup_pallas(geo_pyramid, corr_pyramid, disp, radius: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas version of ops.sampler.disparity_lookup (fp32 out).

    geo_pyramid: levels of (B, H, W, C, D_l); corr_pyramid: (B, H, W, W_l);
    disp: (B, H, W). Output matches the XLA version bit-for-bit-ish:
    [geo_l0, corr_l0, geo_l1, corr_l1, ...], C-major taps-fastest.
    """
    b, h, w = disp.shape
    disp_rows = disp.reshape(b * h, w)
    coords = jnp.arange(w, dtype=jnp.float32)[None, :]
    out = []
    for i, (geo, corr) in enumerate(zip(geo_pyramid, corr_pyramid)):
        scale = 1.0 / (2.0 ** i)
        g = lookup_level_pallas(
            geo.reshape(b * h, w, geo.shape[-2], geo.shape[-1]),
            disp_rows, radius, scale, interpret=interpret)
        out.append(g.reshape(b, h, w, -1))
        # Correlation: positions (x_left - disp) * scale; reuse the kernel
        # with C=1 and per-pixel coordinates folded into "disp".
        xc = (coords - disp_rows)
        c = lookup_level_pallas(
            corr.reshape(b * h, w, 1, corr.shape[-1]),
            xc, radius, scale, interpret=interpret)
        out.append(c.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


# ---------------------------------------------------------------------------
# k1: fused cost-volume build (gwc + concat)
# ---------------------------------------------------------------------------


def _cost_volume_row_kernel(ln_ref, rn_ref, lp_ref, rp_ref, out_ref,
                            rn_pad, rp_pad, *, maxdisp: int, num_groups: int):
    """One image row.

    ln/rn: (1, W, C) L2-group-normalized features; lp/rp: (1, W, P) projected
    12-ch features. out: (1, D, W, G + 2P) fp32 — [gwc | left-proj | right-
    proj-shifted] matching the reference's channel concatenation.
    rn_pad/rp_pad: (W + D, C/P) VMEM scratch holding zero-padded right rows
    (the shift w-d < 0 -> 0 comes from slicing into the zero prefix).
    """
    W, G, cg = ln_ref.shape[1], ln_ref.shape[2], ln_ref.shape[3]
    P = lp_ref.shape[2]

    ln = ln_ref[0].astype(jnp.float32)          # (W, G, cg)
    lp = lp_ref[0].astype(jnp.float32)          # (W, P)

    rn_pad[0:maxdisp] = jnp.zeros((maxdisp, G, cg), jnp.float32)
    rn_pad[maxdisp:] = rn_ref[0].astype(jnp.float32)
    rp_pad[0:maxdisp] = jnp.zeros((maxdisp, P), jnp.float32)
    rp_pad[maxdisp:] = rp_ref[0].astype(jnp.float32)

    def body(d, carry):
        rshift = rn_pad[pl.ds(maxdisp - d, W)]                     # (W, G, cg)
        gwc = jnp.sum(ln * rshift, axis=-1)                        # (W, G)
        rpshift = rp_pad[pl.ds(maxdisp - d, W)]                    # (W, P)
        row = jnp.concatenate([gwc, lp, rpshift], axis=-1)         # (W, G+2P)
        out_ref[0, pl.ds(d, 1), :, :] = row[None]
        return carry

    jax.lax.fori_loop(0, maxdisp, body, None)


def build_cost_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                             left_proj: jnp.ndarray, right_proj: jnp.ndarray,
                             maxdisp: int, num_groups: int,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused gwc+concat volume: (B, H, W, C)x2 + (B, H, W, P)x2 ->
    (B, D, H, W, G+2P) fp32, identical to concat([build_gwc_volume,
    build_concat_volume]) along channels."""
    b, h, w, c = left.shape
    p = left_proj.shape[-1]
    g = num_groups
    cg = c // g
    # Group-shaped (…, G, cg) inputs: Mosaic cannot split a minor dim
    # in-kernel, so the reshape happens here.
    ln = group_normalize(left, g).reshape(b * h, w, g, cg)
    rn = group_normalize(right, g).reshape(b * h, w, g, cg)
    lp = left_proj.reshape(b * h, w, p).astype(jnp.float32)
    rp = right_proj.reshape(b * h, w, p).astype(jnp.float32)

    kernel = functools.partial(_cost_volume_row_kernel, maxdisp=maxdisp,
                               num_groups=g)
    out = pl.pallas_call(
        kernel,
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, w, g, cg), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, g, cg), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, maxdisp, w, g + 2 * p), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, maxdisp, w, g + 2 * p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((w + maxdisp, g, cg), jnp.float32),
            pltpu.VMEM((w + maxdisp, p), jnp.float32),
        ],
        interpret=interpret,
    )(ln, rn, lp, rp)
    return out.reshape(b, h, maxdisp, w, g + 2 * p).transpose(0, 2, 1, 3, 4)
