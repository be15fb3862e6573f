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


def _gather_taps(vol_c, x, radius: int, D: int, W: int):
    """Sample the K=2r+1 taps around ``x`` from one (D, W) channel slab via a
    sublane gather instead of K tent contractions over D.

    All taps share x's fractional part (taps sit at integer offsets from x),
    so ONE pre-blended row set u[j] = vpad[j]*(1-f) + vpad[j+1]*f followed by
    a per-lane gather of K rows replaces the 2r+1 full multiply-reduce passes
    of the tent formulation — ~(3D + K) VPU ops per channel instead of ~18D.
    Zero-padding (r+1 rows each side) + index clipping reproduces the tent's
    zero out-of-range semantics exactly (torch grid_sample padding_mode=
    'zeros', align_corners=True — core/utils/utils.py:44-55).
    """
    r = radius
    K = 2 * r + 1
    M = D + 2 * r + 1
    i0f = jnp.floor(x)
    f = x - i0f                                            # (W,) in [0, 1)
    # u index j corresponds to volume position j - (r+1); tap m in [-r, r]
    # reads position i0+m -> j = i0 + m + r + 1 in [i0+1, i0+K]. Mosaic's
    # dynamic_gather lowering requires indices shaped like the operand
    # (jax pallas mosaic lowering: "Only 2D gather", idx == operand shape),
    # so build a full-height index grid and keep the first K gathered rows
    # (rows >= K are clipped-valid garbage, sliced away).
    idx = jnp.clip(
        i0f.astype(jnp.int32)[None, :]
        + jax.lax.broadcasted_iota(jnp.int32, (M, W), 0) + 1,
        0, M - 1)                                          # (M, W)
    zpad = jnp.zeros((r + 1, W), jnp.float32)
    vpad = jnp.concatenate([zpad, vol_c, zpad], axis=0)    # (D+2r+2, W)
    u = vpad[:-1] * (1.0 - f)[None, :] + vpad[1:] * f[None, :]   # (M, W)
    return jnp.take_along_axis(u, idx, axis=0)[:K]         # (K, W)


def _lookup_row_kernel_gather(disp_ref, vol_ref, out_ref, *, radius: int,
                              scale: float):
    """Gather-based variant of :func:`_lookup_row_kernel` (same contract)."""
    C, D, W = vol_ref.shape[1], vol_ref.shape[2], vol_ref.shape[3]
    x = disp_ref[0, 0, :].astype(jnp.float32) * scale      # (W,)

    def body(c, carry):
        vol_c = vol_ref[0, c].astype(jnp.float32)          # (D, W)
        out_ref[0, c, :, :] = _gather_taps(
            vol_c, x, radius, D, W).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, C, body, None)


def _lookup_row_kernel(disp_ref, vol_ref, out_ref, *, radius: int, scale: float):
    """One image row, width on the lane (minor) axis.

    vol (1, C, D, W), disp (1, 1, W) -> out (1, C, K, W). K lives on
    sublanes so nothing pads to 128 lanes.
    """
    C, D, W = vol_ref.shape[1], vol_ref.shape[2], vol_ref.shape[3]
    r = radius

    x = disp_ref[0, 0, :].astype(jnp.float32) * scale     # (W,)
    # Extended tent: Text[j, w] = relu(1 - |x[w] - (j - r)|), j in [0, D+2r)
    j = jax.lax.broadcasted_iota(jnp.int32, (D + 2 * r, W), 0).astype(jnp.float32) - float(r)
    text = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - j))  # (D+2r, W)

    # fori over channels (dynamic index on the untiled leading dim) keeps the
    # generated vector code compact — whole-block ops across (C, D, W) made
    # Mosaic compile times explode at full resolution.
    def body(c, carry):
        vol_c = vol_ref[0, c].astype(jnp.float32)          # (D, W)
        for k in range(-r, r + 1):
            t_k = text[r - k : r - k + D, :]               # (D, W)
            out_ref[0, c, k + r, :] = jnp.sum(
                vol_c * t_k, axis=0).astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, C, body, None)


def lookup_level_pallas(vol: jnp.ndarray, disp: jnp.ndarray, radius: int,
                        scale: float, interpret: bool = False,
                        out_dtype=jnp.float32,
                        gather: bool = False) -> jnp.ndarray:
    """Sample ``vol`` (R, C, D, W) at disp*scale + [-r..r] -> (R, C, K, W).

    Accumulation is fp32; ``out_dtype`` sets the stored dtype (bf16 halves
    the per-iteration HBM write+re-read of the tap features under mixed
    precision). ``gather=True`` uses the sublane-gather kernel (one blended
    row set + dynamic_gather per channel instead of K tent contractions)."""
    R, C, D, W = vol.shape
    K = 2 * radius + 1
    kernel = functools.partial(
        _lookup_row_kernel_gather if gather else _lookup_row_kernel,
        radius=radius, scale=scale)
    disp = disp.reshape(R, 1, W)  # trailing (1, W) satisfies block tiling rules
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, D, W), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, K, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C, K, W), out_dtype),
        interpret=interpret,
    )(disp, vol)


def to_kernel_layout(geo_pyramid, corr_pyramid, dtype=jnp.float32):
    """(B,H,W,C,D)/(B,H,W,W2) pyramids -> kernel layout (B,H,C,D,W)/(B,H,1,W2,W).

    Done once per forward (outside the GRU scan) so the per-iteration kernels
    read the pyramids directly with width on the lane axis. ``dtype=bfloat16``
    halves the dominant per-iteration HBM traffic of the refinement loop (the
    kernels accumulate in fp32 regardless).
    """
    geo_k = [g.astype(dtype).transpose(0, 1, 3, 4, 2) for g in geo_pyramid]
    corr_k = [c.astype(dtype).transpose(0, 1, 3, 2)[:, :, None] for c in corr_pyramid]
    return geo_k, corr_k


def _lookup_fused_kernel(disp_ref, xc_ref, *refs, radius: int, n_levels: int,
                         gather: bool = False):
    """All pyramid levels of one image row in a single kernel launch.

    refs = (g_0..g_{L-1}, c_0..c_{L-1}, out_g0, out_c0, ..., out_g{L-1}, ...):
    g_i (1, C, D_i, W), c_i (1, 1, W2_i, W); outputs (1, C, K, W)/(1, 1, K, W).
    One dispatch per GRU iteration instead of 2*L (dispatch + grid overheads
    amortize, and the disp row loads once).
    """
    r = radius
    vols = refs[:2 * n_levels]
    outs = refs[2 * n_levels:]
    disp = disp_ref[0, 0, :].astype(jnp.float32)   # (W,)
    xc = xc_ref[0, 0, :].astype(jnp.float32)       # (W,) corr coordinate

    for i in range(n_levels):
        scale = 1.0 / (2.0 ** i)
        for vol_ref, out_ref, x in ((vols[i], outs[2 * i], disp * scale),
                                    (vols[n_levels + i], outs[2 * i + 1],
                                     xc * scale)):
            C, D, W = vol_ref.shape[1], vol_ref.shape[2], vol_ref.shape[3]
            if gather:
                def body(c, carry, vol_ref=vol_ref, out_ref=out_ref, x=x, D=D,
                         W=W):
                    vol_c = vol_ref[0, c].astype(jnp.float32)  # (D, W)
                    out_ref[0, c, :, :] = _gather_taps(
                        vol_c, x, r, D, W).astype(out_ref.dtype)
                    return carry

                jax.lax.fori_loop(0, C, body, None)
                continue
            j = jax.lax.broadcasted_iota(
                jnp.int32, (D + 2 * r, W), 0).astype(jnp.float32) - float(r)
            text = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - j))

            def body(c, carry, vol_ref=vol_ref, out_ref=out_ref, text=text, D=D):
                vol_c = vol_ref[0, c].astype(jnp.float32)      # (D, W)
                for k in range(-r, r + 1):
                    t_k = text[r - k : r - k + D, :]
                    out_ref[0, c, k + r, :] = jnp.sum(
                        vol_c * t_k, axis=0).astype(out_ref.dtype)
                return carry

            jax.lax.fori_loop(0, C, body, None)


def disparity_lookup_pallas_fused(geo_k, corr_k, disp, radius: int,
                                  interpret: bool = False,
                                  x_offset=0, out_dtype=jnp.float32,
                                  return_parts: bool = False,
                                  gather: bool = False):
    """Single-dispatch-per-iteration lookup (all levels in one pallas_call).

    Same contract as :func:`disparity_lookup_pallas_pre`. REQUIRES 2-byte
    kernel layouts (``to_kernel_layout(..., dtype=bfloat16)``) at flagship
    scale — the fp32 working set of all levels double-buffers to ~24 MB/row,
    over the 16 MB VMEM budget (measured compile failure); bf16 fits.
    Falls back to the per-level kernels for wider dtypes.
    """
    if jnp.dtype(geo_k[0].dtype).itemsize > 2:
        return disparity_lookup_pallas_pre(geo_k, corr_k, disp, radius,
                                           interpret=interpret,
                                           x_offset=x_offset,
                                           out_dtype=out_dtype,
                                           return_parts=return_parts,
                                           gather=gather)
    b, h, w = disp.shape
    R = b * h
    K = 2 * radius + 1
    n_levels = len(geo_k)
    disp_rows = disp.reshape(R, 1, w)
    xc_rows = (jnp.arange(w, dtype=jnp.float32)[None, None, :] + x_offset
               - disp_rows)

    vols = ([g.reshape(R, g.shape[2], g.shape[3], w) for g in geo_k]
            + [c.reshape(R, 1, c.shape[3], w) for c in corr_k])
    kernel = functools.partial(_lookup_fused_kernel, radius=radius,
                               n_levels=n_levels, gather=gather)

    def vspec(v):
        return pl.BlockSpec((1,) + v.shape[1:], lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    part_dtype = out_dtype if return_parts else jnp.float32
    out_shapes, out_specs = [], []
    for i in range(n_levels):
        for C in (geo_k[i].shape[2], 1):
            out_shapes.append(jax.ShapeDtypeStruct((R, C, K, w), part_dtype))
            out_specs.append(pl.BlockSpec((1, C, K, w), lambda i: (i, 0, 0, 0),
                                          memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec((1, 1, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2
        + [vspec(v) for v in vols],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(disp_rows, xc_rows, *vols)

    parts = []
    for i in range(n_levels):
        g, c = outs[2 * i], outs[2 * i + 1]
        parts.append(g.reshape(R, -1, w))                     # (R, C*K, W)
        parts.append(c.reshape(R, K, w))
    if return_parts:
        return parts
    parts = [p.astype(out_dtype) for p in parts]
    feat = jnp.concatenate(parts, axis=1)
    return feat.transpose(0, 2, 1).reshape(b, h, w, -1)


def disparity_lookup_pallas_pre(geo_k, corr_k, disp, radius: int,
                                interpret: bool = False,
                                x_offset=0, out_dtype=jnp.float32,
                                return_parts: bool = False,
                                gather: bool = False):
    """Lookup from kernel-layout pyramids (see :func:`to_kernel_layout`).

    geo_k: levels of (B, H, C, D_l, W); corr_k: (B, H, 1, W_l, W);
    disp: (B, H, W). Output matches ops.sampler.disparity_lookup:
    [geo_l0, corr_l0, ...], C-major taps-fastest, fp32.

    ``x_offset`` is the global x coordinate of the first local column — 0 on
    a single chip; under width sharding (shard_map over 'spatial') each shard
    passes its global offset so the correlation lookup indexes the full-width
    right-image axis correctly.

    ``return_parts=True`` skips the concat+transpose epilogue and returns the
    raw kernel-layout parts [(B*H, C*K, W), (B*H, K, W), ...] fp32, in the
    standard channel order — the motion encoder contracts these directly
    against slices of its convc1 kernel (the epilogue transpose rides the
    MXU's layout handling instead of a separate HBM pass).
    """
    b, h, w = disp.shape
    disp_rows = disp.reshape(b * h, w)
    coords = jnp.arange(w, dtype=jnp.float32)[None, :] + x_offset
    K = 2 * radius + 1
    parts = []
    part_dtype = out_dtype if return_parts else jnp.float32
    for i, (geo, corr) in enumerate(zip(geo_k, corr_k)):
        scale = 1.0 / (2.0 ** i)
        c_dim, d_dim = geo.shape[2], geo.shape[3]
        g = lookup_level_pallas(geo.reshape(b * h, c_dim, d_dim, w),
                                disp_rows, radius, scale, interpret=interpret,
                                out_dtype=part_dtype, gather=gather)
        parts.append(g.reshape(b * h, c_dim * K, w))
        xc = coords - disp_rows
        c = lookup_level_pallas(corr.reshape(b * h, 1, corr.shape[3], w),
                                xc, radius, scale, interpret=interpret,
                                out_dtype=part_dtype, gather=gather)
        parts.append(c.reshape(b * h, K, w))
    if return_parts:
        return parts
    # One channel-concat + one large-minor transpose (a per-level transpose
    # to a 9-element minor axis is catastrophically slow on TPU). The
    # epilogue dominates the per-iteration cost at fp32 — cast to the
    # consumer's dtype first (the motion encoder runs bf16 under mixed
    # precision anyway), halving concat+transpose traffic.
    parts = [p.astype(out_dtype) for p in parts]
    feat = jnp.concatenate(parts, axis=1)            # (B*H, F, W)
    return feat.transpose(0, 2, 1).reshape(b, h, w, -1)


def disparity_lookup_pallas_sharded(geo_k, corr_k, disp, radius: int, mesh,
                                    axis: str = "spatial",
                                    interpret: bool = False,
                                    fused: bool = True,
                                    out_dtype=jnp.float32,
                                    gather: bool = False) -> jnp.ndarray:
    """Width-sharded Pallas lookup: shard_map over the mesh 'spatial' axis.

    The lookup is width-local — the geometry pyramids' sample axis is
    disparity and the correlation pyramids carry the full right-image axis
    (W2) per pixel — so sharding the *left* x axis (last axis of the kernel
    layout) needs no halo exchange at all; each shard only needs its global
    x offset for the correlation coordinates. This is the multi-chip fast
    path that keeps the Pallas kernel active under a mesh (the cost-volume
    build stays on the GSPMD-partitionable XLA formulation, whose measured
    single-chip cost vs Pallas is ~15 ms/pair at flagship scale).
    """
    n = mesh.shape[axis]
    b, h, w = disp.shape
    assert w % n == 0, (w, n)
    w_local = w // n
    dspec = "data" if ("data" in mesh.axis_names
                       and b % mesh.shape["data"] == 0
                       and mesh.shape["data"] > 1) else None
    spec5 = jax.sharding.PartitionSpec(dspec, None, None, None, axis)
    spec3 = jax.sharding.PartitionSpec(dspec, None, axis)
    out_spec = jax.sharding.PartitionSpec(dspec, None, axis, None)

    lookup = disparity_lookup_pallas_fused if fused else disparity_lookup_pallas_pre

    def local(geo_l, corr_l, disp_l):
        off = (jax.lax.axis_index(axis) * w_local).astype(jnp.float32)
        return lookup(list(geo_l), list(corr_l), disp_l, radius,
                      interpret=interpret, x_offset=off, out_dtype=out_dtype,
                      gather=gather)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tuple(spec5 for _ in geo_k), tuple(spec5 for _ in corr_k),
                  spec3),
        out_specs=out_spec,
        check_vma=False,
    )
    return f(tuple(geo_k), tuple(corr_k), disp)


def disparity_lookup_pallas(geo_pyramid, corr_pyramid, disp, radius: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas version of ops.sampler.disparity_lookup (fp32 out),
    taking the standard (B,H,W,C,D)/(B,H,W,W2) pyramid layout."""
    geo_k, corr_k = to_kernel_layout(geo_pyramid, corr_pyramid)
    return disparity_lookup_pallas_pre(geo_k, corr_k, disp, radius,
                                       interpret=interpret)


# ---------------------------------------------------------------------------
# k1: fused cost-volume build (gwc + concat)
# ---------------------------------------------------------------------------


def _cost_volume_row_kernel(ln_ref, rn_ref, rp_ref, gwc_ref, rps_ref,
                            rn_pad, rp_pad, *, maxdisp: int, num_groups: int,
                            out5d: bool = False):
    """One image row, width on the minor (lane) axis.

    ln/rn: (1, G, cg, W) L2-group-normalized features; rp: (1, P, W) projected
    12-ch right feature. Outputs: gwc (1, D, G, W) correlation rows and
    rps (1, D, P, W) disparity-shifted right projection (the left projection
    is d-invariant and concatenated outside the kernel).
    rn_pad/rp_pad: (…, W + D) VMEM scratch holding zero-padded right rows
    (the shift w-d < 0 -> 0 comes from slicing into the zero prefix).
    ``out5d``: output blocks are (1, D, 1, C', W) — the row-index singleton
    sits between D and C' so the array materializes directly as
    (B, D, H, C', W) with no epilogue transpose (see _cost_volume_rows).
    """
    G, cg, W = ln_ref.shape[1], ln_ref.shape[2], ln_ref.shape[3]
    P = rp_ref.shape[1]

    ln = ln_ref[0].astype(jnp.float32)          # (G, cg, W)

    rn_pad[:, :, 0:maxdisp] = jnp.zeros((G, cg, maxdisp), jnp.float32)
    rn_pad[:, :, maxdisp:] = rn_ref[0].astype(jnp.float32)
    rp_pad[:, 0:maxdisp] = jnp.zeros((P, maxdisp), jnp.float32)
    rp_pad[:, maxdisp:] = rp_ref[0].astype(jnp.float32)
    rn_all = rn_pad[:, :, :]
    rp_all = rp_pad[:, :]

    # Static unrolled disparity sweep: Mosaic cannot prove alignment for
    # dynamic lane-axis slices, but handles arbitrary static offsets.
    for d in range(maxdisp):
        rshift = rn_all[:, :, maxdisp - d : maxdisp - d + W]       # (G, cg, W)
        gwc = jnp.sum(ln * rshift, axis=1)                         # (G, W)
        rps = rp_all[:, maxdisp - d : maxdisp - d + W]
        if out5d:
            gwc_ref[0, d, 0, :, :] = gwc.astype(gwc_ref.dtype)
            rps_ref[0, d, 0, :, :] = rps.astype(rps_ref.dtype)
        else:
            gwc_ref[0, d, :, :] = gwc.astype(gwc_ref.dtype)
            rps_ref[0, d, :, :] = rps.astype(rps_ref.dtype)


def _cost_volume_row_kernel_roll(ln_ref, rn_ref, rp_ref, gwc_ref, rps_ref, *,
                                 maxdisp: int, num_groups: int):
    """Compact-codegen variant: fori over disparity with dynamic lane rotates.

    roll(x, d)[w] = x[w - d mod W]; masking w < d restores the zero shift —
    avoids both the unaligned-dynamic-slice restriction and the code blowup
    of a maxdisp-times unrolled sweep.
    """
    G, cg, W = ln_ref.shape[1], ln_ref.shape[2], ln_ref.shape[3]
    P = rp_ref.shape[1]
    ln = ln_ref[0].astype(jnp.float32)                    # (G, cg, W)
    rn = rn_ref[0].astype(jnp.float32)
    rp = rp_ref[0].astype(jnp.float32)                    # (P, W)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)  # (1, W)

    def body(d, carry):
        mask1 = (lane >= d)                                # (1, W)
        rolled = pltpu.roll(rn, d, 2)                      # (G, cg, W)
        rshift = jnp.where(mask1[None], rolled, 0.0)
        gwc_ref[0, pl.ds(d, 1), :, :] = jnp.sum(ln * rshift, axis=1)[None]
        rolled_p = pltpu.roll(rp, d, 1)                    # (P, W)
        rps_ref[0, pl.ds(d, 1), :, :] = jnp.where(mask1, rolled_p, 0.0)[None]
        return carry

    jax.lax.fori_loop(0, maxdisp, body, None)


def _cost_volume_row_kernel_haloed(ln_ref, rn_ref, rp_ref, gwc_ref, rps_ref,
                                   *, maxdisp: int, num_groups: int):
    """Halo variant of :func:`_cost_volume_row_kernel`: the right rows arrive
    PRE-PADDED with the ``maxdisp`` columns to the left of this width shard
    (zeros where the global column index is negative), so no VMEM scratch
    fill is needed — the disparity shift is a pure static slice.

    ln (1, G, cg, W) local left rows; rn (1, G, cg, maxdisp+W);
    rp (1, P, maxdisp+W). Outputs match the unsharded kernel.
    """
    G, cg, W = ln_ref.shape[1], ln_ref.shape[2], ln_ref.shape[3]
    ln = ln_ref[0].astype(jnp.float32)
    rn_all = rn_ref[0].astype(jnp.float32)
    rp_all = rp_ref[0].astype(jnp.float32)
    for d in range(maxdisp):
        rshift = rn_all[:, :, maxdisp - d : maxdisp - d + W]
        gwc_ref[0, d, :, :] = jnp.sum(ln * rshift, axis=1).astype(gwc_ref.dtype)
        rps_ref[0, d, :, :] = rp_all[:, maxdisp - d : maxdisp - d + W].astype(
            rps_ref.dtype)


def _cost_volume_rows(ln, rn, rp, maxdisp: int, num_groups: int,
                      interpret: bool, haloed: bool,
                      out_dtype=jnp.float32, bh=None):
    """Shared pallas_call plumbing: row-major inputs -> (gwc, rps) rows.

    ln (R, G, cg, W); rn/rp widths are W (haloed=False, kernel zero-pads in
    scratch) or maxdisp+W (haloed=True, pre-padded by the caller).

    ``bh=(B, H)`` (requires R == B*H) writes the outputs directly as
    (B, D, H, C', W) arrays — row i lands at [i // H, :, i % H] — so the
    consumer-fusion path (CorrStem on parts) needs NO epilogue transpose of
    the ~0.5 GB volume: the kernel's index map IS the transpose.
    """
    R, g, cg, w = ln.shape
    p = rp.shape[1]
    wr = rn.shape[-1]
    out5d = bh is not None
    if haloed:
        kernel = functools.partial(_cost_volume_row_kernel_haloed,
                                   maxdisp=maxdisp, num_groups=num_groups)
        scratch = []
    else:
        kernel = functools.partial(_cost_volume_row_kernel, maxdisp=maxdisp,
                                   num_groups=num_groups, out5d=out5d)
        scratch = [pltpu.VMEM((g, cg, w + maxdisp), jnp.float32),
                   pltpu.VMEM((p, w + maxdisp), jnp.float32)]
    if out5d:
        b, h = bh
        assert b * h == R, (bh, R)
        assert not haloed, "5D output layout is single-chip only"
        out_specs = (
            pl.BlockSpec((1, maxdisp, 1, g, w),
                         lambda i: (i // h, 0, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, maxdisp, 1, p, w),
                         lambda i: (i // h, 0, i % h, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((b, maxdisp, h, g, w), out_dtype),
            jax.ShapeDtypeStruct((b, maxdisp, h, p, w), out_dtype),
        )
    else:
        out_specs = (
            pl.BlockSpec((1, maxdisp, g, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, maxdisp, p, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((R, maxdisp, g, w), out_dtype),
            jax.ShapeDtypeStruct((R, maxdisp, p, w), out_dtype),
        )
    return pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, g, cg, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, cg, wr), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, wr), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(ln, rn, rp)


def build_cost_volume_pallas_sharded(left: jnp.ndarray, right: jnp.ndarray,
                                     left_proj: jnp.ndarray,
                                     right_proj: jnp.ndarray,
                                     maxdisp: int, num_groups: int, mesh,
                                     axis: str = "spatial",
                                     interpret: bool = False) -> jnp.ndarray:
    """Width-sharded fused cost volume: shard_map over the mesh 'spatial'
    axis with an explicit right-feature halo exchange.

    The disparity sweep at local column w needs right columns w-d for
    d < maxdisp, i.e. up to ``maxdisp`` columns owned by left neighbors
    (possibly several of them when maxdisp > W/shards). Each shard
    all-gathers the (much smaller than the volume) right features over ICI,
    slices its ``[off-maxdisp, off+W_local)`` window, and runs the Pallas row
    kernel on pre-haloed rows — the volume itself is produced already
    sharded, never materialized globally. Output (B, D, H, W, C') sharded on
    W (reference semantics: core/submodule.py:399-427).
    """
    n = mesh.shape[axis]
    b, h, w, c = left.shape
    p = left_proj.shape[-1]
    g = num_groups
    assert w % n == 0, (w, n)
    wl = w // n
    dspec = "data" if ("data" in mesh.axis_names
                       and b % mesh.shape["data"] == 0
                       and mesh.shape["data"] > 1) else None
    in_spec = jax.sharding.PartitionSpec(dspec, None, axis, None)
    out_spec = jax.sharding.PartitionSpec(dspec, None, None, axis, None)

    def local(l, r, lp, rp):
        bl = l.shape[0]
        rfull = jax.lax.all_gather(r, axis, axis=2, tiled=True)
        rpfull = jax.lax.all_gather(rp, axis, axis=2, tiled=True)
        off = jax.lax.axis_index(axis) * wl
        rpad = jnp.pad(rfull, ((0, 0), (0, 0), (maxdisp, 0), (0, 0)))
        rwin = jax.lax.dynamic_slice_in_dim(rpad, off, maxdisp + wl, axis=2)
        rppad = jnp.pad(rpfull, ((0, 0), (0, 0), (maxdisp, 0), (0, 0)))
        rpwin = jax.lax.dynamic_slice_in_dim(rppad, off, maxdisp + wl, axis=2)

        cg = c // g
        ln = group_normalize(l, g).reshape(bl * h, wl, g, cg).transpose(0, 2, 3, 1)
        rn = group_normalize(rwin, g).reshape(
            bl * h, maxdisp + wl, g, cg).transpose(0, 2, 3, 1)
        rpk = rpwin.reshape(bl * h, maxdisp + wl, p).astype(
            jnp.float32).transpose(0, 2, 1)
        gwc, rps = _cost_volume_rows(ln, rn, rpk, maxdisp, g, interpret,
                                     haloed=True)
        gwc = gwc.reshape(bl, h, maxdisp, g, wl).transpose(0, 2, 1, 4, 3)
        rps = rps.reshape(bl, h, maxdisp, p, wl).transpose(0, 2, 1, 4, 3)
        lp_b = jnp.broadcast_to(
            lp.astype(jnp.float32)[:, None], (bl, maxdisp, h, wl, p))
        return jnp.concatenate([gwc, lp_b, rps], axis=-1)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(in_spec, in_spec, in_spec, in_spec),
                      out_specs=out_spec, check_vma=False)
    return f(left, right, left_proj, right_proj)


def build_cost_volume_pallas(left: jnp.ndarray, right: jnp.ndarray,
                             left_proj: jnp.ndarray, right_proj: jnp.ndarray,
                             maxdisp: int, num_groups: int,
                             interpret: bool = False,
                             return_parts: bool = False,
                             out_dtype=jnp.float32):
    """Fused gwc+concat volume: (B, H, W, C)x2 + (B, H, W, P)x2 ->
    (B, D, H, W, G+2P) fp32, identical to concat([build_gwc_volume,
    build_concat_volume]) along channels.

    ``return_parts=True`` skips the whole epilogue (transpose of the ~0.5 GB
    volume + D-broadcast of the left projection + 32-ch concat) and returns
    ``(gwc, rps)`` with shapes (B, D, H, G, W) / (B, D, H, P, W) in
    ``out_dtype`` — written in that order directly by the kernel's index map.
    The consumer (CorrStem's 1x1 proj, core/foundation_stereo.py:164-169
    semantics) contracts these against slices of its kernel and adds the
    d-invariant left-projection term once, reading the parts exactly once.
    """
    b, h, w, c = left.shape
    p = left_proj.shape[-1]
    g = num_groups
    cg = c // g
    # Width-minor, group-shaped inputs: Mosaic cannot split a minor dim
    # in-kernel, and channel-minor blocks would pad channels to 128 lanes.
    ln = group_normalize(left, g).reshape(b * h, w, g, cg).transpose(0, 2, 3, 1)
    rn = group_normalize(right, g).reshape(b * h, w, g, cg).transpose(0, 2, 3, 1)
    rp = right_proj.reshape(b * h, w, p).astype(jnp.float32).transpose(0, 2, 1)

    if return_parts:
        gwc, rps = _cost_volume_rows(ln, rn, rp, maxdisp, g, interpret,
                                     haloed=False, out_dtype=out_dtype,
                                     bh=(b, h))
        return gwc, rps

    gwc, rps = _cost_volume_rows(ln, rn, rp, maxdisp, g, interpret,
                                 haloed=False)
    # (B*H, D, C', W) -> (B, D, H, W, C'); left projection broadcasts over D.
    gwc = gwc.reshape(b, h, maxdisp, g, w).transpose(0, 2, 1, 4, 3)
    rps = rps.reshape(b, h, maxdisp, p, w).transpose(0, 2, 1, 4, 3)
    lp_b = jnp.broadcast_to(
        left_proj.astype(jnp.float32)[:, None], (b, maxdisp, h, w, p))
    return jnp.concatenate([gwc, lp_b, rps], axis=-1)
