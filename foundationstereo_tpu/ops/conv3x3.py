"""Pallas TPU 3x3 stride-1 convolution (k3) — MXU dots instead of XLA's conv
lowering.

Motivation (measured on the v5e, scripts/bench_gru_micro.py): XLA lowers the
refine loop's 3x3 NHWC convolutions at 40-60 TF/s while plain matmuls on the
same chip sustain ~171 TF/s (ViT blocks, bench_logs/vit_full_r2.log). The GRU
update block — the largest single cost of the flagship pair (0.52 s / 32
iters) — is built almost entirely from such convs, so the conv-lowering gap
is the pole of the whole pipeline.

Design: one output row per grid step. The same pre-padded input array is
passed three times with row offsets i, i+1, i+2 (overlapping windows are not
expressible as one BlockSpec), the 3x3 kernel sits VMEM-resident as 9 (C, F)
matrices, and the step accumulates 9 dots (W, C) @ (C, F) in fp32. Compute
per step (W·C·F·18 FLOPs) vastly exceeds its ~3-row DMA, so the kernel is
MXU-bound by construction.

Used on the inference path only (training keeps XLA's differentiable conv);
numerics are exact vs lax.conv_general_dilated up to fp32 accumulation order.
Reference semantics: plain torch nn.Conv2d k3/s1/p1 blocks all over
core/update.py and core/submodule.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rows_kernel(x_hbm, k_ref, o_ref, scratch, sem, *, rb: int, w_out: int):
    """Row-block variant: one grid step computes ``rb`` output rows.

    The overlapping (rb+2)-row input window cannot be expressed as a
    BlockSpec (blocks tile disjointly), so the padded input stays in ANY
    memory and the kernel DMAs its window into VMEM scratch explicitly.
    Motivation: the one-row kernel has a fixed ~18 us/row pipeline overhead
    on the v5e (measured — per-row time barely moves between C=128 and 512),
    which caps it at XLA-conv speed; rb rows amortize it.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    cp = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * rb, rb + 2)], scratch, sem)
    cp.start()
    cp.wait()
    rows, wp2, c = scratch.shape
    f = k_ref.shape[-1]
    # One dot per TAP over the whole padded row block — the per-dot issue
    # overhead (~2 us) dominated the per-row formulation (9 dots x H rows);
    # here it amortizes over M = (rb+2)*wp2 rows. The flat reshape is
    # contiguous (full rows), so no VMEM relayout; the tap shift moves to a
    # strided slice of the dot OUTPUT, which is a cheap VPU add operand.
    flat = scratch[...].reshape(rows * wp2, c)
    acc = None
    for dy in range(3):
        for dx in range(3):
            z = jax.lax.dot_general(
                flat, k_ref[dy, dx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(rows, wp2, f)
            tap = z[dy:dy + rb, dx:dx + w_out]
            acc = tap if acc is None else acc + tap
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_row_block(w: int, wp2: int, c: int, f: int, bx: int, bo: int,
                    budget: float = 12e6) -> int:
    """Largest row block whose per-step VMEM footprint fits the budget:
    scratch + flat value (bx), per-tap dot output z + fp32 acc, resident
    weights, and the double-buffered output block."""
    for rb in (32, 16, 8, 4, 2, 1):
        est = ((rb + 2) * wp2 * c * bx          # scratch/flat
               + (rb + 2) * wp2 * f * 4         # z (fp32)
               + rb * w * f * 4                 # acc (fp32)
               + 9 * c * f * bx                 # weights
               + 2 * rb * w * f * bo)           # out block, double-buffered
        if est <= budget:
            return rb
    return 1


def conv3x3_pallas(x: jnp.ndarray, kernel: jnp.ndarray,
                   out_dtype=None, interpret: bool = False,
                   row_block: int | None = None) -> jnp.ndarray:
    """3x3 / stride 1 / padding 1 convolution of NHWC ``x`` with HWIO
    ``kernel`` — drop-in for ``lax.conv_general_dilated(x, k, (1, 1),
    [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))``.

    fp32 accumulation; output dtype defaults to the input dtype.
    ``row_block`` output rows are computed per grid step (H is padded up to a
    multiple; the pad rows are sliced off). VMEM budget per step ~=
    (row_block+2)(W+2)C + 9CF + row_block*W*F elements.
    """
    b, h, w, c = x.shape
    kh, kw, kc, f = kernel.shape
    assert (kh, kw) == (3, 3) and kc == c, (kernel.shape, x.shape)
    out_dtype = out_dtype or x.dtype

    # The DMA'd (rows, width, C) window needs its sublane (width) extent to
    # be a multiple of 8 (Mosaic tiling).
    wp2 = -(-(w + 2) // 8) * 8
    rb = row_block or _pick_row_block(
        w, wp2, c, f, jnp.dtype(x.dtype).itemsize, jnp.dtype(out_dtype).itemsize)
    # Pre-pad: 1 halo row on top, 1 + alignment rows at the bottom, 1 column
    # left plus right-alignment columns (zero padding = the conv's p=1).
    hp = -(-h // rb) * rb
    xp = jnp.pad(x, ((0, 0), (1, 1 + hp - h), (1, wp2 - 1 - w), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_rows_kernel, rb=rb, w_out=w),
        grid=(b, hp // rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, 3, c, f), lambda bi, yi: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, w, f), lambda bi, yi: (bi, yi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, f), out_dtype),
        scratch_shapes=[pltpu.VMEM((rb + 2, wp2, c), x.dtype),
                        pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(xp, kernel)
    return out[:, :h]
