"""Building-block layers (flax.linen, channel-last NHWC / NDHWC).

TPU-native re-implementations of the reference's block zoo
(core/submodule.py, core/extractor.py:20-80, core/update.py:20-48): same
math and tensor contracts, but channel-last layouts, explicit torch-parity
transposed convolutions, and fp32 normalization statistics under a bf16
compute policy.

`dtype` on each module is the *compute* dtype (autocast analog); parameters
are always stored fp32.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


Dtype = Any

# Default for Conv.tap_stack, captured ONCE at import so the choice cannot
# silently diverge between modules traced at different times in one process
# (ADVICE r3). Opt-in: measured slower on the v5e (docs/NOTES_ROUND3.md).
TAP_STACK_DEFAULT = os.environ.get("FSTPU_TAP_STACK") == "1"

# Trace-time switch for the Pallas 3x3 conv kernel (ops/conv3x3.py). XLA's
# conv lowering runs the refine loop's 3x3 convs at 40-60 TF/s on the v5e
# while the same chip sustains ~171 TF/s on matmuls (bench_gru_micro) — the
# kernel evaluates the conv as 9 VMEM-resident MXU dots per row instead.
# Enabled by FoundationStereo around single-chip TPU inference traces only
# (pallas_call has no autodiff or SPMD partitioning rule).
_PALLAS_CONV3X3 = {"enabled": False, "interpret": False}


class pallas_conv3x3_scope:
    """Trace-time context: route eligible 3x3/s1/p1 2D convs through the
    Pallas kernel. ``interpret=True`` is for CPU tests.

    Retrace caveat (ADVICE r4): the flag is process-global TRACE-TIME state
    and is NOT part of any ``jax.jit`` cache key. A function first traced
    inside this scope bakes the Pallas routing into its compiled executable
    and keeps it on later calls outside the scope (and vice versa); it is
    also not thread-safe. ``FoundationStereo.__call__`` enters the scope
    inside its own trace so the model path is always consistent, but direct
    ``jit(conv2d_op)``-style users must either trace under the scope they
    want permanently, or pass routing explicitly. Not thread-safe: do not
    toggle concurrently from multiple tracing threads."""

    def __init__(self, enabled: bool, interpret: bool = False):
        self.state = {"enabled": enabled, "interpret": interpret}

    def __enter__(self):
        self.saved = dict(_PALLAS_CONV3X3)
        _PALLAS_CONV3X3.update(self.state)
        return self

    def __exit__(self, *exc):
        _PALLAS_CONV3X3.update(self.saved)
        return False


def _pallas3x3_eligible(ks, st, pd, dl, groups: int, c: int, f: int) -> bool:
    """Single source of truth for the Pallas 3x3 conv fast path: flag on,
    k=3x3, stride 1, padding 1, no dilation/groups, and wide enough channels
    that the per-row (W, C) @ (C, F) dots occupy the MXU (C >= 128, F >= 64 —
    narrower shapes measured no better than XLA's conv)."""
    pd = tuple(tuple(p) if isinstance(p, (tuple, list)) else (p, p)
               for p in pd)
    return (_PALLAS_CONV3X3["enabled"] and tuple(ks) == (3, 3)
            and tuple(st) == (1, 1) and pd == ((1, 1), (1, 1))
            and tuple(dl) == (1, 1) and groups == 1
            and c >= 128 and f >= 64)


def conv2d_op(x, kernel, strides, padding, dilation=(1, 1), groups: int = 1):
    """lax.conv_general_dilated NHWC/HWIO with the Pallas 3x3 fast path
    (see :func:`_pallas3x3_eligible`)."""
    kh, kw, c, f = kernel.shape
    if _pallas3x3_eligible((kh, kw), strides, padding, dilation, groups, c, f):
        from foundationstereo_tpu.ops.conv3x3 import conv3x3_pallas

        return conv3x3_pallas(x, kernel,
                              interpret=_PALLAS_CONV3X3["interpret"])
    pad = [tuple(p) if isinstance(p, (tuple, list)) else (p, p)
           for p in padding]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=tuple(strides), padding=pad,
        rhs_dilation=tuple(dilation), feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ntuple(x, n):
    if isinstance(x, (tuple, list)):
        assert len(x) == n
        return tuple(x)
    return (x,) * n


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.01)


def gelu(x):
    return nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------


class _ConvParams(nn.Module):
    """Bare conv parameter container.

    Used by :class:`Conv`'s folded-3D fast path so the parameter tree keeps
    the exact `<name>/Conv_0/kernel` paths that nn.Conv would create (the
    checkpoint converter's name map depends on them)."""

    shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            self.shape, jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


class Conv(nn.Module):
    """Plain convolution with torch-style int padding. ndim = len(kernel_size).

    Degenerate 3D kernels are folded to 2D convolutions automatically —
    (1,k,k) folds the disparity axis into batch, (kd,1,1) folds H*W into one
    spatial axis. XLA lowers small-channel 3D convolutions poorly (measured
    ~3.5 TF/s on the 28-channel APC blocks at flagship scale); the folded 2D
    forms are numerically identical and keep identical parameter paths."""

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    # Stacked-tap variant of the full-3D decomposition (see below). None =
    # module default captured at import (TAP_STACK_DEFAULT); explicit
    # True/False overrides per instance.
    tap_stack: bool | None = None

    @nn.compact
    def __call__(self, x):
        n = len(self.kernel_size) if isinstance(self.kernel_size, (tuple, list)) else x.ndim - 2
        ks = _ntuple(self.kernel_size, n)
        st = _ntuple(self.strides, n)
        pd = [(p, p) for p in _ntuple(self.padding, n)]
        dl = _ntuple(self.dilation, n)

        if (n == 3 and x.ndim == 5 and dl == (1, 1, 1)
                and self.groups == x.shape[-1] == self.features
                and ks == st and pd == [(0, 0)] * 3):
            # Depthwise patchify conv (kernel == stride, e.g. the DT branch's
            # 4^3/4 conv_patch): a per-channel weighted sum over disjoint
            # blocks — a reshape + einsum, no conv lowering needed.
            in_ch = x.shape[-1]
            kernel, bias = _ConvParams(ks + (1, self.features),
                                       self.use_bias, name="Conv_0")()
            B, D, H, W, C = x.shape
            kd, kh, kw = ks
            xb = x.reshape(B, D // kd, kd, H // kh, kh, W // kw, kw, C)
            y = jnp.einsum("bdihjwkc,ijkc->bdhwc", xb.astype(self.dtype),
                           kernel[..., 0, :].astype(self.dtype))
            if bias is not None:
                y = y + bias.astype(self.dtype)
            return y

        if (n == 3 and x.ndim == 5 and self.groups == 1 and dl == (1, 1, 1)
                and ks[0] > 1 and (ks[1] > 1 or ks[2] > 1)):
            # Full (non-degenerate) 3D convolution: decompose into ks[0]
            # 2D convolutions over (B*D, H, W) summed with D-shifts. XLA's
            # NDHWC conv3d lowering runs the narrow-channel cost-filter
            # convs at 7-9 TF/s on this chip; the decomposed 2D form hits
            # 22-36 TF/s (measured; exact numerics — same products, fp32
            # accumulation either way).
            in_ch = x.shape[-1]
            kernel, bias = _ConvParams(ks + (in_ch, self.features),
                                       self.use_bias, name="Conv_0")()
            B, D, H, W, C = x.shape
            kd3 = kernel.astype(self.dtype)
            x2 = x.astype(self.dtype).reshape(B * D, H, W, C)
            d_out = (D + 2 * pd[0][0] - ks[0]) // st[0] + 1
            F = self.features

            def tap_slice(y5, t):
                yp = jnp.pad(y5, ((0, 0), (pd[0][0], pd[0][0]), (0, 0),
                                  (0, 0), (0, 0)))
                return yp[:, t : t + st[0] * (d_out - 1) + 1 : st[0]]

            stack = (TAP_STACK_DEFAULT if self.tap_stack is None
                     else self.tap_stack)
            if F <= 64 and ks[0] * F <= 256 and stack:
                # Stack ALL kd taps as ONE conv on output channels (kd*F
                # lanes), shift-sum along D after. Theoretically ~kd x the
                # MXU occupancy, but MEASURED SLOWER end-to-end on the v5e
                # (stage G: corr_stem 0.110s stacked vs 0.074s per-tap;
                # flagship pair 1.033s vs 0.995s) — the strided minor-dim
                # tap slices relayout. Opt-in for future re-measurement.
                kstack = kd3.transpose(1, 2, 3, 0, 4).reshape(
                    ks[1], ks[2], C, ks[0] * F)
                y2 = jax.lax.conv_general_dilated(
                    x2, kstack, window_strides=st[1:], padding=pd[1:],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                y6 = y2.reshape((B, D) + y2.shape[1:3] + (ks[0], F))
                acc = None
                for t in range(ks[0]):
                    sl = tap_slice(y6[..., t, :], t)
                    acc = sl if acc is None else acc + sl
            else:
                acc = None
                for t in range(ks[0]):
                    y2 = conv2d_op(x2, kd3[t], st[1:], pd[1:])
                    sl = tap_slice(y2.reshape((B, D) + y2.shape[1:]), t)
                    acc = sl if acc is None else acc + sl
            if bias is not None:
                acc = acc + bias.astype(self.dtype)
            return acc

        if n == 3 and x.ndim == 5 and self.groups == 1 and dl == (1, 1, 1):
            fold_spatial = ks[0] == 1 and st[0] == 1 and pd[0] == (0, 0)
            fold_disp = (ks[1] == 1 and ks[2] == 1 and st[1] == st[2] == 1
                         and pd[1] == pd[2] == (0, 0))
            if fold_spatial or fold_disp:
                in_ch = x.shape[-1]
                kernel, bias = _ConvParams(ks + (in_ch, self.features),
                                           self.use_bias, name="Conv_0")()
                B, D, H, W, C = x.shape
                xd = x.astype(self.dtype)
                kd = kernel.astype(self.dtype)
                if fold_spatial:      # (1,kh,kw): D is a pure batch axis
                    y = conv2d_op(xd.reshape(B * D, H, W, C), kd[0],
                                  st[1:], pd[1:])
                    y = y.reshape((B, D) + y.shape[1:])
                else:                 # (kd,1,1): H*W is a pure spatial-1 axis
                    # Narrow-channel disparity convs starve the 128-lane MXU
                    # (N=28 -> ~9.5 TF/s measured). Folding `fold` spatial
                    # positions into channels with a block-diagonal kernel
                    # quadruples the FLOPs but runs near the wide-matmul
                    # rate (measured 1.8x faster at 28ch) — exact numerics
                    # (the extra products are structural zeros).
                    hw = H * W
                    fold = 1
                    if C <= 64:
                        for f in (4, 2):
                            if hw % f == 0 and C * f <= 256:
                                fold = f
                                break
                    k2 = kd[:, 0, 0]                     # (kd, C, F)
                    if fold > 1:
                        eye = jnp.eye(fold, dtype=k2.dtype)
                        kbd = jnp.einsum("kco,ij->kicjo", k2, eye).reshape(
                            ks[0], fold * C, fold * self.features)
                        y = jax.lax.conv_general_dilated(
                            xd.reshape(B, D, hw // fold, fold * C), kbd[:, None],
                            window_strides=(st[0], 1), padding=(pd[0], (0, 0)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        y = y.reshape((B, y.shape[1], H, W, self.features))
                    else:
                        y = jax.lax.conv_general_dilated(
                            xd.reshape(B, D, hw, C), k2[:, None],
                            window_strides=(st[0], 1), padding=(pd[0], (0, 0)),
                            dimension_numbers=("NHWC", "HWIO", "NHWC"))
                        y = y.reshape((B, y.shape[1], H, W, self.features))
                if bias is not None:
                    y = y + bias.astype(self.dtype)
                return y

        if (n == 2 and x.ndim == 4 and _pallas3x3_eligible(
                ks, st, pd, dl, self.groups, x.shape[-1], self.features)):
            # Pallas 3x3 fast path — identical params/paths to the nn.Conv
            # branch below (same "Conv_0" scope, kernel layout, inits).
            kernel, bias = _ConvParams(ks + (x.shape[-1], self.features),
                                       self.use_bias, name="Conv_0")()
            y = conv2d_op(x.astype(self.dtype), kernel.astype(self.dtype),
                          st, pd)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=pd,
            kernel_dilation=dl,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv_dn(n: int):
    if n == 2:
        return ("NHWC", "HWIO", "NHWC")
    if n == 3:
        return ("NDHWC", "DHWIO", "NDHWC")
    raise ValueError(f"unsupported ndim {n}")


def deconv_k4s2p1_phases(x, kernel, dtype, out_layout: str | None = None):
    """Phase-decomposed transposed conv for kernel=4 / stride=2 / padding=1.

    A stride-2 transposed conv computes each output-parity class ("phase")
    from a disjoint 2-tap slice of the kernel — the lhs-dilated formulation
    makes the MXU multiply by the interleaved zeros (8x wasted FLOPs for the
    hourglass 4^3 deconvs). Here all 2^n phases run as ONE dense 2^n-tap
    convolution with the phase kernels concatenated along output channels
    (exactly the nonzero work), and the caller interleaves.

    x: (B, *spatial, C); kernel: (4,)*n + (C, F) in the ConvTranspose layout.
    Returns y with spatial dims ``s+1`` and channels ``2^n * F``; phase
    p = (a, b[, c]) of torch's output[2i+a, 2j+b, ...] is
    ``y[:, a:a+H, b:b+W, ..., p_idx*F:(p_idx+1)*F]`` with p_idx the
    binary index a*2^(n-1)+....
    """
    import itertools

    n = x.ndim - 2
    kf = jnp.flip(kernel, axis=tuple(range(n)))
    # Derivation (per axis, k=4/s=2/p=1, kf = flipped kernel):
    #   out[2Y+0] = x[Y-1]*kf[0] + x[Y]*kf[2]   -> taps kf[0::2], window at Y-1
    #   out[2Y+1] = x[Y]*kf[1]   + x[Y+1]*kf[3] -> taps kf[1::2], window at Y
    # Padding the input once by (1,1) and slicing [a:a+H] after a VALID
    # 2-tap conv realizes every phase a from the same conv output.
    phases = list(itertools.product((0, 1), repeat=n))
    kph = jnp.concatenate(
        [kf[tuple(slice(a, None, 2) for a in ph)] for ph in phases],
        axis=-1)
    xp = jnp.pad(x, [(0, 0)] + [(1, 1)] * n + [(0, 0)])
    dn = _conv_dn(n)
    if out_layout is not None:
        assert n == 2 and out_layout == "NCHW"
        dn = (dn[0], dn[1], "NCHW")
    return jax.lax.conv_general_dilated(
        xp.astype(dtype), kph.astype(dtype), (1,) * n, "VALID",
        dimension_numbers=dn)


def interleave_deconv_phases(y, spatial, features: int):
    """Assemble :func:`deconv_k4s2p1_phases` output into (B, *2*spatial, F)."""
    import itertools

    from foundationstereo_tpu.parallel.sharding import shard_spatial

    n = len(spatial)
    phases = list(itertools.product((0, 1), repeat=n))
    parts = []
    for i, ph in enumerate(phases):
        idx = (slice(None),) + tuple(slice(a, a + s) for a, s in zip(ph, spatial))
        parts.append(y[idx + (slice(i * features, (i + 1) * features),)])
    stk = jnp.stack(parts, axis=-2)                      # (B, *s, 2^n, F)
    b = y.shape[0]
    stk = stk.reshape((b,) + tuple(spatial) + (2,) * n + (features,))
    # (B, s1..sn, a1..an, F) -> (B, s1, a1, s2, a2, ..., F)
    perm = [0]
    for i in range(n):
        perm += [1 + i, 1 + n + i]
    stk = stk.transpose(*perm, 1 + 2 * n)
    # Pin the phase-expanded intermediate's width sharding (s_w axis, with its
    # phase axis replicated). Without the pin, GSPMD derives conflicting
    # shardings for the (s_w, 2) split/merge pair around this transpose and
    # falls back to an involuntary full rematerialization (replication) of
    # the tensor — observed at feature/deconv32_16 in the r4 dryrun tail
    # (spmd_partitioner.cc:652, sharding flip [1,1,4,1,1,1]<->[1,1,2,1,2,1]).
    stk = shard_spatial(stk, w_axis=2 * n - 1)
    out = stk.reshape((b,) + tuple(2 * s for s in spatial) + (features,))
    return shard_spatial(out, w_axis=n)


class ConvTranspose(nn.Module):
    """Transposed convolution with exact torch ``ConvTransposeNd`` semantics.

    Output size is (in-1)*stride - 2*padding + kernel. The k=4/s=2/p=1
    upsamplers used throughout the reference take the phase-decomposed path
    (:func:`deconv_k4s2p1_phases`): one dense 2^n-tap conv at input
    resolution instead of an lhs-dilated conv whose MXU work is 2^n x zeros.
    Other geometries fall back to conv(dilate(x, stride), flip(W), pad=k-1-p).
    """

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = x.ndim - 2
        ks = _ntuple(self.kernel_size, n)
        st = _ntuple(self.strides, n)
        pd = _ntuple(self.padding, n)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            ks + (in_ch, self.features),
            jnp.float32,
        )
        if ks == st and pd == (0,) * n:
            # stride == kernel (DPT resize0 k4/s4, resize1 k2/s2): each input
            # pixel owns a disjoint k^n output block, out[s*Y+a, s*X+b] =
            # sum_c x[Y,X,c] * W[a,b,c,f] — a pure 1x1 projection to k^n*F
            # channels plus depth-to-space. The lhs-dilated fallback would
            # multiply by k^n-1 interleaved zeros on the MXU (16x at k=4).
            import math

            kn = math.prod(ks)
            kp = kernel.reshape((kn, in_ch, self.features)).astype(self.dtype)
            y = jnp.einsum("...c,pcf->...pf", x.astype(self.dtype), kp)
            b_dim = x.shape[0]
            spatial = x.shape[1:-1]
            y = y.reshape((b_dim,) + spatial + ks + (self.features,))
            # (B, s1..sn, a1..an, F) -> (B, s1, a1, ..., sn, an, F)
            perm = [0]
            for i in range(n):
                perm += [1 + i, 1 + n + i]
            y = y.transpose(*perm, 1 + 2 * n)
            y = y.reshape((b_dim,) + tuple(s * k for s, k in zip(spatial, ks))
                          + (self.features,))
        elif ks == (4,) * n and st == (2,) * n and pd == (1,) * n:
            y = deconv_k4s2p1_phases(x, kernel, self.dtype)
            y = interleave_deconv_phases(y, x.shape[1:-1], self.features)
        else:
            k = jnp.flip(kernel, axis=tuple(range(n))).astype(self.dtype)
            pad = [(kk - 1 - pp, kk - 1 - pp) for kk, pp in zip(ks, pd)]
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                k,
                window_strides=(1,) * n,
                padding=pad,
                lhs_dilation=st,
                dimension_numbers=_conv_dn(n),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class InstanceNorm(nn.Module):
    """torch InstanceNormNd default: affine=False, eps=1e-5, per-sample stats
    over all spatial axes."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=axes, keepdims=True)
        var = jnp.var(xf, axis=axes, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class BatchNorm(nn.Module):
    """torch BatchNormNd parity: eps=1e-5, momentum=0.1, affine, running stats."""

    momentum: float = 0.1
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=None,
            param_dtype=jnp.float32,
        )(x)


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel axis of NHWC tensors (eps 1e-6)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=None, param_dtype=jnp.float32)(x)


class GroupNorm(nn.Module):
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                            dtype=None, param_dtype=jnp.float32)(x)


def make_norm(kind: str, channels: int, name: str | None = None):
    """Factory matching the reference's norm_fn strings."""
    if kind == "batch":
        return BatchNorm(name=name)
    if kind == "instance":
        return InstanceNorm(name=name)
    if kind == "group":
        return GroupNorm(num_groups=channels // 8, name=name)
    if kind == "layer":
        return LayerNorm2d(name=name)
    if kind == "none":
        return None
    raise ValueError(kind)


def apply_norm(norm, x, train: bool):
    if norm is None:
        return x
    if isinstance(norm, BatchNorm):
        return norm(x, train=train)
    return norm(x)


# ---------------------------------------------------------------------------
# Composite blocks (reference core/submodule.py)
# ---------------------------------------------------------------------------


class BasicConv(nn.Module):
    """conv/deconv + optional norm + LeakyReLU (core/submodule.py:51-86).

    Works for 2D and 3D (is_3d is inferred from input rank).
    """

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    dilation: Sequence[int] | int = 1
    deconv: bool = False
    bn: bool = True
    norm: str = "batch"
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deconv:
            x = ConvTranspose(self.features, self.kernel_size, self.strides,
                              self.padding, use_bias=False, dtype=self.dtype)(x)
        else:
            x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                     self.dilation, use_bias=False, dtype=self.dtype)(x)
        if self.bn:
            norm = make_norm(self.norm, self.features)
            x = apply_norm(norm, x, train)
        if self.relu:
            x = leaky_relu(x)
        return x


class BasicConvIN(nn.Module):
    """conv/deconv + InstanceNorm + LeakyReLU (core/submodule.py:320-346)."""

    features: int
    kernel_size: Sequence[int] | int
    strides: Sequence[int] | int = 1
    padding: Sequence[int] | int = 0
    deconv: bool = False
    use_in: bool = True
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.deconv:
            x = ConvTranspose(self.features, self.kernel_size, self.strides,
                              self.padding, use_bias=False, dtype=self.dtype)(x)
        else:
            x = Conv(self.features, self.kernel_size, self.strides, self.padding,
                     use_bias=False, dtype=self.dtype)(x)
        if self.use_in:
            x = InstanceNorm()(x)
        if self.relu:
            x = leaky_relu(x)
        return x


class ResnetBasicBlock(nn.Module):
    """2-conv residual block, bias=False, configurable norm
    (core/submodule.py:119-156). Also covers the 3D variant (:159-195)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    norm: str = "batch"

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = Conv(self.features, self.kernel_size, 1, self.padding,
                 use_bias=False, dtype=self.dtype)(x)
        y = apply_norm(make_norm(self.norm, self.features), y, train)
        y = nn.relu(y)
        y = Conv(self.features, self.kernel_size, 1, self.padding,
                 use_bias=False, dtype=self.dtype)(y)
        y = apply_norm(make_norm(self.norm, self.features), y, train)
        assert x.shape[-1] == self.features, "in/out channels must match (no downsample path used upstream)"
        return nn.relu(x + y)


class ResidualBlock(nn.Module):
    """Extractor residual block with biased convs and optional strided
    downsample path (core/extractor.py:20-80)."""

    features: int
    norm: str = "group"
    strides: int = 1

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = Conv(self.features, 3, self.strides, 1, dtype=self.dtype)(x)
        y = apply_norm(make_norm(self.norm, self.features), y, train)
        y = nn.relu(y)
        y = Conv(self.features, 3, 1, 1, dtype=self.dtype)(y)
        y = apply_norm(make_norm(self.norm, self.features), y, train)
        y = nn.relu(y)
        if not (self.strides == 1 and in_ch == self.features):
            x = Conv(self.features, 1, self.strides, 0, dtype=self.dtype)(x)
            x = apply_norm(make_norm(self.norm, self.features), x, train)
        return nn.relu(x + y)


class Conv3dNormActReduced(nn.Module):
    """APC: axial-planar factorized 3D conv — (1,k,k) spatial then (kd,1,1)
    disparity conv, each + BN + ReLU (core/submodule.py:89-114)."""

    features: int
    hidden: int | None = None
    kernel_size: int = 3
    kernel_disp: int = 17
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.hidden or self.features
        k = self.kernel_size
        x = Conv(hidden, (1, k, k), 1, (0, k // 2, k // 2), dtype=self.dtype)(x)
        x = BatchNorm()(x, train=train)
        x = nn.relu(x)
        kd = self.kernel_disp
        x = Conv(self.features, (kd, 1, 1), 1, (kd // 2, 0, 0), dtype=self.dtype)(x)
        x = BatchNorm()(x, train=train)
        x = nn.relu(x)
        return x


class Conv2x(nn.Module):
    """Upsample-and-fuse block (core/submodule.py:281-317): deconv/conv 2x,
    concat skip, fuse conv."""

    features: int
    deconv: bool = False
    concat: bool = True
    keep_concat: bool = True
    bn: bool = True
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        is_3d = x.ndim == 5
        if self.deconv:
            kernel = (4, 4, 4) if is_3d else 4
            x = BasicConv(self.features, kernel, 2, 1, deconv=True, bn=self.bn,
                          relu=True, dtype=self.dtype)(x, train)
        else:
            x = BasicConv(self.features, 3, 2, 1, bn=self.bn, relu=True,
                          dtype=self.dtype)(x, train)
        if x.shape != rem.shape:
            from foundationstereo_tpu.ops.resize import resize2d
            x = resize2d(x, (rem.shape[-3], rem.shape[-2]), "bilinear", False)
        if self.concat:
            x = jnp.concatenate([x, rem], axis=-1)
            mul = 2 if self.keep_concat else 1
            x = BasicConv(self.features * mul, 3, 1, 1, bn=self.bn,
                          relu=self.relu, dtype=self.dtype)(x, train)
        else:
            x = x + rem
            x = BasicConv(self.features, 3, 1, 1, bn=self.bn, relu=self.relu,
                          dtype=self.dtype)(x, train)
        return x


class Conv2xIN(nn.Module):
    """Instance-norm variant used by the STA feature pyramid
    (core/submodule.py:349-385): deconv 2x + concat + instance-norm resblock."""

    features: int
    deconv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rem, train: bool = False):
        kernel = 4 if self.deconv else 3
        x = BasicConvIN(self.features, kernel, 2, 1, deconv=self.deconv,
                        dtype=self.dtype)(x, train)
        if x.shape != rem.shape:
            from foundationstereo_tpu.ops.resize import resize2d
            x = resize2d(x, (rem.shape[-3], rem.shape[-2]), "bilinear", False)
        x = jnp.concatenate([x, rem], axis=-1)
        x = ResnetBasicBlock(self.features * 2, norm="instance", dtype=self.dtype)(x, train)
        return x


class FeatureAtt(nn.Module):
    """Sigmoid gating of a cost volume by 2D image features
    (core/submodule.py:438-454). cv: (B,D,H,W,C); feat: (B,H,W,Cf)."""

    cv_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cv, feat, train: bool = False):
        feat_ch = feat.shape[-1]
        a = BasicConv(feat_ch // 2, 1, 1, 0, dtype=self.dtype)(feat, train)
        a = Conv(self.cv_channels, 1, dtype=self.dtype)(a)
        return jax.nn.sigmoid(a.astype(cv.dtype))[:, None] * cv


class ChannelAttentionEnhancement(nn.Module):
    """SE-style channel attention (core/submodule.py:532-547)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = Conv(c // 16, 1, use_bias=False, dtype=self.dtype)
        fc2 = Conv(c, 1, use_bias=False, dtype=self.dtype)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)


class SpatialAttentionExtractor(nn.Module):
    """7x7 conv over [mean, max] channel maps -> sigmoid spatial attention
    (core/submodule.py:549-561)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = Conv(1, self.kernel_size, 1, self.kernel_size // 2, use_bias=False,
                 dtype=self.dtype)(s)
        return jax.nn.sigmoid(s)


class EdgeNextConvEncoder(nn.Module):
    """ConvNeXt-style block: depthwise k7 + (LN) + pointwise MLP + layer scale
    (core/submodule.py:565-591)."""

    dim: int
    expan_ratio: int = 4
    kernel_size: int = 7
    use_norm: bool = True
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = Conv(self.dim, self.kernel_size, 1, self.kernel_size // 2,
                 groups=self.dim, dtype=self.dtype)(x)
        if self.use_norm:
            x = LayerNorm2d()(x)
        x = nn.Dense(self.expan_ratio * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(x)
        x = gelu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param("gamma",
                               nn.initializers.constant(self.layer_scale_init_value),
                               (self.dim,), jnp.float32)
            x = gamma.astype(x.dtype) * x
        return inp + x


# ---------------------------------------------------------------------------
# Disparity transformer (DT) pieces
# ---------------------------------------------------------------------------


def sinusoidal_position_embedding(max_len: int, d_model: int) -> jnp.ndarray:
    """(1, max_len, d_model) sinusoidal table (core/submodule.py:472-502)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * -(np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return jnp.asarray(pe[None], dtype=jnp.float32)


class MultiheadAttention(nn.Module):
    """Full softmax attention with separate q/k/v/out projections — the
    reference's FlashMultiheadAttention contract (core/submodule.py:198-229).
    Sequences here are short (max_disp/16 tokens), so a fused einsum softmax
    is already at speed of light on TPU; no flash tiling needed."""

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        B, L, C = q.shape
        hd = self.embed_dim // self.num_heads
        dense = lambda name: nn.Dense(self.embed_dim, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        qp = dense("q_proj")(q).reshape(B, L, self.num_heads, hd)
        kp = dense("k_proj")(k).reshape(B, -1, self.num_heads, hd)
        vp = dense("v_proj")(v).reshape(B, -1, self.num_heads, hd)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("blhd,bmhd->bhlm", qp, kp) * scale
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vp.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", w, vp).reshape(B, L, C)
        return dense("out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with GELU FFN
    (core/submodule.py:233-257)."""

    embed_dim: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        attn = MultiheadAttention(self.embed_dim, self.num_heads, dtype=self.dtype)(x, x, x)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        x = nn.LayerNorm(param_dtype=jnp.float32)(x + attn)
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32)(x)
        h = gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        x = nn.LayerNorm(param_dtype=jnp.float32)(x + h)
        return x


class CostVolumeDisparityAttention(nn.Module):
    """Self-attention along the disparity axis of a cost volume
    (core/submodule.py:506-528). cv: (B, D, H, W, C) -> same shape.

    Each (h, w) location becomes an independent D-token sequence — on TPU
    this is embarrassingly parallel over B*H*W and needs no ring attention.
    """

    d_model: int
    nhead: int = 4
    dim_feedforward: int | None = None
    num_transformer: int = 4
    max_len: int = 512
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cv, train: bool = False):
        B, D, H, W, C = cv.shape
        x = cv.transpose(0, 2, 3, 1, 4).reshape(B * H * W, D, C)
        pe = sinusoidal_position_embedding(self.max_len, self.d_model)
        x = x + pe[:, :D].astype(x.dtype)
        ff = self.dim_feedforward or self.d_model
        for _ in range(self.num_transformer):
            x = TransformerEncoderLayer(self.d_model, self.nhead, ff,
                                        self.dropout, dtype=self.dtype)(x, train)
        return x.reshape(B, H, W, D, C).transpose(0, 3, 1, 2, 4)
