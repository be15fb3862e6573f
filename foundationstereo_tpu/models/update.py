"""Iterative refinement: selective ConvGRUs + motion encoder + disp head.

Channel-last re-design of core/update.py: coarse-to-fine selective GRUs at
1/16 -> 1/8 -> 1/4 where small-kernel and large-kernel GRU outputs are blended
by a spatial attention map, a motion encoder over (lookup features, disparity),
an EdgeNext-style disparity head, and the upsample-mask head.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from foundationstereo_tpu.models.layers import Conv, EdgeNextConvEncoder
from foundationstereo_tpu.ops.resize import resize2d
from foundationstereo_tpu.ops.upsample import avg_pool2d

Dtype = Any


def pool2x(x):
    return avg_pool2d(x, 3, 2, 1)


def interp(x, dest):
    return resize2d(x, (dest.shape[-3], dest.shape[-2]), "bilinear", align_corners=True)


class DispHead(nn.Module):
    """conv + 2x EdgeNext k7 encoders + conv -> delta disparity
    (core/update.py:20-32)."""

    input_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.input_dim, 3, 1, 1, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = EdgeNextConvEncoder(self.input_dim, expan_ratio=4, kernel_size=7,
                                use_norm=False, dtype=self.dtype)(x)
        x = EdgeNextConvEncoder(self.input_dim, expan_ratio=4, kernel_size=7,
                                use_norm=False, dtype=self.dtype)(x)
        return Conv(1, 3, 1, 1, dtype=self.dtype)(x)


class _GateParams(nn.Module):
    """Conv parameters under the standard `<name>/Conv_0/{kernel,bias}` path
    (checkpoint-converter layout) without running a convolution — the caller
    fuses the kernels of multiple gates into one conv."""

    shape: tuple

    @nn.compact
    def __call__(self):
        from foundationstereo_tpu.models.layers import _ConvParams

        return _ConvParams(self.shape, True, name="Conv_0")()


class RaftConvGRU(nn.Module):
    """Standard conv GRU (core/update.py:83-95).

    The z and r gates read the same input, so their kernels are concatenated
    along output channels at trace time and run as ONE convolution —
    numerically identical (convolution is linear in the kernel), half the
    gate-conv launches, and a 256-wide output uses the 128-lane MXU twice as
    well as two 128-wide convs. Parameters keep the separate convz/convr
    paths the checkpoint converter maps."""

    hidden_dim: int = 128
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x, hx):
        k, p = self.kernel_size, self.kernel_size // 2
        d = self.hidden_dim
        in_ch = hx.shape[-1]
        kz, bz = _GateParams((k, k, in_ch, d), name="convz")()
        kr, br = _GateParams((k, k, in_ch, d), name="convr")()
        kzr = jnp.concatenate([kz, kr], axis=-1).astype(self.dtype)
        bzr = jnp.concatenate([bz, br]).astype(self.dtype)
        from foundationstereo_tpu.models.layers import conv2d_op

        zr = conv2d_op(hx.astype(self.dtype), kzr, (1, 1),
                       [(p, p), (p, p)]) + bzr
        z = nn.sigmoid(zr[..., :d])
        r = nn.sigmoid(zr[..., d:])
        q = jnp.tanh(Conv(d, k, 1, p, dtype=self.dtype, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SelectiveConvGRU(nn.Module):
    """Attention-blended small/large-kernel GRU (core/update.py:98-119)."""

    hidden_dim: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, att, h, *xs):
        x = jnp.concatenate(xs, axis=-1)
        x = nn.relu(Conv(x.shape[-1], 3, 1, 1, dtype=self.dtype, name="conv0")(x))
        hx = jnp.concatenate([x, h], axis=-1)
        hx = nn.relu(Conv(hx.shape[-1], 3, 1, 1, dtype=self.dtype, name="conv1")(hx))
        small = RaftConvGRU(self.hidden_dim, 1, dtype=self.dtype, name="small_gru")(h, x, hx)
        large = RaftConvGRU(self.hidden_dim, 3, dtype=self.dtype, name="large_gru")(h, x, hx)
        return small * att + large * (1 - att)


class BasicMotionEncoder(nn.Module):
    """(disp, lookup features) -> 128-ch motion features (core/update.py:51-70).

    ``corr`` is either the dense (B, H, W, F) lookup feature (XLA/training
    path) or a list of kernel-layout parts [(B*H, f_i, W), ...] from the
    Pallas lookup (``return_parts=True``): convc1 is a 1x1 conv, so it is
    evaluated as a sum of per-part einsums against slices of its kernel —
    the (B*H, F, W) -> (B, H, W, F) transpose and the level concat become
    part of the MXU contraction instead of a separate fp32 HBM pass (the
    dominant per-iteration epilogue cost of the refinement loop).
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, disp, corr):
        dt = self.dtype
        if isinstance(corr, (list, tuple)):
            b, h, w = disp.shape[:3]
            f_total = sum(int(p.shape[1]) for p in corr)
            k1, b1 = _GateParams((1, 1, f_total, 256), name="convc1")()
            k2d = k1[0, 0].astype(dt)                     # (F, 256)
            acc, off = None, 0
            for p in corr:
                f = int(p.shape[1])
                term = jnp.einsum(
                    "rfw,fo->rwo", p.astype(dt), k2d[off:off + f],
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
                off += f
            cor = nn.relu(acc + b1).astype(dt).reshape(b, h, w, 256)
        else:
            cor = nn.relu(Conv(256, 1, 1, 0, dtype=dt, name="convc1")(corr))
        cor = nn.relu(Conv(256, 3, 1, 1, dtype=dt, name="convc2")(cor))
        d = nn.relu(Conv(64, 7, 1, 3, dtype=dt, name="convd1")(disp))
        d = nn.relu(Conv(64, 3, 1, 1, dtype=dt, name="convd2")(d))
        out = jnp.concatenate([cor, d], axis=-1)
        out = nn.relu(Conv(127, 3, 1, 1, dtype=dt, name="conv")(out))
        return jnp.concatenate([out, disp], axis=-1)


class BasicSelectiveMultiUpdateBlock(nn.Module):
    """Coarse-to-fine GRU update (core/update.py:122-159).

    net/inp/att are lists ordered fine->coarse: [1/4, 1/8, 1/16].
    Returns (new_net, mask_feat_4, delta_disp).
    """

    hidden_dim: int = 128
    n_gru_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, disp, att):
        net = list(net)
        dt = self.dtype
        if self.n_gru_layers == 3:
            net[2] = SelectiveConvGRU(self.hidden_dim, dtype=dt, name="gru16")(
                att[2], net[2], inp[2], pool2x(net[1]))
        if self.n_gru_layers >= 2:
            if self.n_gru_layers > 2:
                net[1] = SelectiveConvGRU(self.hidden_dim, dtype=dt, name="gru08")(
                    att[1], net[1], inp[1], pool2x(net[0]), interp(net[2], net[1]))
            else:
                net[1] = SelectiveConvGRU(self.hidden_dim, dtype=dt, name="gru08")(
                    att[1], net[1], inp[1], pool2x(net[0]))

        motion = BasicMotionEncoder(dtype=dt, name="encoder")(disp, corr)
        motion = jnp.concatenate([inp[0], motion], axis=-1)
        if self.n_gru_layers > 1:
            net[0] = SelectiveConvGRU(self.hidden_dim, dtype=dt, name="gru04")(
                att[0], net[0], motion, interp(net[1], net[0]))

        delta_disp = DispHead(self.hidden_dim, dtype=dt, name="disp_head")(net[0])

        m = nn.relu(Conv(64, 3, 1, 1, dtype=dt, name="mask0")(net[0]))
        m = nn.relu(Conv(32, 3, 1, 1, dtype=dt, name="mask1")(m))
        mask_feat = 0.25 * m  # gradient-balance scaling (core/update.py:157-158)
        return net, mask_feat, delta_disp
