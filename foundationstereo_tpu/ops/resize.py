"""Torch-semantics image resizing for JAX, built on interpolation matrices.

The reference relies on ``F.interpolate`` with a mix of ``align_corners``
settings (bilinear/bicubic/nearest/trilinear; e.g. core/extractor.py:352,357,
core/foundation_stereo.py:119,259-271, core/submodule.py:464). ``jax.image.resize``
uses half-pixel sampling with antialiasing on downscale, which does NOT match
torch's ``antialias=False`` default — so we build explicit (out, in)
interpolation matrices per axis (exact torch semantics, differentiable, and
MXU-friendly: resizing becomes two small matmuls that XLA fuses).

Matrices are computed in numpy at trace time (shapes are static under jit) and
become constants in the compiled program.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _interp_matrix_np(in_size: int, out_size: int, method: str, align_corners: bool,
                      scale_factor: float | None = None) -> np.ndarray:
    """Dense (out_size, in_size) row-stochastic interpolation matrix.

    ``scale_factor``: when given (and align_corners=False), use torch's
    scale-factor coordinate mapping src=(dst+0.5)/scale-0.5 instead of the
    size ratio — needed for DINOv2's pos-embed interpolation, which passes an
    explicit fractional scale (vision_transformer.py:195-209).
    """
    if method == "nearest":
        scale = in_size / out_size
        idx = np.minimum((np.arange(out_size) * scale).astype(np.int64), in_size - 1)
        m = np.zeros((out_size, in_size), np.float64)
        m[np.arange(out_size), idx] = 1.0
        return m.astype(np.float32)

    if align_corners:
        if out_size == 1:
            src = np.zeros(out_size, np.float64)
        else:
            src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = (1.0 / scale_factor) if scale_factor else (in_size / out_size)
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5

    m = np.zeros((out_size, in_size), np.float64)
    if method == "linear":
        x0 = np.floor(src).astype(np.int64)
        w1 = src - x0
        for tap, w in ((x0, 1.0 - w1), (x0 + 1, w1)):
            np.add.at(m, (np.arange(out_size), np.clip(tap, 0, in_size - 1)), w)
    elif method == "cubic":
        # Keys cubic convolution kernel with A=-0.75 (torch's choice).
        a = -0.75

        def k(t):
            t = np.abs(t)
            return np.where(
                t <= 1.0,
                ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
                np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0),
            )

        x0 = np.floor(src).astype(np.int64)
        for off in (-1, 0, 1, 2):
            tap = x0 + off
            w = k(src - tap)
            np.add.at(m, (np.arange(out_size), np.clip(tap, 0, in_size - 1)), w)
    else:
        raise ValueError(f"unknown method {method}")
    return m.astype(np.float32)


def resize1d_matrix(in_size: int, out_size: int, method: str = "linear",
                    align_corners: bool = False, scale_factor: float | None = None) -> jnp.ndarray:
    """Public access to the (out, in) interpolation matrix as a jnp constant."""
    return jnp.asarray(_interp_matrix_np(in_size, out_size, method, align_corners, scale_factor))


_METHOD_ALIASES = {
    "bilinear": "linear",
    "trilinear": "linear",
    "bicubic": "cubic",
    "linear": "linear",
    "cubic": "cubic",
    "nearest": "nearest",
}

# 2-byte float dtypes keep their width through the interpolation einsums
# (matrix cast down, fp32 MXU accumulation): under the bf16 mixed-precision
# policy a resize is then a native-rate MXU op with no fp32 materialization
# of the (often large) intermediate. fp32 inputs compute in fp32 exactly as
# before — the golden/parity tests all run there.
_HALF_FLOATS = (jnp.bfloat16, jnp.float16)


def _apply_axis(x, m, subscripts):
    cdt = x.dtype if x.dtype in _HALF_FLOATS else jnp.float32
    y = jnp.einsum(subscripts, m.astype(cdt), x.astype(cdt),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def resize2d(x: jnp.ndarray, out_hw: tuple[int, int], method: str = "bilinear",
             align_corners: bool = False) -> jnp.ndarray:
    """Resize the (H, W) axes of a channel-last array ``(..., H, W, C)``.

    Exactly matches ``torch.nn.functional.interpolate(x, size=out_hw,
    mode=method, align_corners=align_corners, antialias=False)`` (NCHW there,
    NHWC here) for fp32 inputs; 2-byte float inputs interpolate at their own
    width (fp32 accumulation) per the module policy above.
    """
    method = _METHOD_ALIASES[method]
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if h_in != h_out:
        mh = resize1d_matrix(h_in, h_out, method, align_corners)
        x = _apply_axis(x, mh, "oh,...hwc->...owc")
    if w_in != w_out:
        mw = resize1d_matrix(w_in, w_out, method, align_corners)
        x = _apply_axis(x, mw, "ow,...hwc->...hoc")
    return x


def resize2d_via(x: jnp.ndarray, mid_hw: tuple[int, int], out_hw: tuple[int, int],
                 method: str = "bilinear", align_corners: bool = False) -> jnp.ndarray:
    """``resize2d(resize2d(x, mid_hw), out_hw)`` as ONE composed linear map.

    Interpolation with fixed sizes is a linear map, so the up-then-down pair
    collapses to a single (out, in) matrix per axis — the composed matrices
    are multiplied in float64 at trace time, avoiding the materialization of
    the intermediate. Used for the DPT 'out' tap, where the reference
    upsamples to the full ViT input resolution (core/extractor.py:357 via
    depth_anything/dpt.py:134-135) only for FoundationStereo to immediately
    downsample to H/4 x W/4: at flagship scale the intermediate is a
    (2, 784, 1344, 128) tensor that never needs to exist.
    """
    method = _METHOD_ALIASES[method]
    h_in, w_in = x.shape[-3], x.shape[-2]
    (h_mid, w_mid), (h_out, w_out) = mid_hw, out_hw

    def composed(in_size, mid_size, out_size):
        m1 = _interp_matrix_np(in_size, mid_size, method, align_corners)
        m2 = _interp_matrix_np(mid_size, out_size, method, align_corners)
        return jnp.asarray(
            (m2.astype(np.float64) @ m1.astype(np.float64)).astype(np.float32))

    if (h_in, h_mid, h_out) != (h_in, h_in, h_in):
        x = _apply_axis(x, composed(h_in, h_mid, h_out), "oh,...hwc->...owc")
    if (w_in, w_mid, w_out) != (w_in, w_in, w_in):
        x = _apply_axis(x, composed(w_in, w_mid, w_out), "ow,...hwc->...hoc")
    return x


def resize_dhw(x: jnp.ndarray, out_dhw: tuple[int, int, int], method: str = "trilinear",
               align_corners: bool = False) -> jnp.ndarray:
    """Resize the (D, H, W) axes of ``(..., D, H, W, C)`` (torch trilinear)."""
    method = _METHOD_ALIASES[method]
    d_in, h_in, w_in = x.shape[-4], x.shape[-3], x.shape[-2]
    d_out, h_out, w_out = out_dhw
    if d_in != d_out:
        md = resize1d_matrix(d_in, d_out, method, align_corners)
        x = _apply_axis(x, md, "od,...dhwc->...ohwc")
    if h_in != h_out:
        mh = resize1d_matrix(h_in, h_out, method, align_corners)
        x = _apply_axis(x, mh, "oh,...dhwc->...dowc")
    if w_in != w_out:
        mw = resize1d_matrix(w_in, w_out, method, align_corners)
        x = _apply_axis(x, mw, "ow,...dhwc->...dhoc")
    return x
