"""Native C++ data-path kernels vs the Python reference implementations."""

import numpy as np
import pytest

from foundationstereo_tpu import native
from foundationstereo_tpu.train.dataloader import _resize, warp_affine_reflect
from foundationstereo_tpu.utils.misc import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    depth_uint8_decoding,
    depth_uint8_encoding,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_decode_encode_roundtrip(rng):
    d = rng.uniform(0, 400, (37, 53)).astype(np.float32)
    enc = native.encode_disparity(d)
    np.testing.assert_array_equal(enc, depth_uint8_encoding(d))
    dec = native.decode_disparity(enc)
    np.testing.assert_allclose(dec, depth_uint8_decoding(enc), rtol=1e-6)
    np.testing.assert_allclose(dec, d, atol=0.5e-3)


def test_resize_nearest_matches_python(rng):
    img = rng.uniform(0, 255, (31, 47)).astype(np.float32)
    got = native.resize_nearest(img, (23, 17))
    ref = _resize(img, (23, 17), nearest=True)
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_resize_bilinear_reasonable(rng):
    # PIL and cv2-style bilinear differ slightly on downscale; check identity
    # and an upscale against PIL within tolerance.
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    same = native.resize_bilinear(img, (16, 16))
    np.testing.assert_allclose(same, img, atol=1e-4)
    up = native.resize_bilinear(img, (32, 32))
    assert up.shape == (32, 32, 3)
    assert abs(up.mean() - img.mean()) < 2.0


def test_warp_affine_matches_python(rng):
    img = rng.uniform(0, 255, (24, 32, 3)).astype(np.float64)
    got = native.warp_affine_reflect(img, 1.5, -0.7, 0.3)
    ref = warp_affine_reflect(img, 1.5, -0.7, 0.3)
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_normalize_imagenet(rng):
    img = rng.integers(0, 255, (8, 9, 3), dtype=np.uint8)
    got = native.normalize_imagenet(img)
    ref = (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
