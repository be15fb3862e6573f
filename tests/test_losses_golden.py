"""Golden tests: JAX losses vs the reference's pure-torch train/losses.py.

The reference loss module imports only torch/numpy, so we load it directly
from /root/reference for numerical comparison (never shipped/compiled into
this package).
"""

import importlib.util
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from foundationstereo_tpu.train import losses as L


@pytest.fixture(scope="module")
def ref_losses():
    spec = importlib.util.spec_from_file_location(
        "ref_losses", "/root/reference/train/losses.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def data(rng):
    h, w = 24, 32
    pred = rng.uniform(0, 60, (h, w)).astype(np.float32)
    gt = rng.uniform(0, 60, (h, w)).astype(np.float32)
    mask = rng.uniform(size=(h, w)) > 0.3
    return pred, gt, mask


def test_l1_loss_matches(ref_losses, data):
    pred, gt, mask = data
    ref, ref_misc = ref_losses.disparity_l1_loss(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask),
        max_disparity=192.0)
    got, misc = L.disparity_l1_loss(
        jnp.asarray(pred[None]), jnp.asarray(gt[None]), jnp.asarray(mask[None]),
        max_disparity=192.0)
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-5)
    np.testing.assert_allclose(float(misc["epe"][0]), ref_misc["epe"], rtol=1e-5)
    np.testing.assert_allclose(float(misc["d1_error"][0]), ref_misc["d1_error"], rtol=1e-5)


def test_smooth_l1_loss_matches(ref_losses, data):
    pred, gt, mask = data
    ref, _ = ref_losses.disparity_smooth_l1_loss(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask),
        beta=1.0, max_disparity=192.0)
    got, _ = L.disparity_smooth_l1_loss(
        jnp.asarray(pred[None]), jnp.asarray(gt[None]), jnp.asarray(mask[None]),
        beta=1.0, max_disparity=192.0)
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-5)


def test_foundation_stereo_loss_matches(ref_losses, rng):
    h, w = 24, 32
    gt = rng.uniform(0, 60, (h, w)).astype(np.float32)
    mask = rng.uniform(size=(h, w)) > 0.3
    init = rng.uniform(0, 60, (h, w)).astype(np.float32)
    pyramid = [rng.uniform(0, 60, (h, w)).astype(np.float32) for _ in range(3)]

    ref, ref_misc = ref_losses.foundation_stereo_loss(
        torch.from_numpy(init), [torch.from_numpy(p) for p in pyramid],
        torch.from_numpy(gt), torch.from_numpy(mask), gamma=0.9, max_disparity=192.0)
    got, misc = L.foundation_stereo_loss(
        jnp.asarray(init[None]), [jnp.asarray(p[None]) for p in pyramid],
        jnp.asarray(gt[None]), jnp.asarray(mask[None]), gamma=0.9, max_disparity=192.0)
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-5)
    np.testing.assert_allclose(float(misc["initial_epe"][0]), ref_misc["epe_initial"], rtol=1e-5)


def test_foundation_stereo_loss_resolution_mismatch(ref_losses, rng):
    h, w = 24, 32
    gt = rng.uniform(0, 60, (h, w)).astype(np.float32)
    mask = rng.uniform(size=(h, w)) > 0.3
    init = rng.uniform(0, 15, (h // 4, w // 4)).astype(np.float32)
    pyramid = [rng.uniform(0, 60, (h, w)).astype(np.float32)]

    ref, _ = ref_losses.foundation_stereo_loss(
        torch.from_numpy(init), [torch.from_numpy(p) for p in pyramid],
        torch.from_numpy(gt), torch.from_numpy(mask))
    got, _ = L.foundation_stereo_loss(
        jnp.asarray(init[None]), [jnp.asarray(p[None]) for p in pyramid],
        jnp.asarray(gt[None]), jnp.asarray(mask[None]))
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-5)


def test_gradient_loss_matches(ref_losses, data):
    pred, gt, mask = data
    ref, _ = ref_losses.gradient_loss(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask))
    got, _ = L.gradient_loss(
        jnp.asarray(pred[None]), jnp.asarray(gt[None]), jnp.asarray(mask[None]))
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-5)


def test_multi_scale_loss_matches(ref_losses, rng):
    h, w = 24, 32
    gt = rng.uniform(0, 60, (h, w)).astype(np.float32)
    mask = rng.uniform(size=(h, w)) > 0.3
    pyramid = [rng.uniform(0, 60, (h // s, w // s)).astype(np.float32) for s in (1, 2, 4)]
    ref, _ = ref_losses.multi_scale_loss(
        [torch.from_numpy(p) for p in pyramid], torch.from_numpy(gt),
        torch.from_numpy(mask), weights=[1.0, 0.5, 0.25], loss_type="smooth_l1")
    got, _ = L.multi_scale_loss(
        [jnp.asarray(p[None]) for p in pyramid], jnp.asarray(gt[None]),
        jnp.asarray(mask[None]), weights=[1.0, 0.5, 0.25], loss_type="smooth_l1")
    np.testing.assert_allclose(float(got[0]), ref.item(), rtol=1e-4)


def test_empty_mask_is_zero(rng):
    pred = jnp.asarray(rng.uniform(0, 60, (1, 8, 8)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 60, (1, 8, 8)).astype(np.float32))
    mask = jnp.zeros((1, 8, 8), bool)
    loss, _ = L.disparity_l1_loss(pred, gt, mask)
    assert float(loss[0]) == 0.0
