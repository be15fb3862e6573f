"""End-to-end model forward smoke tests on a tiny vits config (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.models.foundation_stereo import FoundationStereo


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = ModelConfig(max_disp=64, vit_size="vits", mixed_precision=False)
    model = FoundationStereo(cfg)
    B, H, W = 1, 64, 96
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    right = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), left, right, iters=1, test_mode=True)
    return cfg, model, variables, left, right


def test_forward_test_mode(tiny_setup):
    cfg, model, variables, left, right = tiny_setup
    disp = model.apply(variables, left, right, iters=2, test_mode=True)
    assert disp.shape == (1, 64, 96)
    assert np.isfinite(np.asarray(disp)).all()


def test_forward_train_mode(tiny_setup):
    cfg, model, variables, left, right = tiny_setup
    init_disp, preds = model.apply(variables, left, right, iters=2, test_mode=False)
    assert init_disp.shape == (1, 16, 24)
    assert len(preds) == 2
    assert preds[0].shape == (1, 64, 96)
    assert np.isfinite(np.asarray(init_disp)).all()
    assert all(np.isfinite(np.asarray(p)).all() for p in preds)


def test_forward_with_init_disp(tiny_setup):
    cfg, model, variables, left, right = tiny_setup
    init = jnp.full((1, 16, 24), 3.0, jnp.float32)
    disp = model.apply(variables, left, right, iters=1, test_mode=True, init_disp=init)
    assert disp.shape == (1, 64, 96)
    assert np.isfinite(np.asarray(disp)).all()


def test_param_structure(tiny_setup):
    cfg, model, variables, *_ = tiny_setup
    params = variables["params"]
    # The frozen monocular backbone must exist under feature/dino.
    assert "dino" in params["feature"]
    assert "batch_stats" in variables
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    assert n_params > 1e6


def test_scan_upsample_matches_folded(tiny_setup):
    """cfg.scan_upsample (per-iteration remat scan of the spx head — the
    round-5 train-memory fix) must be numerically identical to the folded
    (iters*B) formulation, with an identical parameter tree."""
    cfg, model, variables, left, right = tiny_setup
    folded = FoundationStereo(cfg.replace(scan_upsample=False))
    # Same param tree: both paths create spx_2_gru/spx_gru at the same paths.
    v2 = folded.init(jax.random.PRNGKey(0), left, right, iters=1, test_mode=True)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(variables)
    # iters=4 with chunk 2 exercises the MULTI-step chunked scan
    # (n_steps=2) — the production shape (iters=22, c=2) is n_steps=11.
    i2, p2 = folded.apply(variables, left, right, iters=4, test_mode=False)
    for chunk in (1, 2):  # per-iteration scan AND chunk-folded scan steps
        scanned = FoundationStereo(cfg.replace(scan_upsample=True,
                                               scan_upsample_chunk=chunk))
        i1, p1 = scanned.apply(variables, left, right, iters=4, test_mode=False)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
