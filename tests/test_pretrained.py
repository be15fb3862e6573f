"""from_pretrained/save_pretrained — the HF-hub one-call ergonomic.

Reference: FoundationStereo subclasses PyTorchModelHubMixin
(core/foundation_stereo.py:127) so `from_pretrained(dir)` yields a ready
model. Here the analog returns (model, variables, cfg) from either an orbax
checkpoint dir or a reference .pth file (converter path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.pretrained import from_pretrained, save_pretrained


@pytest.fixture(scope="module")
def tiny_saved(tmp_path_factory):
    cfg = ModelConfig(max_disp=32, vit_size="vits", mixed_precision=False)
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    model = FoundationStereo(cfg)
    l = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), l, l, iters=1, test_mode=True)
    out = tmp_path_factory.mktemp("ckpt")
    save_pretrained(out, dict(variables), cfg)
    return out, cfg, variables


def test_roundtrip_dir(tiny_saved):
    path, cfg, variables = tiny_saved
    model, restored, cfg2 = from_pretrained(path)
    assert cfg2.max_disp == cfg.max_disp and cfg2.vit_size == cfg.vit_size
    want = jax.tree.leaves(variables["params"])
    got = jax.tree.leaves(restored["params"])
    assert len(want) == len(got)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # The returned triple must be directly applyable.
    l = jnp.zeros((1, 32, 64, 3))
    disp = jax.jit(lambda v: model.apply(v, l, l, iters=1, test_mode=True))(restored)
    assert disp.shape == (1, 32, 64)


def test_overrides_overlay(tiny_saved):
    path, cfg, _ = tiny_saved
    _, _, cfg2 = from_pretrained(path, valid_iters=5)
    assert cfg2.valid_iters == 5 and cfg2.vit_size == cfg.vit_size


def test_missing_path_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        from_pretrained(tmp_path / "nope")


def test_ema_absent_raises(tiny_saved):
    path, _, _ = tiny_saved
    with pytest.raises(ValueError, match="EMA"):
        from_pretrained(path, ema=True)
