"""StableHLO export round-trips (inference/export.py).

The reference exports a fixed-iters ONNX wrapper with a dynamic batch axis
(scripts/make_onnx.py:45-62); our analog is jax.export with an optional
symbolic batch dimension. Slow tier: two full-model exports + three calls
on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.inference.export import export_stablehlo, load_exported
from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

pytestmark = pytest.mark.slow

H, W = 64, 96


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(max_disp=32, vit_size="vits", mixed_precision=False,
                      use_pallas=False)
    model = FoundationStereo(cfg)
    left = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(
        lambda k, l, r: model.init(k, l, r, iters=1, test_mode=True)
    )(jax.random.PRNGKey(0), left, left)
    rng = np.random.default_rng(0)
    l2 = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))
    r2 = jnp.asarray(rng.uniform(0, 255, (2, H, W, 3)).astype(np.float32))
    return model, variables, l2, r2


def test_export_static_roundtrip(tmp_path, tiny):
    model, variables, l2, r2 = tiny
    path = tmp_path / "m.stablehlo"
    manifest = export_stablehlo(model, variables, H, W, iters=1,
                                out_path=path, batch=1)
    assert manifest["format"].startswith("jax.export")
    fn = load_exported(path)
    out = fn(variables, l2[:1], r2[:1])
    ref = model.apply(variables, l2[:1], r2[:1], iters=1, test_mode=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_export_dynamic_batch(tmp_path, tiny):
    """One symbolic-batch artifact serves batch 1 AND batch 2
    (make_onnx.py:60 dynamic_axes analog)."""
    model, variables, l2, r2 = tiny
    path = tmp_path / "mdyn.stablehlo"
    manifest = export_stablehlo(model, variables, H, W, iters=1,
                                out_path=path, dynamic_batch=True)
    assert manifest["input_shapes"]["left"][0] == "b (symbolic)"
    fn = load_exported(path)
    for b in (1, 2):
        out = fn(variables, l2[:b], r2[:b])
        ref = model.apply(variables, l2[:b], r2[:b], iters=1, test_mode=True)
        assert out.shape == (b, H, W)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
