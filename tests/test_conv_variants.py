"""The conv fast-path variants must match the default path exactly.

The full-3D-conv decomposition ships two forms (models/layers.py Conv):
per-tap 2D sweeps (default — measured faster on the v5e, stage G A/B in
docs/NOTES_ROUND3.md) and tap_stack=True stacked-tap (opt-in via the
FSTPU_TAP_STACK env default or the explicit Conv attribute, kept for
re-measurement on other chips/toolchains). Both claim exact numerics vs
torch conv3d; pin that so the opt-in path can't rot.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from foundationstereo_tpu.models.layers import Conv


@pytest.mark.parametrize("stride", [1, 2])
def test_tap_stacked_conv3d_matches_torch_and_default(rng, stride):
    B, D, H, W, C, Fo = 1, 6, 8, 10, 5, 7
    x = rng.standard_normal((B, D, H, W, C)).astype(np.float32)

    def run(tap_stack):
        m = Conv(Fo, kernel_size=(3, 3, 3), strides=stride, padding=1,
                 tap_stack=tap_stack)
        v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        return np.asarray(m.apply(v, jnp.asarray(x))), v

    y_default, v = run(False)
    y_stacked, _ = run(True)
    np.testing.assert_allclose(y_stacked, y_default, rtol=0, atol=2e-5)

    # And both against torch conv3d (NCDHW).
    k = np.asarray(v["params"]["Conv_0"]["kernel"])  # (kd,kh,kw,C,F)
    b = np.asarray(v["params"]["Conv_0"]["bias"])
    yt = F.conv3d(torch.from_numpy(x).permute(0, 4, 1, 2, 3),
                  torch.from_numpy(k).permute(4, 3, 0, 1, 2),
                  torch.from_numpy(b), stride=stride, padding=1)
    yt = yt.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(y_default, yt, rtol=0, atol=2e-5)
