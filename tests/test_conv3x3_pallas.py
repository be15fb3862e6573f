"""Pallas 3x3 conv kernel (ops/conv3x3.py) — exactness and integration.

The kernel replaces XLA's conv lowering for eligible 3x3/s1/p1 2D convs on
single-chip TPU inference traces (models/layers.py conv2d_op; measured
40-60 TF/s XLA vs ~171 TF/s MXU dots on the v5e). Interpret mode here; the
real-kernel timing lives in scripts/bench_gru_micro.py --parts pallas_conv.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.models.layers import Conv, pallas_conv3x3_scope
from foundationstereo_tpu.ops.conv3x3 import conv3x3_pallas


@pytest.mark.parametrize("shape", [(1, 6, 10, 8, 16), (2, 5, 7, 384, 128),
                                   (1, 4, 9, 128, 64)])
def test_conv3x3_pallas_matches_lax(rng, shape):
    b, h, w, c, f = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)) * 0.05, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv3x3_pallas(x, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv_module_routes_and_matches(rng):
    """The Conv module's pallas branch must produce the same params tree as
    the nn.Conv branch (checkpoint-converter contract) and the same output."""
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 128)), jnp.float32)
    m = Conv(64, 3, 1, 1)
    v = m.init(jax.random.PRNGKey(0), x)
    base = m.apply(v, x)
    with pallas_conv3x3_scope(True, interpret=True):
        v2 = m.init(jax.random.PRNGKey(0), x)
        fast = m.apply(v, x)
    assert jax.tree.structure(v) == jax.tree.structure(v2)
    assert [tuple(a.shape) for a in jax.tree.leaves(v)] \
        == [tuple(a.shape) for a in jax.tree.leaves(v2)]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


def test_update_block_under_scope(rng):
    """Whole selective-GRU update block under the scope: equal to the default
    path up to fp32 accumulation-order noise (both orderings sit ~3e-3 from
    the f64 truth at these magnitudes — measured, docs/NOTES_ROUND4.md)."""
    from foundationstereo_tpu.models.update import BasicSelectiveMultiUpdateBlock

    H4, W4, hd = 16, 24, 128
    net = [jnp.asarray(rng.standard_normal((1, H4 // s, W4 // s, hd)),
                       jnp.float32) for s in (1, 2, 4)]
    inp = [jnp.asarray(rng.standard_normal((1, H4 // s, W4 // s, hd)),
                       jnp.float32) for s in (1, 2, 4)]
    att = [jnp.asarray(rng.uniform(size=(1, H4 // s, W4 // s, 1)),
                       jnp.float32) for s in (1, 2, 4)]
    corr = jnp.asarray(rng.standard_normal((1, H4, W4, 1044)), jnp.float32)
    disp = jnp.asarray(rng.standard_normal((1, H4, W4, 1)), jnp.float32)
    m = BasicSelectiveMultiUpdateBlock(hd, 3, dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), net, inp, corr, disp, att)
    base = m.apply(v, net, inp, corr, disp, att)
    with pallas_conv3x3_scope(True, interpret=True):
        fast = m.apply(v, net, inp, corr, disp, att)
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(fast)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=5e-3)


def test_scope_restores_on_exit():
    from foundationstereo_tpu.models.layers import _PALLAS_CONV3X3

    assert not _PALLAS_CONV3X3["enabled"]
    with pallas_conv3x3_scope(True, interpret=True):
        assert _PALLAS_CONV3X3["enabled"] and _PALLAS_CONV3X3["interpret"]
    assert not _PALLAS_CONV3X3["enabled"]
