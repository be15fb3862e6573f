"""Layer-level golden tests vs torch (conv transpose semantics, norms)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from foundationstereo_tpu.models.layers import (
    BatchNorm,
    ConvTranspose,
    InstanceNorm,
    LayerNorm2d,
    MultiheadAttention,
    TransformerEncoderLayer,
    CostVolumeDisparityAttention,
    sinusoidal_position_embedding,
)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (2, 2, 0), (4, 4, 0), (3, 1, 1)])
def test_conv_transpose2d_matches_torch(rng, k, s, p):
    b, cin, cout, h, w = 2, 5, 7, 9, 11
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(cin, cout, k, stride=s, padding=p, bias=True)
    ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy()

    mod = ConvTranspose(cout, k, s, p, use_bias=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 0, 1)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5)


def test_conv_transpose3d_matches_torch(rng):
    b, cin, cout, d, h, w = 1, 3, 4, 5, 6, 7
    x = rng.standard_normal((b, d, h, w, cin)).astype(np.float32)
    tconv = torch.nn.ConvTranspose3d(cin, cout, 4, stride=2, padding=1, bias=False)
    ref = tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy()

    mod = ConvTranspose(cout, 4, 2, 1, use_bias=False)
    params = {"params": {
        "kernel": jnp.asarray(tconv.weight.detach().numpy().transpose(2, 3, 4, 0, 1)),
    }}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 6)).astype(np.float32)
    ref = torch.nn.InstanceNorm2d(6)(torch.from_numpy(np.moveaxis(x, -1, 1))).numpy()
    got = np.asarray(InstanceNorm().apply({}, jnp.asarray(x)))
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5)


def test_batch_norm_eval_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 6)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(6))
        bn.running_var.copy_(torch.rand(6) + 0.5)
        bn.weight.copy_(torch.randn(6))
        bn.bias.copy_(torch.randn(6))
    ref = bn(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy()

    mod = BatchNorm()
    variables = {
        "params": {"BatchNorm_0": {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        }},
        "batch_stats": {"BatchNorm_0": {
            "mean": jnp.asarray(bn.running_mean.numpy()),
            "var": jnp.asarray(bn.running_var.numpy()),
        }},
    }
    got = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, np.moveaxis(ref, 1, -1), rtol=1e-4, atol=1e-5)


def test_sinusoidal_pe_matches_torch():
    d_model, max_len = 28, 26
    pe = np.zeros((max_len, d_model), np.float32)
    position = torch.arange(0, max_len).float().unsqueeze(1)
    div_term = (torch.arange(0, d_model, 2).float() * -(np.log(10000.0) / d_model)).exp()[None]
    pe[:, 0::2] = torch.sin(position * div_term).numpy()
    pe[:, 1::2] = torch.cos(position * div_term).numpy()
    got = np.asarray(sinusoidal_position_embedding(max_len, d_model))[0]
    np.testing.assert_allclose(got, pe, rtol=1e-5, atol=1e-6)


def test_attention_matches_torch_sdpa(rng):
    b, l, c, heads = 3, 12, 28, 4
    x = rng.standard_normal((b, l, c)).astype(np.float32)
    mod = MultiheadAttention(c, heads)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x))

    p = params["params"]
    def lin(name, t):
        w = np.asarray(p[name]["kernel"])  # (in, out)
        b_ = np.asarray(p[name]["bias"])
        return t @ w + b_
    q = lin("q_proj", x).reshape(b, l, heads, c // heads)
    k = lin("k_proj", x).reshape(b, l, heads, c // heads)
    v = lin("v_proj", x).reshape(b, l, heads, c // heads)
    qt, kt, vt = [torch.from_numpy(t.transpose(0, 2, 1, 3)) for t in (q, k, v)]
    attn = F.scaled_dot_product_attention(qt, kt, vt).numpy().transpose(0, 2, 1, 3).reshape(b, l, c)
    ref = lin("out_proj", attn)

    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_cost_volume_disparity_attention_shape(rng):
    cv = rng.standard_normal((1, 12, 4, 6, 28)).astype(np.float32)
    mod = CostVolumeDisparityAttention(d_model=28, nhead=4, dim_feedforward=28,
                                       num_transformer=2, max_len=12)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(cv))
    out = mod.apply(params, jnp.asarray(cv))
    assert out.shape == cv.shape
    assert np.isfinite(np.asarray(out)).all()
