"""Converter tests: full name-map coverage + value roundtrip.

No reference checkpoint is available in this environment, so we synthesize a
torch-style state_dict by inverting the converter's own transforms from a
real param tree, then verify import_reference_checkpoint maps every leaf and
reproduces exact values. This validates the machinery and layout transforms;
exact upstream-key fidelity is documented per-rule in torch_import.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.convert.torch_import import (
    _flatten,
    build_name_map,
    canonical_path,
    conv_w,
    deconv_w,
    import_reference_checkpoint,
    linear_w,
)
from foundationstereo_tpu.models.foundation_stereo import FoundationStereo


def _inverse(tf, arr):
    """Invert a flax<-torch transform to synthesize the torch tensor."""
    arr = np.asarray(arr)
    if tf is conv_w:      # (*k, I, O) -> (O, I, *k)
        n = arr.ndim - 2
        return np.transpose(arr, (n + 1, n) + tuple(range(n)))
    if tf is deconv_w:    # (*k, I, O) -> (I, O, *k)
        n = arr.ndim - 2
        return np.transpose(arr, (n, n + 1) + tuple(range(n)))
    if tf is linear_w:
        return arr.T
    # conv1x1_to_dense inverse: (I, O) -> (O, I, 1, 1)
    if tf.__name__ == "<lambda>":
        return arr.T[..., None, None]
    return arr


@pytest.fixture(scope="module")
def model_variables():
    cfg = ModelConfig(max_disp=32, vit_size="vits", mixed_precision=False)
    model = FoundationStereo(cfg)
    l = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), l, l, iters=1, test_mode=True)
    return cfg, variables


def test_full_coverage_and_roundtrip(model_variables):
    cfg, variables = model_variables
    name_map = build_name_map(cfg)

    # Build the synthetic torch state_dict from randomized params.
    rng = np.random.default_rng(0)
    rand_vars = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32)),
        variables)

    flat_p = _flatten(rand_vars["params"])
    flat_s = _flatten(rand_vars.get("batch_stats", {}))
    state_dict = {}
    n_unmapped = 0
    for prefix, flat in (("", flat_p), ("batch_stats::", flat_s)):
        for path, leaf in flat.items():
            rule = next((c for c in (prefix + path, prefix + canonical_path(path))
                         if c in name_map.rules), None)
            if rule is None:
                n_unmapped += 1
                continue
            tk, tf = name_map.rules[rule]
            state_dict[tk] = _inverse(tf, leaf)
    assert n_unmapped == 0, f"{n_unmapped} param leaves have no converter rule"

    new_vars, report = import_reference_checkpoint(state_dict, variables, cfg)
    assert not report["unmapped_flax"], report["unmapped_flax"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["missing_torch"], report["missing_torch"][:5]

    # Values must roundtrip exactly.
    got = _flatten(new_vars["params"])
    want = _flatten(rand_vars["params"])
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), err_msg=k)
    got_s = _flatten(new_vars["batch_stats"])
    want_s = _flatten(rand_vars["batch_stats"])
    for k in want_s:
        np.testing.assert_array_equal(np.asarray(got_s[k]), np.asarray(want_s[k]), err_msg=k)


def test_report_lists_uncertain(model_variables):
    cfg, _ = model_variables
    name_map = build_name_map(cfg)
    # The EdgeNeXt trunk rules must be flagged as unverified-against-timm.
    assert any("edgenext" in u for u in name_map.uncertain)
