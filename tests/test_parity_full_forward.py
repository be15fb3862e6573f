"""Stitched FULL-FORWARD parity: the reference's own FoundationStereo.forward
(core/foundation_stereo.py:194-254, torch CPU, SDPA attention, timm-structured
EdgeNeXt stub, vendored DINOv2) vs our complete flax forward after a
whole-tree converter import.

The module-level tests in test_parity_torch.py prove each block individually;
this test composes them end to end, so a converter name-map bug BETWEEN
modules (e.g. a wrong path prefix that moves weights to the wrong subtree)
cannot pass. It also asserts the converter covers the entire tree: zero
unmapped flax params and no unused torch keys outside the reference's known
vestigial modules (stem_4 / context_zqr_convs — built but never called,
core/foundation_stereo.py:141,151-155).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from foundationstereo_tpu.config import ModelConfig  # noqa: E402
from foundationstereo_tpu.convert.torch_import import (  # noqa: E402
    import_reference_checkpoint,
)
from ref_shims import (  # noqa: E402
    REF,
    install_reference_shims,
    patch_torch_hub,
)

CFG = ModelConfig(max_disp=64, vit_size="vits", mixed_precision=False,
                  use_pallas=False)

# Reference modules that occupy the checkpoint but never run in forward —
# importing them is not required for parity (SURVEY.md C13/C15 notes).
VESTIGIAL = (
    "stem_4.",                     # built :151-155, unused
    "context_zqr_convs.",          # built :141, never called in forward
    "num_batches_tracked",
    "feature.dino.depth_anything.pretrained.mask_token",   # SSL-only
    # torch FeatureFusionBlock always builds resConfUnit1; refinenet4 is
    # called without a skip so it never runs (depth_anything/blocks.py).
    "depth_head.scratch.refinenet4.resConfUnit1",
    # The DPT monocular-disparity output head: the stereo pipeline consumes
    # only the 'out' feature tap (core/extractor.py:355-357), so our tree
    # builds no params for it.
    "depth_head.scratch.output_conv2",
    # cnet vestigial downsample aliases (built, never called — the module
    # parity test documents these: core/extractor.py:229-235).
    "cnet.down", "cnet.norm.", ".norm3.",
)


class _Args(dict):
    """Attribute+dict access with .get — matches how the reference reads its
    OmegaConf/SimpleNamespace args (`args.max_disp` and `args.get(...)`)."""

    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_fs():
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    install_reference_shims()
    patch_torch_hub()
    import core.foundation_stereo as fs

    return fs


def _randomize(module, seed=3):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_parity_torch import randomize_

    return randomize_(module, seed)


@pytest.fixture(scope="module")
def models(ref_fs):
    """Reference model (randomized) + our model with converter-imported
    weights + the converter report, built once for all tests here."""
    from foundationstereo_tpu.models.foundation_stereo import FoundationStereo

    args = _Args(
        max_disp=CFG.max_disp, hidden_dims=[128, 128, 128], n_gru_layers=3,
        corr_radius=4, corr_levels=4, n_downsample=2, vit_size="vits",
        mixed_precision=False, low_memory=False)
    tm = _randomize(ref_fs.FoundationStereo(args))

    fm = FoundationStereo(CFG)
    rng = np.random.default_rng(0)
    l0 = jnp.asarray(rng.uniform(0, 255, (1, 96, 160, 3)).astype(np.float32))
    variables = fm.init(jax.random.PRNGKey(0), l0, l0, iters=1,
                        test_mode=True)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables, report = import_reference_checkpoint(sd, variables, CFG)
    return tm, fm, variables, report


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_full_forward_parity(models, rng):
    tm, fm, variables, report = models

    # Whole-tree converter coverage.
    assert not report["missing_torch"], report["missing_torch"][:10]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    assert not report["unmapped_flax"], report["unmapped_flax"][:10]
    unused = [k for k in report["unused_torch"]
              if not any(v in k for v in VESTIGIAL)]
    assert not unused, unused[:10]

    H, W, iters = 96, 160, 2
    l_t = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    r_t = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    with torch.no_grad():
        disp_t = tm(l_t, r_t, iters=iters, test_mode=True)  # (B, 1, H, W)

    l_j = jnp.asarray(np.moveaxis(l_t.numpy(), 1, -1))
    r_j = jnp.asarray(np.moveaxis(r_t.numpy(), 1, -1))
    disp_j = fm.apply(variables, l_j, r_j, iters=iters, test_mode=True)

    ours = np.asarray(disp_j)[0]                  # (H, W)
    theirs = disp_t.numpy()[0, 0]                 # (H, W)
    diff = np.abs(ours - theirs)
    assert float(diff.max()) < 1e-2, (
        f"max {diff.max():.4g}, mean {diff.mean():.4g}, "
        f"p999 {np.quantile(diff, 0.999):.4g}")


@pytest.mark.slow
@pytest.mark.xdist_group("heavy_subprocess")
def test_hierarchical_parity(models, rng):
    """run_hierachical golden: the reference's two-pass coarse-to-fine glue
    (core/foundation_stereo.py:257-274 — half-res pass, x2 upsample, pad-left
    offset, x0.25 init_disp handoff that skips the soft-argmin) against our
    inference/hierarchical.py with the SAME converted weights. 96x160 halves
    to 48x80, which pads to 64x96 — exercising the pad-offset arithmetic."""
    from foundationstereo_tpu.inference.hierarchical import run_hierarchical

    tm, fm, variables, _ = models

    H, W, iters = 96, 160, 2
    l_t = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    r_t = torch.from_numpy(
        rng.uniform(0, 255, (1, 3, H, W)).astype(np.float32))
    with torch.no_grad():
        disp_t = tm.run_hierachical(l_t, r_t, iters=iters, test_mode=True,
                                    small_ratio=0.5)   # (B, 1, H, W)

    def apply_fn(l, r, it, init_disp=None):
        return fm.apply(variables, l, r, iters=it, test_mode=True,
                        init_disp=init_disp)

    l_j = jnp.asarray(np.moveaxis(l_t.numpy(), 1, -1))
    r_j = jnp.asarray(np.moveaxis(r_t.numpy(), 1, -1))
    disp_j = run_hierarchical(apply_fn, l_j, r_j, iters=iters,
                              small_ratio=0.5)

    ours = np.asarray(disp_j)[0]
    theirs = disp_t.numpy()[0, 0]
    diff = np.abs(ours - theirs)
    assert float(diff.max()) < 2e-2, (
        f"max {diff.max():.4g}, mean {diff.mean():.4g}, "
        f"p999 {np.quantile(diff, 0.999):.4g}")
