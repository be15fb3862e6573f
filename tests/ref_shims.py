"""Shared import shims for running the reference's torch code offline.

Used by tests/test_parity_torch.py (module-level parity) and
tests/test_parity_full_forward.py (stitched full-forward parity): flash-attn
is replaced with torch SDPA (the reference's own ONNX/TensorRT route,
readme.md:100-107), xformers disabled, ``timm`` provided by the
timm-structured EdgeNeXt stub (tests/timm_edgenext_stub.py), and
``torch.hub.load('facebookresearch/dinov2', ...)`` redirected to the
reference's own vendored DINOv2 tree (the hub repo mirrors it —
depth_anything/dpt.py:159 note).
"""

from __future__ import annotations

import os
import sys
import types

REF = "/root/reference"


class _Stub:
    """Inert attribute sink for stubbed optional modules."""

    def __init__(self, name):
        self._name = name

    def __getattr__(self, attr):
        return _Stub(f"{self._name}.{attr}")

    def __call__(self, *a, **kw):
        raise ModuleNotFoundError(f"{self._name} is stubbed in tests")


def install_reference_shims():
    """Make the reference tree importable on CPU with no network/extra deps."""
    import torch

    os.environ["XFORMERS_DISABLED"] = "1"
    if "flash_attn" not in sys.modules:
        fa = types.ModuleType("flash_attn")

        def flash_attn_func(q, k, v, *a, **kw):
            # flash_attn layout (B, S, H, D) -> SDPA layout (B, H, S, D).
            # Default softmax scale is 1/sqrt(head_dim) in both.
            o = torch.nn.functional.scaled_dot_product_attention(
                q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
            return o.transpose(1, 2)

        fa.flash_attn_func = flash_attn_func
        fa.flash_attn_qkvpacked_func = None
        sys.modules["flash_attn"] = fa

    # timm: the structural EdgeNeXt stub (never pretrained).
    if "timm" not in sys.modules or not hasattr(sys.modules["timm"], "_fstpu_stub"):
        import timm_edgenext_stub

        t = types.ModuleType("timm")
        t.create_model = timm_edgenext_stub.create_model
        t._fstpu_stub = True
        sys.modules["timm"] = t

    # torchvision: only transforms.Normalize participates in the model path
    # (core/foundation_stereo.py:41) — provide a real implementation.
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")

        class _Normalize:
            def __init__(self, mean, std, inplace=False):
                self.mean, self.std = mean, std

            def __call__(self, x):
                mean = torch.tensor(self.mean, dtype=x.dtype,
                                    device=x.device).view(-1, 1, 1)
                std = torch.tensor(self.std, dtype=x.dtype,
                                   device=x.device).view(-1, 1, 1)
                return (x - mean) / std

        tf.Normalize = _Normalize
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf

    # The reference's Utils.py imports a pile of unrelated tooling at module
    # level (trimesh, imageio, joblib, ...). Stub whatever is absent — none
    # of it participates in the modules under test.
    for name in ("trimesh", "imageio", "joblib", "cv2",
                 "open3d", "matplotlib", "mlflow", "transformations",
                 "pandas"):
        try:
            __import__(name)
        except ImportError:
            stub = types.ModuleType(name)
            stub.__all__ = []  # allow `from X import *`
            stub.__getattr__ = lambda attr, _n=name: _Stub(f"{_n}.{attr}")
            sys.modules[name] = stub
    for p in (REF, f"{REF}/dinov2"):
        if p not in sys.path:
            sys.path.append(p)


def patch_torch_hub():
    """Route torch.hub.load('facebookresearch/dinov2', 'dinov2_<s>14') to the
    vendored tree with the hub entrypoint's exact kwargs
    (dinov2/hub/backbones.py semantics: img_size=518, patch 14,
    init_values=1.0, mlp ffn, block_chunks=0, interpolate_offset=0.1)."""
    import torch

    from dinov2.models import vision_transformer as vits

    builders = {"dinov2_vits14": vits.vit_small, "dinov2_vitb14": vits.vit_base,
                "dinov2_vitl14": vits.vit_large}

    def hub_load(repo, model, *a, pretrained=False, **kw):
        assert "dinov2" in repo, repo
        return builders[model](
            img_size=518, patch_size=14, init_values=1.0, ffn_layer="mlp",
            block_chunks=0, num_register_tokens=0,
            interpolate_antialias=False, interpolate_offset=0.1)

    torch.hub.load = hub_load
