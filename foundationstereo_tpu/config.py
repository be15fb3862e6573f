"""Model/train configuration.

Mirrors the reference's config keys so its JSON/YAML configs translate 1:1
(reference: configs/train/stereo_v1.json and scripts/train.py:45-64, where the
`model` dict is wrapped in a SimpleNamespace; and scripts/run_demo.py:111-117,
where cfg.yaml from the checkpoint dir is overlaid with CLI args).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyper-parameters of the stereo model.

    Field names match the reference's ``args`` attributes read in
    core/foundation_stereo.py:128-180 so that reference configs load directly.
    """

    max_disp: int = 192
    corr_radius: int = 4
    corr_levels: int = 4
    n_gru_layers: int = 3
    n_downsample: int = 2
    hidden_dims: tuple[int, ...] = (128, 128, 128)
    vit_size: str = "vitl"
    mixed_precision: bool = True
    low_memory: bool = False
    test_mode: bool = False

    # TPU-build extras (not present in the reference).
    cv_group: int = 8             # group-wise correlation groups (hard-coded 8 upstream)
    volume_dim: int = 28          # filtered cost-volume channels (hard-coded upstream)
    train_iters: int = 22         # GRU iterations during training
    valid_iters: int = 32         # GRU iterations during inference
    use_pallas: bool = True       # Pallas kernels on the TPU inference path
    pallas_cost_volume: bool = True  # Pallas for the cost-volume build too
    # One lookup dispatch per GRU iteration (vs 8). Measured slightly SLOWER
    # than per-level kernels on v5e (bench_logs/sol_r2b.json: 7.7 vs
    # 6.2 ms/iter — the all-levels VMEM working set limits row pipelining),
    # so default off; kept for future tuning.
    fused_lookup: bool = False
    # Sublane-gather lookup kernel: one pre-blended row set + dynamic_gather
    # per channel instead of K tent contractions over D (~5x fewer VPU ops).
    gather_lookup: bool = False
    # Route eligible 3x3 convs through the Pallas MXU-dot kernel
    # (ops/conv3x3.py). Measured NO BETTER than XLA's conv lowering on the
    # v5e at refine-loop shapes (gru04 chain 10.3 vs 7.3 ms/iter; per-tap dot
    # variants 47-59 TF/s vs XLA's 60 — docs/NOTES_ROUND4.md), so default
    # off; kept for re-measurement on other chips/toolchains.
    pallas_conv3x3: bool = False
    bf16_pyramids: bool = True    # bf16 geometry/corr pyramids on the Pallas
                                  # path (halves refine-loop HBM traffic;
                                  # fp32 accumulation inside the kernel)
    # Consumer fusion of the cost-volume build into corr_stem's 1x1 proj
    # (single-chip Pallas path): the kernel emits (gwc, rps) parts directly
    # in (B, D, H, C', W) order and CorrStem contracts them against kernel
    # slices — the 32-ch volume, its epilogue transpose, and the D-broadcast
    # left-projection term are never materialized (r3 byte accounting:
    # ~4 ms/pair; re-verified r5).
    fused_cost_proj: bool = True
    # ViT self-attention implementation over the ~5-9k patch tokens (the #1
    # FLOPs consumer; reference uses xformers/flash-attn,
    # dinov2/dinov2/layers/attention.py:82-99). "auto" resolves to the Pallas
    # flash kernel on TPU and the dense einsum elsewhere at trace time.
    vit_attention: str = "auto"   # auto | dense | chunked | flash
    # Training-path rematerialization knobs. Both default ON — the r2
    # batch-size-2 OOM was dominated by the cost-filter stack's backward
    # residuals — but they trade FLOPs for memory, so the train-step
    # utilization work (round 5) measures each half independently:
    #   remat_filter: remat CorrStem/FeatureAtt/Hourglass/Classifier
    #   remat_refine: remat each refine (GRU) scan iteration
    remat_filter: bool = True
    remat_refine: bool = True
    # Train-mode convex-upsample head: scan over the iteration axis (one
    # head application per refine iteration, rematerialized) instead of
    # folding iters into the batch. Numerically identical; bounds the head's
    # live temp set to one iteration — the folded form's backward OOM'd at
    # compile under the round-5 chipless AOT compiler (30.4 GB plan from
    # iters-minormost tile layouts). Off = folded, for measurement.
    scan_upsample: bool = True
    # Iterations folded per scan step of the upsample head (only with
    # scan_upsample). Head temp memory scales with the chunk; scan+remat
    # overhead scales with iters/chunk. Snapped down to a divisor of iters.
    # Measured on-chip (driver16 knockouts, bs1 22 iters): c=1 0.956 s,
    # c=2 0.971 s, c=11 1.007 s — the per-iteration scan wins under the
    # r5 compiler (bigger chunks inflate the padded temps in flight), so 1.
    scan_upsample_chunk: int = 1

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ModelConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if "hidden_dims" in kwargs:
            kwargs["hidden_dims"] = tuple(kwargs["hidden_dims"])
        return cls(**kwargs)

    @classmethod
    def from_json(cls, path: str) -> "ModelConfig":
        with open(path) as f:
            cfg = json.load(f)
        model = cfg.get("model", cfg)
        return cls.from_dict(model)

    def replace(self, **kwargs) -> "ModelConfig":
        return dataclasses.replace(self, **kwargs)

    @property
    def vit_features(self) -> int:
        """DPT decoder channel width per ViT size (core/extractor.py:287-291)."""
        return {"vits": 64, "vitb": 128, "vitl": 256}[self.vit_size]

    @property
    def vit_feat_dim(self) -> int:
        """Channels of the frozen monocular feature injected at 1/4 resolution."""
        return self.vit_features // 2


# The per-size ViT/DPT constants mirrored from core/extractor.py:286-306 and
# dinov2/dinov2/models/vision_transformer.py:341-380.
VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6,
                 intermediate_layers=(2, 5, 8, 11),
                 dpt_features=64, dpt_out_channels=(48, 96, 192, 384)),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12,
                 intermediate_layers=(2, 5, 8, 11),
                 dpt_features=128, dpt_out_channels=(96, 192, 384, 768)),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16,
                 intermediate_layers=(4, 11, 17, 23),
                 dpt_features=256, dpt_out_channels=(256, 512, 1024, 1024)),
}
