"""FoundationStereo-TPU top-level model.

Channel-last, functional re-design of core/foundation_stereo.py:127-274:

  features -> cost volume (gwc + concat) -> corr_stem/FeatureAtt -> AHCF
  hourglass + disparity transformer -> soft-argmin init -> context net +
  attention gates -> iterative selective-ConvGRU refinement with pyramid
  lookups -> convex upsampling.

Mixed-precision policy mirrors the reference's autocast islands: modules run
in bf16 when cfg.mixed_precision, while correlation normalization/dots, the
soft-argmin, lookup sampling, and the disparity accumulator stay fp32
(core/submodule.py:394, core/geometry.py:74, core/foundation_stereo.py:229-247).

The GRU loop is a statically-unrolled Python loop over `iters` (static under
jit); each iteration is rematerialized during training to bound memory.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from foundationstereo_tpu.config import ModelConfig
from foundationstereo_tpu.models.cost_filter import Classifier, CorrStem, Hourglass
from foundationstereo_tpu.models.extractor import (
    ContextNetDino,
    Feature,
    Stem2,
    feature_dims,
)
from foundationstereo_tpu.models.layers import (
    ChannelAttentionEnhancement,
    Conv,
    Conv2x,
    FeatureAtt,
    SpatialAttentionExtractor,
)
from foundationstereo_tpu.models.update import BasicSelectiveMultiUpdateBlock
from foundationstereo_tpu.ops.cost_volume import (
    all_pairs_correlation,
    build_concat_volume,
    build_gwc_volume,
)
from foundationstereo_tpu.ops.pallas_kernels import (
    build_cost_volume_pallas,
    disparity_lookup_pallas_fused,
    disparity_lookup_pallas_pre,
    disparity_lookup_pallas_sharded,
    to_kernel_layout,
)
from foundationstereo_tpu.ops.sampler import disparity_lookup, pool_last_axis
from foundationstereo_tpu.ops.upsample import (
    context_upsample_phased,
    disparity_regression,
)
from foundationstereo_tpu.parallel.sharding import shard_batch, shard_spatial
from foundationstereo_tpu.utils.misc import IMAGENET_MEAN, IMAGENET_STD

Dtype = Any


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,3) RGB in 0-255 -> ImageNet-normalized float
    (core/foundation_stereo.py:37-42)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


def _pallas_mode(cfg: ModelConfig, train: bool, w4: int) -> tuple[str, str]:
    """Pick kernel implementations for this trace.

    Returns (costvol_mode, lookup_mode), each one of:
      "xla"            — differentiable XLA formulation (training, CPU;
                         GSPMD-partitionable under any mesh);
      "pallas"         — single-chip Pallas kernel;
      "pallas_sharded" — shard_map'd Pallas kernel over the mesh 'spatial'
                         axis (multi-chip inference). The lookup is
                         width-local (no halo); the cost-volume kernel
                         all-gathers the right features and consumes a
                         ``maxdisp``-column left halo per shard
                         (ops/pallas_kernels.py:build_cost_volume_pallas_sharded).
    """
    from foundationstereo_tpu.parallel.mesh import current_mesh

    if not (cfg.use_pallas and not train and jax.default_backend() == "tpu"):
        return "xla", "xla"
    mesh = current_mesh()
    if mesh is None or mesh.devices.size == 1:
        return ("pallas" if cfg.pallas_cost_volume else "xla"), "pallas"
    if ("spatial" in mesh.axis_names and mesh.shape["spatial"] > 1
            and w4 % mesh.shape["spatial"] == 0):
        return ("pallas_sharded" if cfg.pallas_cost_volume else "xla",
                "pallas_sharded")
    return "xla", "xla"


class _SpxGruPhases(nn.Module):
    """The spx convex-upsample deconv (ConvTranspose 9ch/k4/s2/p1,
    core/foundation_stereo.py:160) evaluated WITHOUT interleaving.

    Returns (B, 4, 9, h, w) phase logits for
    :func:`~foundationstereo_tpu.ops.upsample.context_upsample_phased`:
    the interleaved (B, 2h, 2w, 9) tensor's 9-lane minor axis pads ~14x in
    TPU tiled layouts — at (iters*B, H, W, 9) during training this stack was
    the batch-2 OOM driver (docs/NOTES_ROUND2.md). Same parameters and math
    as ConvTranspose (paths spx_gru/{kernel,bias} are preserved for the
    checkpoint converter); only the output layout differs.
    """

    features: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from foundationstereo_tpu.models.layers import deconv_k4s2p1_phases

        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (4, 4, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        b, h, w, _ = x.shape
        f = self.features
        y = deconv_k4s2p1_phases(x, kernel, self.dtype,
                                 out_layout="NCHW")      # (B, 4*9, h+1, w+1)
        parts = [
            y[:, p * f:(p + 1) * f, a:a + h, bb:bb + w]
            for p, (a, bb) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))
        ]
        out = jnp.stack(parts, axis=1)                    # (B, 4, 9, h, w)
        return out + bias.astype(out.dtype)[None, None, :, None, None]


class _RefineStep(nn.Module):
    """One GRU refinement iteration — the body of the scan loop.

    carry: (net_list tuple, disp fp32, mask_feat). `invariants` holds the
    loop-invariant lookup pyramids / context features (passed via
    nn.broadcast so the scan treats them as constants).
    """

    cfg: ModelConfig
    collect: bool
    train: bool
    lookup_mode: str  # "xla" | "pallas" | "pallas_sharded"
    dtype_: Any

    @nn.compact
    def __call__(self, carry, invariants):
        cfg = self.cfg
        dt = self.dtype_
        net_list, disp, _ = carry
        disp = jax.lax.stop_gradient(disp)
        if self.lookup_mode == "pallas_sharded":
            from foundationstereo_tpu.parallel.mesh import current_mesh

            geo_feat = disparity_lookup_pallas_sharded(
                list(invariants["geo_pyramid"]), list(invariants["corr_pyramid"]),
                disp, cfg.corr_radius, mesh=current_mesh(),
                fused=cfg.fused_lookup, out_dtype=dt,
                gather=cfg.gather_lookup)
        elif self.lookup_mode == "pallas":
            lookup = (disparity_lookup_pallas_fused if cfg.fused_lookup
                      else disparity_lookup_pallas_pre)
            # Kernel-layout parts: the motion encoder contracts these against
            # convc1 kernel slices, skipping the concat+transpose epilogue.
            geo_feat = lookup(
                list(invariants["geo_pyramid"]), list(invariants["corr_pyramid"]),
                disp, cfg.corr_radius, out_dtype=dt, return_parts=True,
                gather=cfg.gather_lookup)
        else:
            geo_feat = disparity_lookup(
                list(invariants["geo_pyramid"]), list(invariants["corr_pyramid"]),
                disp, cfg.corr_radius)
        if not isinstance(geo_feat, (list, tuple)):
            geo_feat = geo_feat.astype(dt)
        update = BasicSelectiveMultiUpdateBlock(
            cfg.hidden_dims[0], cfg.n_gru_layers, dtype=dt, name="update_block")
        net_list, mask_feat, delta = update(
            list(net_list), list(invariants["inp"]), geo_feat,
            disp[..., None].astype(dt), list(invariants["att"]))
        disp = disp + delta[..., 0].astype(jnp.float32)
        carry = (tuple(net_list), disp, mask_feat.astype(dt))
        y = (disp, mask_feat) if self.collect else ()
        return carry, y


class FoundationStereo(nn.Module):
    """The full stereo pipeline.

    __call__(left, right, iters, test_mode, init_disp) where left/right are
    (B, H, W, 3) RGB in [0, 255], H and W divisible by 32.

    Returns:
      test_mode=True:  (B, H, W) final disparity.
      test_mode=False: ((B, H/4, W/4) initial disparity,
                        [ (B, H, W) per-iteration upsampled disparities ]).
    """

    cfg: ModelConfig

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.cfg.mixed_precision else jnp.float32

    @nn.compact
    def __call__(self, left, right, iters: int = 12, test_mode: bool = False,
                 low_memory: bool = False,
                 init_disp: Optional[jnp.ndarray] = None, train: bool = False):
        # `low_memory` is part of the reference forward contract
        # (core/foundation_stereo.py:194); upstream it is threaded to
        # bilinear_sampler where it is a no-op (core/utils/utils.py:44-55).
        # Accepted here for API parity; XLA's scan-based refinement loop
        # already bounds lookup memory, so there is nothing to gate.
        del low_memory
        from foundationstereo_tpu.models.layers import pallas_conv3x3_scope

        # Route eligible 3x3 convs through the Pallas MXU-dot kernel on the
        # same traces that use the Pallas lookup (single-chip TPU inference):
        # XLA's conv lowering runs them at 40-60 TF/s vs ~171 TF/s for dots
        # on this chip (scripts/bench_gru_micro.py).
        from foundationstereo_tpu.models.layers import _PALLAS_CONV3X3

        _, lookup_mode = _pallas_mode(self.cfg, train, left.shape[2] // 4)
        # Compose with an externally-forced scope (CPU interpret-mode tests):
        # this wrapper only ever ENABLES the kernel, never disables it.
        # cfg.pallas_conv3x3 defaults OFF: measured no better than XLA's conv
        # lowering on the v5e (config.py note, docs/NOTES_ROUND4.md).
        with pallas_conv3x3_scope(
                (lookup_mode == "pallas" and self.cfg.pallas_conv3x3)
                or _PALLAS_CONV3X3["enabled"],
                _PALLAS_CONV3X3["interpret"]):
            return self._forward(left, right, iters, test_mode, init_disp,
                                 train)

    def _forward(self, left, right, iters, test_mode, init_disp, train):
        cfg = self.cfg
        dt = self.compute_dtype
        B, H, W, _ = left.shape
        D = cfg.max_disp // 4

        img1 = normalize_image(left).astype(dt)
        img2 = normalize_image(right).astype(dt)

        # --- Unary features (both views through one batched trunk) ---------
        feat = Feature(cfg, dtype=dt, name="feature")
        out, vit_feat = feat(jnp.concatenate([img1, img2], axis=0), train)
        vit_feat = vit_feat[:B]
        features_left = [o[:B] for o in out]
        features_right = [o[B:] for o in out]
        stem_2x = Stem2(dtype=dt, name="stem_2")(img1, train)

        # --- Cost volume ----------------------------------------------------
        # Sharding hints: batch over 'data'; the (B, D, H, W, C) volume over
        # image width on 'spatial' — GSPMD spatially partitions the 3D
        # filtering below and inserts halo exchanges over ICI.
        features_left = [shard_batch(f) for f in features_left]
        features_right = [shard_batch(f) for f in features_right]
        costvol_mode, lookup_mode = _pallas_mode(cfg, train, W // 4)
        proj = Conv(12, 1, 1, 0, dtype=dt, name="proj_cmb")
        lproj, rproj = proj(features_left[0]), proj(features_right[0])
        if costvol_mode == "pallas_sharded":
            from foundationstereo_tpu.ops.pallas_kernels import (
                build_cost_volume_pallas_sharded,
            )
            from foundationstereo_tpu.parallel.mesh import current_mesh

            comb = build_cost_volume_pallas_sharded(
                features_left[0], features_right[0], lproj, rproj, D,
                cfg.cv_group, mesh=current_mesh()).astype(dt)
        elif costvol_mode == "pallas":
            if cfg.fused_cost_proj:
                # Parts stay in kernel order; CorrStem's 1x1 proj contracts
                # them directly (consumer fusion — the 32-ch volume is never
                # materialized). bf16 parts match the dense path's rounding
                # (the dense volume is cast to dt before the proj anyway).
                comb = build_cost_volume_pallas(
                    features_left[0], features_right[0], lproj, rproj, D,
                    cfg.cv_group, return_parts=True, out_dtype=dt) + (lproj,)
            else:
                comb = build_cost_volume_pallas(
                    features_left[0], features_right[0], lproj, rproj, D,
                    cfg.cv_group).astype(dt)
        else:
            gwc = build_gwc_volume(features_left[0], features_right[0], D, cfg.cv_group)
            concat_vol = build_concat_volume(lproj, rproj, D)
            comb = jnp.concatenate([gwc.astype(dt), concat_vol.astype(dt)], axis=-1)
        if not isinstance(comb, tuple):  # parts tuple = single-chip fused path
            comb = shard_spatial(comb, w_axis=3)

        # During training the cost-filter stack is rematerialized: its
        # backward residuals (full-volume activations inside the APC/DT
        # blocks) dominated the batch-2 OOM gap (docs/NOTES_ROUND2.md).
        # nn.remat preserves the param paths (checkpoint-converter contract).
        if train and cfg.remat_filter:
            CorrStemM = nn.remat(CorrStem, static_argnums=(2,))
            FeatureAttM = nn.remat(FeatureAtt, static_argnums=(3,))
            HourglassM = nn.remat(Hourglass, static_argnums=(3,))
        else:
            CorrStemM, FeatureAttM, HourglassM = CorrStem, FeatureAtt, Hourglass
        comb = CorrStemM(cfg.volume_dim, dtype=dt, name="corr_stem")(comb, train)
        comb = FeatureAttM(cfg.volume_dim, dtype=dt, name="corr_feature_att")(
            comb, features_left[0], train)
        comb = HourglassM(cfg.volume_dim, cfg.max_disp, dtype=dt,
                          name="cost_agg")(comb, features_left, train)
        comb = shard_spatial(comb, w_axis=3)

        # --- Initial disparity (soft-argmin, fp32) --------------------------
        ClassifierM = (nn.remat(Classifier, static_argnums=(2,))
                       if train and cfg.remat_filter else Classifier)
        logits = ClassifierM(cfg.volume_dim, dtype=dt, name="classifier")(comb, train)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=1)  # (B, D, H/4, W/4)
        if init_disp is None:
            init_disp = disparity_regression(prob, D)  # (B, H/4, W/4)

        # --- Context + attention gates -------------------------------------
        cnet = ContextNetDino(cfg, dtype=dt, name="cnet")
        cnet_list = cnet(img1, vit_feat, train)
        net_list = [jnp.tanh(h) for (h, _c) in cnet_list]
        inp_list = [nn.relu(c) for (_h, c) in cnet_list]
        cam = ChannelAttentionEnhancement(dtype=dt, name="cam")
        inp_list = [cam(x) * x for x in inp_list]
        sam = SpatialAttentionExtractor(dtype=dt, name="sam")
        att = [sam(x) for x in inp_list]

        # --- Geometry encoding pyramids (fp32) ------------------------------
        geo_base = comb.astype(jnp.float32).transpose(0, 2, 3, 4, 1)  # (B,H,W,C,D)
        corr_base = all_pairs_correlation(features_left[0], features_right[0])
        geo_pyramid = pool_last_axis(geo_base, cfg.corr_levels - 1)
        corr_pyramid = pool_last_axis(corr_base, cfg.corr_levels - 1)
        if lookup_mode != "xla":
            # Kernel layout (width on lanes), computed once outside the scan;
            # bf16 halves the dominant per-iteration lookup traffic.
            pyr_dt = jnp.bfloat16 if cfg.bf16_pyramids else jnp.float32
            geo_pyramid, corr_pyramid = to_kernel_layout(
                geo_pyramid, corr_pyramid, dtype=pyr_dt)

        # --- Iterative refinement (single-trace lax.scan over iterations) ----
        # The step is traced/compiled once regardless of `iters` (vs the
        # reference's 32x-unrolled Python loop) and rematerialized per
        # iteration during training to bound backward memory.
        step_cls = _RefineStep
        if train and cfg.remat_refine:
            step_cls = nn.remat(step_cls, static_argnums=())
        loop = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": False},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=iters,
        )(cfg=cfg, collect=not test_mode, train=train,
          lookup_mode=lookup_mode, dtype_=dt, name="refine")

        B4 = init_disp.shape[0]
        h4, w4 = init_disp.shape[1], init_disp.shape[2]
        carry0 = (
            tuple(net_list),
            init_disp.astype(jnp.float32),
            jnp.zeros((B4, h4, w4, 32), dt),  # mask_feat placeholder
        )
        invariants = {
            "geo_pyramid": tuple(geo_pyramid),
            "corr_pyramid": tuple(corr_pyramid),
            "inp": tuple(inp_list),
            "att": tuple(att),
            "stem_2x": stem_2x,
        }
        (net_final, disp, mask_feat), ys = loop(carry0, invariants)

        if test_mode:
            return self._upsample_head(disp, mask_feat, stem_2x, train, dt)
        disp_stack, mask_stack = ys  # (iters, B, h4, w4), (iters, B, h4, w4, 32)
        if cfg.scan_upsample:
            # Train mode, scanned: the spx head applied to CHUNKS of
            # `scan_upsample_chunk` iterations under nn.scan + nn.remat. The
            # fully folded (iters*B) formulation below compiles to a single
            # big program, but under the round-5 chipless AOT compiler its
            # backward materializes the whole (iters*B, 4, 9, H/2, W/2)
            # softmax/deconv temp family with iters-minormost tile layouts
            # (5.8-139x padding -> 30.4 GB plan -> compile OOM). Scanning
            # bounds the live set to one CHUNK's head (memory ~ chunk;
            # scan/remat overhead ~ iters/chunk); remat keeps the backward
            # residuals to the per-step inputs.
            c = max(1, min(cfg.scan_upsample_chunk, iters))
            while iters % c:
                c -= 1
            n_steps = iters // c

            def up_step(mdl, stem_c, x):
                d_i, m_i = x  # (c*B, h4, w4), (c*B, h4, w4, 32)
                return stem_c, mdl._upsample_head(d_i, m_i, stem_c, train, dt)

            up_loop = nn.scan(
                nn.remat(up_step, static_argnums=()),
                variable_broadcast="params",
                split_rngs={"params": False, "dropout": False},
                in_axes=0, out_axes=0)
            stem_c = jnp.tile(stem_2x, (c, 1, 1, 1))
            _, up = up_loop(
                self, stem_c,
                (disp_stack.reshape(n_steps, c * B4, h4, w4),
                 mask_stack.reshape(n_steps, c * B4, h4, w4, 32)))
            up = up.reshape(iters, B4, H, W)
        else:
            # Folded: the iteration axis joins the batch so the upsample
            # heads run once over (iters*B, ...) — kept for measurement
            # (scripts/bench_train_step.py --scan_upsample 0).
            up = self._upsample_head(
                disp_stack.reshape(iters * B4, h4, w4),
                mask_stack.reshape(iters * B4, h4, w4, 32),
                jnp.tile(stem_2x, (iters, 1, 1, 1)), train, dt)
            up = up.reshape(iters, B4, H, W)
        disp_preds = [up[i] for i in range(iters)]
        return init_disp, disp_preds

    def _upsample_head(self, disp_, mask_feat_, stem_, train, dt):
        """spx convex-upsample head (core/foundation_stereo.py:158-160,251):
        shared by test mode, the folded train path, and the scanned train
        path — explicit submodule names keep the parameter paths
        (spx_2_gru/…, spx_gru/…) identical across all three."""
        xspx = Conv2x(32, deconv=True, bn=False, dtype=dt,
                      name="spx_2_gru")(mask_feat_, stem_, train)
        logits = _SpxGruPhases(dtype=dt, name="spx_gru")(xspx)
        spx_pred = jax.nn.softmax(logits.astype(jnp.float32), axis=2)
        return context_upsample_phased(disp_ * 4.0, spx_pred).astype(jnp.float32)
